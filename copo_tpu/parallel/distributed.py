"""Multi-host bring-up: the `redis_password`/`ip_head` replacement.

The reference joins a Ray cluster via env vars (`train/train.py:37-52`,
SURVEY.md §5 "Distributed communication backend"). TPU-native equivalent:
`jax.distributed.initialize` + one global mesh over all chips; the training
program is unchanged (GSPMD inserts ICI/DCN collectives from shardings).

Usage on each host (or rely on TPU auto-detection):
  from copo_tpu.parallel.distributed import initialize, global_mesh
  initialize()                  # no-op single-process; env-driven multi-host
  mesh = global_mesh()          # 1-D "data" mesh over every chip in the job
"""

from __future__ import annotations

import os

import jax

from copo_tpu.parallel.mesh import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-host job. Resolution order mirrors the reference's
    env-var bring-up: explicit args > COPO_COORDINATOR/COPO_NUM_PROCS/
    COPO_PROC_ID env vars > TPU auto-detection > single-process no-op."""
    addr = coordinator_address or os.environ.get("COPO_COORDINATOR")
    nproc = num_processes or _int_env("COPO_NUM_PROCS")
    pid = process_id if process_id is not None else _int_env("COPO_PROC_ID")

    if addr is not None:
        jax.distributed.initialize(
            coordinator_address=addr, num_processes=nproc, process_id=pid
        )
    elif os.environ.get("TPU_WORKER_HOSTNAMES") and _int_env("TPU_WORKER_ID") is not None:
        jax.distributed.initialize()   # TPU metadata auto-detection
    # else: single-process — nothing to do


def _int_env(name):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def global_mesh():
    """1-D data mesh over all devices in the (possibly multi-host) job."""
    return make_mesh(devices=jax.devices())


def is_coordinator() -> bool:
    return jax.process_index() == 0
