"""Device mesh + sharding helpers: the TPU-native replacement for Ray.

The reference distributes by shipping SampleBatches from Ray rollout workers
to a driver and broadcasting weights back over gRPC (SURVEY.md §2.5, §5
"Distributed communication backend"). Here distribution is a sharding
annotation: env instances are sharded over the mesh's "data" axis, params are
replicated, and XLA inserts the all-gathers/reduce-scatters that replace the
gather-to-driver / broadcast-from-driver pair. Multi-host runs only add
`jax.distributed.initialize` — the program is unchanged.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the data (env-batch) axis."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (env-batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


#: TrainState fields carrying a leading env-batch dim (sharded over "data")
BATCHED_FIELDS = ("env_states", "last_obs")


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState on the mesh: env state/obs sharded over envs,
    everything else (params, opt, LCF, counters) replicated. Works for any
    TrainState subclass (CoPO adds target_params/lcf_opt_state — replicated).
    GSPMD propagates the layout through the jitted train step."""
    import dataclasses

    shard_b = batch_sharding(mesh)
    repl = replicated(mesh)
    updates = {}
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        tgt = shard_b if f.name in BATCHED_FIELDS else repl
        updates[f.name] = jax.tree_util.tree_map(
            lambda x, t=tgt: jax.device_put(x, t), v
        )
    return state.replace(**updates)
