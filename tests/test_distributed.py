"""2-process `jax.distributed` bring-up test (SURVEY.md §4 multi-host
implication; reference counterpart: the Ray cluster join in
`train/train.py:37-52`).

Spawns two REAL processes on localhost, each with 4 virtual CPU devices;
`copo_tpu.parallel.distributed.initialize` joins them into one 8-device job,
`global_mesh` spans both processes, and one data-parallel sharded train step
produces identical (replicated) params on both ranks. This is the only
distribution layer the single-process 8-device tests cannot cover.
"""

import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import os, sys
import numpy as np

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.environ["COPO_REPO"])
from copo_tpu.parallel.distributed import initialize, global_mesh, is_coordinator

initialize()   # env-driven: COPO_COORDINATOR / COPO_NUM_PROCS / COPO_PROC_ID
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from copo_tpu.envs import make_scene
from copo_tpu.models.mlp import init_model, policy_logits

mesh = global_mesh()
assert mesh.devices.size == 8

# one data-parallel step: global batch sharded over the mesh, params
# replicated; psum-of-gradients == single-host result by construction
scene, cfg = make_scene("intersection", num_agents=4)
params = init_model(jax.random.PRNGKey(0), cfg.obs_dim, cfg.action_dim)

B = 64
obs = jax.random.uniform(jax.random.PRNGKey(1), (B, cfg.obs_dim))
target = jax.random.uniform(jax.random.PRNGKey(2), (B, cfg.action_dim))

obs_sh = jax.device_put(obs, NamedSharding(mesh, P("data", None)))
tgt_sh = jax.device_put(target, NamedSharding(mesh, P("data", None)))
params_sh = jax.device_put(params, NamedSharding(mesh, P()))

def loss_fn(p, o, t):
    mean, _ = policy_logits(p, o)
    return jnp.mean((mean - t) ** 2)

@jax.jit
def step(p, o, t):
    g = jax.grad(loss_fn)(p, o, t)
    return jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, p, g)

new_params = step(params_sh, obs_sh, tgt_sh)
# replicated leaves: read each rank's local shard 0
flat = np.concatenate([
    np.asarray(x.addressable_data(0)).ravel()
    for x in jax.tree_util.tree_leaves(new_params)
])
print(f"RANK{jax.process_index()} CHECKSUM {float(np.sum(flat)):.8f} "
      f"N {flat.size}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.update(
            COPO_COORDINATOR=f"127.0.0.1:{port}",
            COPO_NUM_PROCS="2",
            COPO_PROC_ID=str(rank),
            COPO_REPO=repo,
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"rank failed:\nSTDOUT:{out}\nSTDERR:{err[-3000:]}"
        outs.append(out)
    sums = []
    for out in outs:
        line = [l for l in out.splitlines() if "CHECKSUM" in l][0]
        sums.append(float(line.split("CHECKSUM")[1].split()[0]))
    # replicated params: both ranks hold identical values after the step
    np.testing.assert_allclose(sums[0], sums[1], rtol=1e-6)
