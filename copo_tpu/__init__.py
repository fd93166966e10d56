"""copo_tpu — a TPU-native multi-agent driving RL framework.

A from-scratch JAX/XLA re-design of the capabilities of decisionforce/CoPO
(NeurIPS 2021, "Learning to Simulate Self-Driven Particles System with
Coordinated Policy Optimization"): vectorized MetaDrive-style traffic scenes
stepped in lockstep on-device, and IPPO / CCPPO / CoPO trainers whose entire
rollout -> GAE -> SGD -> LCF-meta-update iteration is one jit-compiled program
sharded over a `jax.sharding.Mesh`.

Layer map (mirrors reference layers, SURVEY.md §1, re-designed TPU-first):
  envs/     vectorized scene engine (replaces MetaDrive + env wrappers)
  models/   policy/value networks (replaces TF/torch RLlib models)
  algos/    GAE, PPO, CCPPO fusion, CoPO meta-gradient (replaces algo_*/)
  runtime/  rollout+train loop, metrics, checkpoints, sweeps (replaces Ray/Tune)
  parallel/ mesh + sharding helpers (replaces Ray actor distribution)
  eval/     evaluation + npz policy interchange (replaces copo/eval*)
  viz/      top-down renderer (replaces new_vis.py)
"""

from copo_tpu.version import __version__
from copo_tpu.utils.pretty import pretty_print, SafeFallbackEncoder

__all__ = ["__version__", "pretty_print", "SafeFallbackEncoder"]
