#!/usr/bin/env python
"""Visualize a trained policy as a top-down GIF (reference new_vis.py)."""

import argparse
import sys

sys.path.insert(0, ".")

import jax

from copo_tpu.envs import make_scene
from copo_tpu.eval.evaluator import make_policy_fn
from copo_tpu.eval.npz import load_policy_npz
from copo_tpu.viz.topdown import render_rollout

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--env", type=str, default="intersection")
    p.add_argument("--npz", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--out", type=str, default="rollout.gif")
    args = p.parse_args()

    scene, cfg = make_scene(args.env)
    if args.npz:
        params = load_policy_npz(args.npz)
    else:
        # random policy
        from copo_tpu.models.mlp import init_model
        params = init_model(jax.random.PRNGKey(0), cfg.obs_dim, cfg.action_dim)

    stats = render_rollout(scene, cfg, make_policy_fn(), params,
                           num_steps=args.steps, out_path=args.out)
    print("saved", args.out, stats)
