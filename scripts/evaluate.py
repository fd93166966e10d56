#!/usr/bin/env python
"""Evaluate checkpoints to CSV (reference eval.py / evaluate_population.py).

Walks an experiment dir of trial folders, evaluates the latest/best
checkpoint of each for N episodes, writes evaluate_results/*.csv with the
RecorderEnv columns (SURVEY.md §2.1 item 21).

Also evaluates reference-format npz policy files directly:
  python scripts/evaluate.py --npz path/to/copo_inter.npz --env intersection
"""

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, ".")
from copo_tpu.utils.cache import enable_compile_cache
enable_compile_cache()


from copo_tpu.envs import make_scene
from copo_tpu.envs.scenes import replay_scene
from copo_tpu.eval.evaluator import evaluate_policy, summarize
from copo_tpu.eval.npz import load_policy_npz

#: learned LCF distribution of the reference's shipped best CoPO policies
#: (ported from `eval/get_policy_function.py:11-51` meta_svo_lookup_table,
#: "Best" rows) — an LCF-conditioned npz policy needs the LCF slot appended
#: at eval time with the distribution it was trained under
#: (`get_policy_function.py:162-196`).
REF_LCF_TABLE = {
    "copo_inter": (0.36824979071031544, 0.08807231132921418),
    "copo_round": (0.2914212175433245, 0.09590505765930911),
    "copo_bottle": (0.20677767223433444, 0.09703644548068967),
    "copo_parking": (0.21065708838011088, 0.09828158781716699),
    "copo_tollgate": (0.5575323092877565, 0.07595817525083297),
}


def eval_trial(trial_dir, num_episodes, out_rows, out_dir, export_npz=False):
    """Evaluate EVERY kept checkpoint of one trial (the reference walks all
    checkpoints per trial, `eval.py:66-139`), writing one per-episode row per
    checkpoint to `<out_dir>/<trial>.csv` and a per-trial summary (the best
    checkpoint by success) to `out_rows`."""
    from copo_tpu.runtime.checkpoint import restore_params

    with open(os.path.join(trial_dir, "params.json")) as f:
        params_json = json.load(f)
    env_dict = params_json["env"]
    lcf = env_dict.get("lcf_enabled", False)
    # eval protocol forces crash_done=True (evaluate_population.py:106-132);
    # everything else replays the TRAINED env config from params.json
    # (reference eval.py:66-139 does the same) instead of name-sniffing.
    if env_dict.get("scene_name"):
        scene, cfg = replay_scene(env_dict, crash_done=True)
    else:
        # legacy pre-r4 trial dirs: fall back to inferring from the dir name
        env_name = None
        for cand in ("intersection", "roundabout", "bottleneck", "tollgate",
                     "parking", "pgmap"):
            if cand in trial_dir:
                env_name = cand
        assert env_name, f"cannot infer env from {trial_dir}"
        kw = dict(crash_done=True)
        if lcf:
            kw["lcf_enabled"] = True
        scene, cfg = make_scene(env_name, **kw)

    ckpt_root = os.path.join(trial_dir, "checkpoints")
    ckpts = sorted(
        (os.path.join(ckpt_root, d) for d in os.listdir(ckpt_root)
         if d.startswith("step_")),
        key=lambda p: int(os.path.basename(p).split("_")[1]),
    ) if os.path.isdir(ckpt_root) else []
    if not ckpts:
        print(f"  no checkpoint in {trial_dir}")
        return

    os.makedirs(out_dir, exist_ok=True)
    trial = os.path.basename(trial_dir)
    ep_rows, summaries = [], []
    for ckpt in ckpts:
        params = restore_params(ckpt)
        env_params = None
        if lcf and "lcf" in params:
            # LCF-conditioned policy: evaluate under its LEARNED distribution
            # (the reference recovers it from progress.csv / a lookup table,
            # `get_policy_function_from_checkpoint.py:53-63`; ours lives in
            # the checkpoint itself)
            from copo_tpu.envs.config import EnvParams
            from copo_tpu.models.mlp import lcf_mean, lcf_std
            env_params = EnvParams.default(cfg.num_agents).replace(
                lcf_mean=lcf_mean(params), lcf_std=lcf_std(params))
        rows = evaluate_policy(scene, cfg, params,
                               num_episodes=num_episodes,
                               env_params=env_params)
        for r in rows:
            ep_rows.append({"checkpoint": os.path.basename(ckpt), **r})
        s = summarize(rows)
        s["trial"], s["checkpoint"] = trial, os.path.basename(ckpt)
        summaries.append(s)
        print(f"  {trial} @ {s['checkpoint']}: success={s['success_rate']:.3f}")
    with open(os.path.join(out_dir, f"{trial}.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(ep_rows[0]))
        w.writeheader()
        w.writerows(ep_rows)
    best = max(summaries, key=lambda s: s["success_rate"])
    if export_npz:
        # policy-only npz of the best checkpoint, reference layout (item 28
        # shipped-artifact equivalent; `best_checkpoints/*.npz`). For an
        # LCF-conditioned policy the learned LCF distribution is embedded in
        # the npz so re-evaluating it doesn't fall back to a lookup table.
        from copo_tpu.eval.npz import export_policy_npz
        params = restore_params(os.path.join(ckpt_root, best["checkpoint"]))
        npz_path = os.path.join(out_dir, f"{trial}_best.npz")
        lcf_dist = None
        if lcf and "lcf" in params:
            from copo_tpu.models.mlp import lcf_mean, lcf_std
            lcf_dist = (float(lcf_mean(params)), float(lcf_std(params)))
        export_policy_npz(params, npz_path, lcf_dist=lcf_dist)
        print(f"  exported {npz_path}")
    out_rows.append(best)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, default=None, help="experiment dir")
    p.add_argument("--npz", type=str, default=None, help="reference npz policy")
    p.add_argument("--env", type=str, default="intersection")
    p.add_argument("--num-episodes", type=int, default=20)
    p.add_argument("--out", type=str, default="evaluate_results")
    p.add_argument("--lcf-mean", type=float, default=0.0,
                   help="LCF dist mean for LCF-conditioned npz not in the table")
    p.add_argument("--lcf-std", type=float, default=0.1)
    p.add_argument("--export-npz", action="store_true",
                   help="also export each trial's best policy as npz")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    out_rows = []
    if args.npz:
        from copo_tpu.envs.config import EnvParams

        params = load_policy_npz(args.npz)
        embedded_lcf = params.pop("lcf_dist", None)
        in_dim = params["policy"][0]["w"].shape[0]
        scene, cfg = make_scene(args.env, crash_done=True)
        env_params = None
        if in_dim == cfg.obs_dim + 1:
            # LCF-conditioned policy (e.g. reference CoPO npz, 92-dim on
            # intersection): rebuild the env with the LCF obs slot and sample
            # per-agent LCF from the policy's learned distribution. Priority:
            # distribution embedded in the npz (our exports) > the reference
            # lookup table (`get_policy_function.py:11-51`) > CLI flags.
            stem = os.path.basename(args.npz).rsplit(".", 1)[0]
            mean, std = embedded_lcf or REF_LCF_TABLE.get(
                stem, (args.lcf_mean, args.lcf_std))
            scene, cfg = make_scene(args.env, crash_done=True, lcf_enabled=True)
            env_params = EnvParams.default(cfg.num_agents).replace(
                lcf_mean=mean, lcf_std=std)
            print(f"LCF-conditioned npz ({in_dim}-dim): eval with "
                  f"lcf_mean={mean:.4f} lcf_std={std:.4f}")
        assert in_dim == cfg.obs_dim, (
            f"npz expects {in_dim}-dim obs, env {args.env} provides {cfg.obs_dim}")
        rows = evaluate_policy(scene, cfg, params,
                               num_episodes=args.num_episodes,
                               env_params=env_params)
        s = summarize(rows)
        s["trial"] = os.path.basename(args.npz)
        out_rows.append(s)
        print(json.dumps(s, indent=2))
    elif args.root:
        for trial in sorted(os.listdir(args.root)):
            tdir = os.path.join(args.root, trial)
            if os.path.isdir(tdir) and os.path.exists(
                os.path.join(tdir, "params.json")
            ):
                eval_trial(tdir, args.num_episodes, out_rows, args.out,
                           export_npz=args.export_npz)
    if out_rows:
        path = os.path.join(args.out, "evaluate_results.csv")
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=sorted(out_rows[0]))
            w.writeheader()
            w.writerows(out_rows)
        print("wrote", path)
