"""Tests for npz interchange, evaluator, harness, and checkpointing."""

import os

import jax
import numpy as np
import pytest

from copo_tpu.envs import make_scene
from copo_tpu.eval.evaluator import evaluate_policy, summarize
from copo_tpu.eval.npz import export_policy_npz, load_policy_npz
from copo_tpu.models.mlp import init_model
from copo_tpu.runtime.harness import run_trial
from copo_tpu.runtime.trainer import IPPOTrainer, TrainerConfig

REF_NPZ = "/root/reference/copo_code/copo/best_checkpoints"


@pytest.mark.parametrize("layout", ["tf", "torch"])
def test_npz_roundtrip(tmp_path, layout):
    params = init_model(jax.random.PRNGKey(0), 91, 2)
    path = str(tmp_path / f"policy_{layout}.npz")
    export_policy_npz(params, path, layout=layout)
    loaded = load_policy_npz(path)
    for a, b in zip(params["policy"], loaded["policy"]):
        np.testing.assert_allclose(np.asarray(a["w"]), np.asarray(b["w"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a["b"]), np.asarray(b["b"]), rtol=1e-6)


@pytest.mark.skipif(not os.path.isdir(REF_NPZ), reason="reference not mounted")
def test_reference_npz_loads_and_runs():
    # mechanical interchange with the published reference checkpoints:
    # torch-layout (ccppo_*) and TF-layout (ippo_*/cl_*/copo_*) both load,
    # and obs dims line up with our scenes (91 inter / 96 bottleneck).
    p1 = load_policy_npz(os.path.join(REF_NPZ, "ccppo_inter.npz"))
    assert p1["policy"][0]["w"].shape == (91, 256)
    p2 = load_policy_npz(os.path.join(REF_NPZ, "ippo_bottle.npz"))
    assert p2["policy"][0]["w"].shape == (96, 256)
    p3 = load_policy_npz(os.path.join(REF_NPZ, "copo_inter.npz"))
    assert p3["policy"][0]["w"].shape == (92, 256)  # 91 + LCF slot

    # run a reference policy inside our env end-to-end (semantics differ from
    # MetaDrive so no success claim — but the whole pipeline must execute)
    scene, cfg = make_scene("intersection", num_agents=8, horizon=100)
    rows = evaluate_policy(scene, cfg, p1, num_episodes=1)
    assert 0.0 <= rows[0]["success_rate"] <= 1.0

    # LCF-conditioned CoPO npz (92-dim): env rebuilt with the LCF slot and
    # the policy's learned distribution (get_policy_function.py:162-196) —
    # r2 regression: this path crashed on a 91-dim obs (VERDICT weak #6)
    from copo_tpu.envs.config import EnvParams
    scene_l, cfg_l = make_scene("intersection", num_agents=8, horizon=100,
                                lcf_enabled=True, crash_done=True)
    assert cfg_l.obs_dim == 92
    ep = EnvParams.default(cfg_l.num_agents).replace(
        lcf_mean=0.368, lcf_std=0.088)
    rows = evaluate_policy(scene_l, cfg_l, p3, num_episodes=1, env_params=ep)
    assert 0.0 <= rows[0]["success_rate"] <= 1.0


def test_evaluator_columns():
    scene, cfg = make_scene("intersection", num_agents=6, horizon=80)
    params = init_model(jax.random.PRNGKey(1), cfg.obs_dim, cfg.action_dim)
    rows = evaluate_policy(scene, cfg, params, num_episodes=2)
    assert len(rows) == 2
    for col in ("success_rate", "crash_rate", "out_of_road_rate",
                "episode_reward_mean", "estimated_svo_mean_deg",
                "num_agents_total", "route_completion_mean"):
        assert col in rows[0]
    s = summarize(rows)
    assert np.isfinite(s["success_rate"])


def test_run_trial_writes_artifacts(tmp_path):
    scene, env_cfg = make_scene("intersection", num_agents=6, horizon=60)
    trainer = IPPOTrainer(scene, env_cfg, TrainerConfig(
        num_envs=2, rollout_T=10, sgd_minibatch_size=32, num_sgd_iter=1))
    trial_dir = str(tmp_path / "trial0")
    out = run_trial(trainer, 3, trial_dir, checkpoint_freq=2, verbose=False)
    assert os.path.exists(os.path.join(trial_dir, "progress.csv"))
    assert os.path.exists(os.path.join(trial_dir, "result.json"))
    assert os.path.exists(os.path.join(trial_dir, "params.json"))
    ckpts = os.listdir(os.path.join(trial_dir, "checkpoints"))
    assert len(ckpts) >= 1
    assert "metrics" in out

    # curve postprocessing consumes the trial artifacts
    from copo_tpu.utils.curves import parse_trial
    cols = parse_trial(trial_dir)
    assert "success" in cols and len(cols["success"]) == 3


def test_run_trial_kill_and_resume(tmp_path):
    """A trial interrupted after a checkpoint resumes at its true iteration
    with optimizer/env state intact (Tune max_failures=1 semantics,
    reference `train/train.py:104`)."""
    scene, env_cfg = make_scene("intersection", num_agents=6, horizon=60)

    def mk():
        return IPPOTrainer(scene, env_cfg, TrainerConfig(
            num_envs=2, rollout_T=10, sgd_minibatch_size=32, num_sgd_iter=1))

    trial_dir = str(tmp_path / "trial_resume")
    # "crash" after 2 iters (checkpoint at iter 2)
    run_trial(mk(), 2, trial_dir, checkpoint_freq=2, verbose=False)
    full = run_trial(mk(), 4, str(tmp_path / "trial_full"),
                     checkpoint_freq=2, verbose=False)
    # fresh process: new trainer resumes from trial_dir's latest ckpt
    resumed = run_trial(mk(), 4, trial_dir, checkpoint_freq=2, verbose=False)
    a = jax.tree_util.tree_leaves(full["state"].params)
    b = jax.tree_util.tree_leaves(resumed["state"].params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-5, atol=2e-6)
    assert int(resumed["state"].iteration) == 4
    # progress.csv holds all 4 rows (2 pre-crash + 2 appended)
    with open(os.path.join(trial_dir, "progress.csv")) as f:
        assert len(f.readlines()) == 5


def test_checkpoint_restore_resumes(tmp_path):
    from copo_tpu.runtime.checkpoint import (latest_checkpoint,
                                             restore_checkpoint,
                                             save_checkpoint)
    scene, env_cfg = make_scene("intersection", num_agents=6, horizon=60)
    trainer = IPPOTrainer(scene, env_cfg, TrainerConfig(
        num_envs=2, rollout_T=10, sgd_minibatch_size=32, num_sgd_iter=1))
    state = trainer.init_state()
    state, _ = trainer.train_iter(state)
    d = str(tmp_path / "ck")
    save_checkpoint(d, state, 1)
    path = latest_checkpoint(d)
    restored = restore_checkpoint(path, trainer.init_state())
    assert int(restored.iteration) == 1
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)
    # restored state trains further
    restored, metrics = trainer.train_iter(restored)
    assert np.isfinite(float(metrics["total_loss"]))


def test_episode_smoother_excludes_nonfinite():
    # a NaN per-iteration rate must be EXCLUDED from its column's window,
    # not folded in as 0 (which deflated the smoothed value / top-K score)
    from copo_tpu.runtime.harness import EpisodeSmoother
    s = EpisodeSmoother(window=100)
    out = s.update({"episodes_this_iter": 10, "success_rate": 0.8,
                    "episode_cost": float("nan")})
    assert out["success"] == 0.8
    assert np.isnan(out["cost"])
    out = s.update({"episodes_this_iter": 10, "success_rate": 0.6,
                    "episode_cost": 2.0})
    assert abs(out["success"] - 0.7) < 1e-9
    assert out["cost"] == 2.0


def test_scene_replay_metadata_roundtrip():
    # params.json env dict -> replay_scene rebuilds the exact trained env
    import dataclasses
    import json as _json

    from copo_tpu.envs.scenes import replay_scene
    scene, cfg = make_scene("intersection", num_agents=7, lcf_enabled=True,
                            horizon=123)
    env_dict = _json.loads(_json.dumps(dataclasses.asdict(cfg)))
    scene2, cfg2 = replay_scene(env_dict, crash_done=True)
    assert cfg2.num_agents == 7 and cfg2.horizon == 123
    assert cfg2.lcf_enabled and cfg2.crash_done
    assert cfg2.obs_dim == cfg.obs_dim


def test_npz_lcf_dist_roundtrip(tmp_path):
    from copo_tpu.eval.npz import export_policy_npz, load_policy_npz
    from copo_tpu.models.mlp import init_model
    params = init_model(jax.random.PRNGKey(0), 92, 2)
    p = str(tmp_path / "pol.npz")
    export_policy_npz(params, p, lcf_dist=(0.37, 0.09))
    loaded = load_policy_npz(p)
    assert loaded["lcf_dist"] == (np.float32(0.37), np.float32(0.09))


def test_wandb_offline_logger(tmp_path):
    """Offline W&B-compatible run dir (SURVEY item 15 wandb integration):
    config.json + history.jsonl per log() + summary.json on finish."""
    import json
    import os

    from copo_tpu.utils.wandb_log import wandb_init

    run = wandb_init("proj", "trial_x", {"lr": 3e-4}, root=str(tmp_path))
    run.log({"success": 0.5, "iter": 1})
    run.log({"success": 0.7, "iter": 2})
    run.finish()
    assert json.load(open(os.path.join(run.dir, "config.json")))["lr"] == 3e-4
    rows = [json.loads(l) for l in open(os.path.join(run.dir, "history.jsonl"))]
    assert len(rows) == 2 and rows[1]["success"] == 0.7
    assert json.load(open(os.path.join(run.dir, "summary.json")))["success"] == 0.7
