"""Top-down scene renderer (matplotlib; replaces pygame/Panda3D rendering).

Parity role: `new_vis.py` / `vis.py` top-down visualization (SURVEY.md §2.1
item 22, §2.4 renderer row). Host-side only — pulls a device EnvState once
per frame; never part of the training hot path.
"""

from __future__ import annotations

import numpy as np


def _vehicle_patch(x, y, heading, length, width):
    c, s = np.cos(heading), np.sin(heading)
    hx, hy = length / 2, width / 2
    corners = np.array([[-hx, -hy], [hx, -hy], [hx, hy], [-hx, hy]])
    rot = corners @ np.array([[c, s], [-s, c]])
    return rot + np.array([x, y])


def render_frame(scene, cfg, state, ax=None, show_routes: bool = False):
    """Draw walls, routes, and vehicles on a matplotlib axis."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Polygon

    if ax is None:
        _, ax = plt.subplots(figsize=(7, 7))

    walls = np.asarray(scene.walls)
    for x1, y1, x2, y2 in walls:
        ax.plot([x1, x2], [y1, y2], color="0.3", lw=1.2, zorder=1)

    if show_routes:
        xy = np.asarray(scene.route_xy)
        nv = np.asarray(scene.route_n_valid)
        for r in range(xy.shape[0]):
            p = xy[r, : nv[r]]
            ax.plot(p[:, 0], p[:, 1], color="0.85", lw=0.8, zorder=0)

    pos = np.asarray(state.pos)
    heading = np.asarray(state.heading)
    alive = np.asarray(state.alive)
    wreck = np.asarray(state.dead_timer) > 0
    for i in range(pos.shape[0]):
        if not (alive[i] or wreck[i]):
            continue
        color = "#d62728" if wreck[i] else "#1f77b4"
        poly = _vehicle_patch(pos[i, 0], pos[i, 1], heading[i],
                              cfg.vehicle_length, cfg.vehicle_width)
        ax.add_patch(Polygon(poly, closed=True, facecolor=color,
                             edgecolor="k", lw=0.5, zorder=3))

    bbox = np.asarray(scene.bbox)
    ax.set_xlim(bbox[0], bbox[1])
    ax.set_ylim(bbox[2], bbox[3])
    ax.set_aspect("equal")
    ax.set_xticks([])
    ax.set_yticks([])
    return ax


def render_rollout(scene, cfg, policy_fn, params, num_steps: int = 200,
                   out_path: str = "rollout.gif", seed: int = 0,
                   every: int = 2, env_params=None):
    """Roll a policy and save an animated GIF (viz counterpart of new_vis.py)."""
    import io

    import jax
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    from copo_tpu.envs.config import EnvParams
    from copo_tpu.envs.engine import DrivingEngine

    env_params = env_params or EnvParams.default(cfg.num_agents)
    eng = DrivingEngine(scene, cfg)
    key = jax.random.PRNGKey(seed)
    state, obs = eng.reset(key, env_params)

    frames = []
    stats = {"arrive": 0, "crash": 0, "oor": 0}
    for t in range(num_steps):
        key, k = jax.random.split(key)
        act = policy_fn(params, obs, k)
        state, out = eng.step(state, act, env_params)
        obs = out.obs
        stats["arrive"] += int(np.asarray(out.info.arrive_dest).sum())
        stats["crash"] += int(np.asarray(out.info.crash).sum())
        stats["oor"] += int(np.asarray(out.info.out_of_road).sum())
        if t % every == 0:
            fig, ax = plt.subplots(figsize=(6, 6))
            render_frame(scene, cfg, state, ax=ax)
            ax.set_title(
                f"t={t}  arrive={stats['arrive']} crash={stats['crash']} "
                f"out={stats['oor']}", fontsize=9,
            )
            buf = io.BytesIO()
            fig.savefig(buf, format="png", dpi=80, bbox_inches="tight")
            plt.close(fig)
            buf.seek(0)
            frames.append(Image.open(buf).convert("P"))
    if frames:
        frames[0].save(out_path, save_all=True, append_images=frames[1:],
                       duration=80, loop=0)
    return stats
