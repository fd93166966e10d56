"""All-scene validation: dims parity, geometry drivability, basic stepping.

Obs-dim parity targets from the reference npz first-layer shapes
(SURVEY.md §2.2): intersection/roundabout/parking 91, bottleneck 96,
tollgate 156 (+1 with LCF).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from copo_tpu.envs import make_scene
from copo_tpu.envs.config import EnvParams
from copo_tpu.envs.engine import DrivingEngine
from copo_tpu.envs.geometry import WAYPOINT_SPACING

SCENES = ["intersection", "roundabout", "bottleneck", "tollgate", "parking", "pgmap"]
EXPECTED_OBS = {
    "intersection": 91,
    "roundabout": 91,
    "bottleneck": 96,
    "tollgate": 156,
    "parking": 91,
    "pgmap": 91,
}
DEFAULT_AGENTS = {
    "intersection": 30, "roundabout": 40, "bottleneck": 20,
    "tollgate": 40, "parking": 10, "pgmap": 30,
}
MIN_TURN_RADIUS = 3.0  # bicycle model: wheelbase / tan(max_steering) ~ 3.1


@pytest.mark.parametrize("name", SCENES)
def test_obs_dims_and_defaults(name):
    scene, cfg = make_scene(name)
    assert cfg.obs_dim == EXPECTED_OBS[name], name
    assert cfg.num_agents == DEFAULT_AGENTS[name], name


@pytest.mark.parametrize("name", SCENES)
def test_routes_drivable(name):
    scene, cfg = make_scene(name)
    xy = np.asarray(scene.route_xy)
    n_valid = np.asarray(scene.route_n_valid)
    for r in range(xy.shape[0]):
        p = xy[r, : n_valid[r]]
        seg = np.diff(p, axis=0)
        # uniform ARC-length spacing, measured by chords: on a curve of
        # radius R a 2.0 m arc step has chord 2R*sin(1/R) < 2.0 (1.92 at
        # the parking bound R=2.0, 1.95 at the bottleneck funnel R=3.5),
        # so the lower bound must admit chord shortening; the upper bound
        # stays tight (chords can never exceed the arc step)
        d = np.linalg.norm(seg, axis=1)
        assert d.max() <= WAYPOINT_SPACING + 5e-2, (
            f"{name} route {r} spacing: max {d.max():.3f}")
        assert d.min() >= 2.0 * 2.0 * np.sin(WAYPOINT_SPACING / (2 * 2.0)) - 5e-2, (
            f"{name} route {r} spacing: min {d.min():.3f}")
        h = np.arctan2(seg[:, 1], seg[:, 0])
        dh = np.abs(np.arctan2(np.sin(np.diff(h)), np.cos(np.diff(h))))
        curv = dh / WAYPOINT_SPACING
        radius = 1.0 / max(curv.max(), 1e-9)
        # parking's near-perpendicular bay swings are INTENTIONALLY below
        # the single-sweep turning radius: entering a 2.7 m spot from the
        # 3.5 m aisle demands reverse-assisted maneuvering (the published
        # 12-21% difficulty band; the only scene with enable_reverse).
        # Bound 1.95, not 2.0: the bays are built from nominal-2.0 m arcs
        # whose 2-m-chord discretization measures 1.997 by this estimator.
        bound = 1.95 if name == "parking" else MIN_TURN_RADIUS
        assert radius > bound, f"{name} route {r}: min radius {radius:.1f} m"


@pytest.mark.parametrize("name", SCENES)
def test_scene_steps(name):
    scene, cfg = make_scene(name, num_agents=6, horizon=100)
    eng = DrivingEngine(scene, cfg)
    params = EnvParams.default(cfg.num_agents)
    state, obs = eng.reset(jax.random.PRNGKey(0), params)
    assert obs.shape == (6, cfg.obs_dim)
    assert int(jnp.sum(state.alive)) > 0
    for _ in range(10):
        state, out = eng.step(
            state, jnp.tile(jnp.array([0.0, 0.6]), (cfg.num_agents, 1)), params
        )
    assert bool(jnp.all(jnp.isfinite(out.obs)))
    o = np.asarray(out.obs)
    assert o.min() >= -1e-5 and o.max() <= 1.0 + 1e-5


def test_pg_map_seeds_differ():
    s0, _ = make_scene("pgmap", map_seed=0)
    s1, _ = make_scene("pgmap", map_seed=1)
    assert s0.route_xy.shape != s1.route_xy.shape or not np.allclose(
        np.asarray(s0.route_xy)[:, :10], np.asarray(s1.route_xy)[:, :10]
    )


def test_spawn_capacity():
    # every scene must be able to host its default agent count at reset
    for name in SCENES:
        scene, cfg = make_scene(name)
        eng = DrivingEngine(scene, cfg)
        params = EnvParams.default(cfg.num_agents)
        state, _ = eng.reset(jax.random.PRNGKey(1), params)
        spawned = int(jnp.sum(state.alive))
        assert spawned >= min(cfg.num_agents, scene.num_spawns) * 0.5, (
            name, spawned, cfg.num_agents, scene.num_spawns,
        )


def test_pgmap_per_seed_maps_share_one_shape():
    # different map_seed -> different geometry but IDENTICAL SceneData
    # shapes (padded), so the per-seed map rotation in the benchmark grid
    # reuses one compiled program (VERDICT r3 missing #6)
    import numpy as np

    sigs, centers = set(), []
    for seed in (0, 5000, 5100):
        scene, cfg = make_scene("pgmap", map_seed=seed)
        sigs.add(tuple(
            (f, tuple(getattr(scene, f).shape))
            for f in sorted(scene.__dataclass_fields__)
            if hasattr(getattr(scene, f), "shape")
        ))
        centers.append(np.asarray(scene.route_xy[1, :50]))
    assert len(sigs) == 1
    # maps actually differ
    assert not np.allclose(centers[0], centers[1])
    assert cfg.scene_kwargs == (("map_seed", 5100),)
