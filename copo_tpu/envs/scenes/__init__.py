"""Scene registry: compiled TPU-native equivalents of the six reference scenes.

Reference env classes consumed by the training scripts (SURVEY.md §2.2):
MultiAgent{Intersection,Roundabout,Bottleneck,Tollgate,ParkingLot}Env and the
procedural MultiAgentMetaDrive "PG Map". Each builder returns
(SceneData, EnvConfig) with the scene's canonical agent count and obs dims.
"""

from __future__ import annotations

import functools

from copo_tpu.envs.scenes.intersection import build_intersection
from copo_tpu.envs.scenes.roundabout import build_roundabout
from copo_tpu.envs.scenes.bottleneck import build_bottleneck
from copo_tpu.envs.scenes.tollgate import build_tollgate
from copo_tpu.envs.scenes.parking import build_parking
from copo_tpu.envs.scenes.pg_map import build_pg_map


#: reference env classes -> builders (SURVEY.md §2.2; "pgmap" =
#: MultiAgentMetaDrive with procedural maps)
SCENE_BUILDERS = {
    "intersection": build_intersection,
    "roundabout": build_roundabout,
    "bottleneck": build_bottleneck,
    "tollgate": build_tollgate,
    "parking": build_parking,
    "pgmap": build_pg_map,
}


@functools.lru_cache(maxsize=None)
def _cached(name: str, num_agents, kw_items):
    import dataclasses
    scene, cfg = SCENE_BUILDERS[name](num_agents=num_agents, **dict(kw_items))
    # stamp replay metadata (EnvConfig.scene_name/scene_kwargs): params.json
    # then carries everything needed to rebuild this exact env at eval time
    cfg = dataclasses.replace(cfg, scene_name=name, scene_kwargs=kw_items)
    return scene, cfg


def make_scene(name: str, num_agents: int | None = None, **kwargs):
    """Build (SceneData, EnvConfig) for a named scene (cached per config)."""
    if name not in SCENE_BUILDERS:
        raise KeyError(f"unknown scene {name!r}; have {sorted(SCENE_BUILDERS)}")
    return _cached(name, num_agents, tuple(sorted(kwargs.items())))


def register_scene(name: str, builder):
    SCENE_BUILDERS[name] = builder


def replay_scene(env_dict: dict, **overrides):
    """Rebuild (scene, cfg) from a params.json env dict.

    The harness stores `dataclasses.asdict(EnvConfig)` per trial; the
    scene_name/scene_kwargs stamp lets eval reconstruct the exact trained env
    (incl. non-default lane_num / parking_space_num / comm settings) the way
    the reference's eval replays each trial's params.json (`eval.py:66-139`).
    `overrides` (e.g. crash_done=True) win over the stored kwargs.
    """
    name = env_dict.get("scene_name")
    if not name:
        raise KeyError("env dict has no scene_name (pre-r4 trial?)")
    kw = dict(tuple(item) for item in (env_dict.get("scene_kwargs") or ()))
    kw.update(overrides)
    return make_scene(name, num_agents=env_dict.get("num_agents"), **kw)
