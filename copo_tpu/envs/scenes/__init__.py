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
    return SCENE_BUILDERS[name](num_agents=num_agents, **dict(kw_items))


def make_scene(name: str, num_agents: int | None = None, **kwargs):
    """Build (SceneData, EnvConfig) for a named scene (cached per config)."""
    if name not in SCENE_BUILDERS:
        raise KeyError(f"unknown scene {name!r}; have {sorted(SCENE_BUILDERS)}")
    return _cached(name, num_agents, tuple(sorted(kwargs.items())))


def register_scene(name: str, builder):
    SCENE_BUILDERS[name] = builder
