"""Scene registry: compiled TPU-native equivalents of the six reference scenes.

Reference env classes consumed by the training scripts (SURVEY.md §2.2):
MultiAgent{Intersection,Roundabout,Bottleneck,Tollgate,ParkingLot}Env and the
procedural MultiAgentMetaDrive "PG Map". Each builder returns
(SceneData, EnvConfig) with the scene's canonical agent count and obs dims.
"""

from __future__ import annotations

import functools

from copo_tpu.envs.scenes.intersection import build_intersection


SCENE_BUILDERS = {
    "intersection": build_intersection,
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
