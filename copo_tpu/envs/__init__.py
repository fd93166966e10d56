from copo_tpu.envs.config import EnvConfig
from copo_tpu.envs.engine import DrivingEngine, EnvState
from copo_tpu.envs.scene import SceneData
from copo_tpu.envs.scenes import make_scene, SCENE_BUILDERS

__all__ = [
    "EnvConfig",
    "DrivingEngine",
    "EnvState",
    "SceneData",
    "make_scene",
    "SCENE_BUILDERS",
]
