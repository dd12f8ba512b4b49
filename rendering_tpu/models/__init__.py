from rendering_tpu.models.settings import RenderSettings
from rendering_tpu.models.parser import SceneDef, parse_scene
from rendering_tpu.models.scene import SceneData, SceneStatic, build_scene, load_scene

__all__ = [
    "RenderSettings",
    "SceneDef",
    "parse_scene",
    "SceneData",
    "SceneStatic",
    "build_scene",
    "load_scene",
]
