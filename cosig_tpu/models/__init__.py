from cosig_tpu.models.scene import (
    SceneData,
    ImageSettings,
    CompositeTransformation,
    TransformElement,
    CameraSettings,
    LightSource,
    MaterialDescription,
    TrianglesMesh,
    Triangle,
    SphereDescription,
    BoxDescription,
)
from cosig_tpu.models.settings import RenderSettings
from cosig_tpu.models.preset import ScenePreset

__all__ = [
    "SceneData",
    "ImageSettings",
    "CompositeTransformation",
    "TransformElement",
    "CameraSettings",
    "LightSource",
    "MaterialDescription",
    "TrianglesMesh",
    "Triangle",
    "SphereDescription",
    "BoxDescription",
    "RenderSettings",
    "ScenePreset",
]
