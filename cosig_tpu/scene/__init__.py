from cosig_tpu.scene.parser import load_scene, parse_scene
from cosig_tpu.scene.transforms import (
    build_composite,
    build_matrix,
    translate,
    scale,
    rotate_x,
    rotate_y,
    rotate_z,
    trs_euler,
)
from cosig_tpu.scene.tessellate import extract_triangles

__all__ = [
    "load_scene",
    "parse_scene",
    "build_composite",
    "build_matrix",
    "translate",
    "scale",
    "rotate_x",
    "rotate_y",
    "rotate_z",
    "trs_euler",
    "extract_triangles",
]
