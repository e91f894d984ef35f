from raytrace_tpu.scene.scene import (
    Scene,
    Triangles,
    Spheres,
    Disks,
    Materials,
    Lights,
    MATTE,
    MIRROR,
    GLASS,
    LIGHT_POINT,
    LIGHT_AREA_DISK,
)
from raytrace_tpu.scene.builder import SceneBuilder
from raytrace_tpu.scene.camera import PerspectiveCamera
