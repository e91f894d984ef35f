"""Shared test scenes, built twice: once through the framework's SceneBuilder
(JAX SoA pytree) and once as the numpy oracle's OScene — keeping the two
descriptions in lockstep so image comparisons are apples-to-apples."""
import math

import numpy as np

from raytrace_tpu.oracle import cpu_reference as orc
from raytrace_tpu.scene import transform as tr
from raytrace_tpu.scene.builder import SceneBuilder


def quad(p0, p1, p2, p3):
    """Two triangles for the quad p0-p1-p2-p3 (ccw)."""
    verts = np.array([p0, p1, p2, p3], dtype=np.float64)
    idx = np.array([[0, 1, 2], [0, 2, 3]])
    return verts, idx


def sphere_plane_scene():
    """BASELINE config[0]: single sphere + ground plane, one point light,
    matte everywhere."""
    b = SceneBuilder()
    m_floor = b.matte((0.7, 0.7, 0.7))
    m_ball = b.matte((0.6, 0.3, 0.2))
    verts, idx = quad(
        [-10, -10, 0], [10, -10, 0], [10, 10, 0], [-10, 10, 0]
    )
    b.triangle_mesh(verts, idx, material=m_floor)
    b.sphere(radius=1.0, material=m_ball, object_to_world=tr.translate(0, 0, 1))
    b.point_light((3.0, -2.0, 5.0), (60.0, 60.0, 60.0))
    scene = b.build()

    mats = [orc.OMaterial(0, np.array([0.7, 0.7, 0.7])),
            orc.OMaterial(0, np.array([0.6, 0.3, 0.2]))]
    tris = [
        orc.OTriangle(verts[i0], verts[i1], verts[i2], mat=0)
        for i0, i1, i2 in idx
    ]
    spheres = [orc.OSphere(np.array([0.0, 0.0, 1.0]), 1.0, mat=1)]
    lights = [orc.OLight(0, np.array([3.0, -2.0, 5.0]),
                         np.array([60.0, 60.0, 60.0]))]
    oracle = orc.OScene(tris, spheres, [], mats, lights)

    cam_to_world = tr.look_at((4.0, -4.0, 2.5), (0.0, 0.0, 1.0), (0.0, 0.0, 1.0))
    return scene, oracle, cam_to_world


def cornell_box_scene(light_radius=0.5, light_height=1.99, emit=30.0,
                      ball=None, n_light_samples=1):
    """Cornell-ish box (BASELINE config[1]): 2×2×2 box, disk area light in the
    ceiling, optional specular ball ('mirror'|'glass')."""
    b = SceneBuilder()
    white = b.matte((0.73, 0.73, 0.73))
    red = b.matte((0.65, 0.05, 0.05))
    green = b.matte((0.12, 0.45, 0.15))

    def add_quad(pts, mat):
        v, i = quad(*pts)
        b.triangle_mesh(v, i, material=mat)
        return [orc.OTriangle(v[a], v[b_], v[c], mat_map[mat])
                for a, b_, c in i]

    mat_map = {white: 0, red: 1, green: 2}
    o_mats = [orc.OMaterial(0, np.array([0.73, 0.73, 0.73])),
              orc.OMaterial(0, np.array([0.65, 0.05, 0.05])),
              orc.OMaterial(0, np.array([0.12, 0.45, 0.15]))]
    o_tris = []
    # floor z=0, ceiling z=2, back wall y=2, left x=-1 red, right x=1 green
    o_tris += add_quad(([-1, 0, 0], [1, 0, 0], [1, 2, 0], [-1, 2, 0]), white)
    o_tris += add_quad(([-1, 0, 2], [-1, 2, 2], [1, 2, 2], [1, 0, 2]), white)
    o_tris += add_quad(([-1, 2, 0], [1, 2, 0], [1, 2, 2], [-1, 2, 2]), white)
    o_tris += add_quad(([-1, 0, 0], [-1, 2, 0], [-1, 2, 2], [-1, 0, 2]), red)
    o_tris += add_quad(([1, 0, 0], [1, 0, 2], [1, 2, 2], [1, 2, 0]), green)

    o_spheres = []
    if ball == "mirror":
        mb = b.mirror((0.95, 0.95, 0.95))
        b.sphere(0.45, material=mb, object_to_world=tr.translate(-0.35, 1.2, 0.45))
        o_mats.append(orc.OMaterial(1, np.array([0.95, 0.95, 0.95])))
        o_spheres.append(orc.OSphere(np.array([-0.35, 1.2, 0.45]), 0.45,
                                     mat=len(o_mats) - 1))
    elif ball == "glass":
        gb = b.glass(1.5)
        b.sphere(0.45, material=gb, object_to_world=tr.translate(-0.35, 1.2, 0.45))
        o_mats.append(orc.OMaterial(2, np.ones(3), eta=1.5))
        o_spheres.append(orc.OSphere(np.array([-0.35, 1.2, 0.45]), 0.45,
                                     mat=len(o_mats) - 1))

    # ceiling disk light, facing down (o2w flips z)
    o2w = tr.translate(0.0, 1.0, light_height) @ tr.rotate(180.0, (1, 0, 0))
    b.area_light_disk(
        (emit, emit, emit), radius=light_radius, object_to_world=o2w,
        n_samples=n_light_samples, material=white,
    )
    worldo = tr.apply_point(o2w, np.zeros(3))
    worldx = tr.apply_vector(o2w, np.array([light_radius, 0, 0]))
    worldy = tr.apply_vector(o2w, np.array([0, light_radius, 0]))
    normal = np.cross(worldx, worldy)
    normal /= np.linalg.norm(normal)
    o_lights = [orc.OLight(
        1, worldo, np.array([emit, emit, emit], np.float64),
        p1=worldx, p2=worldy, normal=normal,
        area=math.pi * light_radius**2,
    )]
    o_disks = [orc.ODisk(worldo, worldx, worldy, normal, 0.0, 2 * math.pi,
                         mat=0, light=0)]

    oracle = orc.OScene(o_tris, o_spheres, o_disks, o_mats, o_lights)
    scene = b.build()
    cam_to_world = tr.look_at((0.0, -2.4, 1.0), (0.0, 1.0, 1.0), (0.0, 0.0, 1.0))
    return scene, oracle, cam_to_world
