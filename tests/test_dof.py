"""Depth-of-field (lens sampling) and ReverseOrientation behavior.

The reference gets DoF for free from pbrt's camera
(util/camera/pbrtcamera.cpp:57-122) and correct normal flipping from pbrt's
shapes; round 5 wires both through the parser/builder (VERDICT r4 missing
#2/#3). The focal-plane test is exact physics: every lens ray through a
pixel re-converges on the focal plane, so geometry ON the plane renders
identically to the pinhole image, while geometry off the plane blurs.
"""
import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.core.config import RenderConfig
from raytrace_tpu.renderers.simple import render_simple
from raytrace_tpu.scene import transform as tr
from raytrace_tpu.scene.builder import SceneBuilder
from raytrace_tpu.scene.camera import PerspectiveCamera

from tests.scenes import quad

SIZE = 48
FOV = 60.0


def _edge_scene(y_quad: float):
    """Half-plane quad (edge at x=0) at distance y_quad from the camera at
    the origin looking down +y; point light in front of it."""
    b = SceneBuilder()
    m = b.matte((0.8, 0.8, 0.8))
    v, i = quad([-8.0, y_quad, -8.0], [0.0, y_quad, -8.0],
                [0.0, y_quad, 8.0], [-8.0, y_quad, 8.0])
    b.triangle_mesh(v, i, material=m)
    b.point_light((1.0, 0.0, 1.0), (40.0, 40.0, 40.0))
    c2w = tr.look_at((0.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
    return b.build(), c2w


def _render(scene, c2w, lens_radius, focal, spp=8):
    cam = PerspectiveCamera.make(
        c2w, FOV, SIZE, SIZE, lens_radius=lens_radius, focal_distance=focal
    )
    config = RenderConfig(width=SIZE, height=SIZE, spp=spp,
                          scene_epsilon=1e-3)
    return np.asarray(
        render_simple(scene, cam, config, jax.random.PRNGKey(3),
                      jitter=True)
    )


def test_dof_focal_plane_is_sharp():
    """Geometry exactly on the focal plane is invariant to the lens radius:
    all lens rays converge to the same surface point."""
    scene, c2w = _edge_scene(3.0)
    pin = _render(scene, c2w, 0.0, 3.0)
    dof = _render(scene, c2w, 0.25, 3.0)
    # same pixel jitter (same key), lens rays re-converge on the plane →
    # identical images up to f32 math
    assert np.abs(pin - dof).max() < 1e-3, np.abs(pin - dof).max()


def test_dof_blurs_out_of_focus_geometry():
    """The same quad at HALF the focal distance must blur: its silhouette
    edge spreads over more pixels than the pinhole edge."""
    scene, c2w = _edge_scene(1.5)  # focal stays at 3.0 → out of focus
    pin = _render(scene, c2w, 0.0, 3.0)
    dof = _render(scene, c2w, 0.25, 3.0)
    assert np.abs(pin - dof).max() > 1e-2  # visibly different
    # edge sharpness: the quad's silhouette is a vertical step; the lens
    # (CoC ≈ 3.5 px here) must spread it, collapsing the max horizontal
    # luminance gradient on the middle rows
    lum_p = pin.sum(-1)[SIZE // 4: 3 * SIZE // 4]
    lum_d = dof.sum(-1)[SIZE // 4: 3 * SIZE // 4]
    g = lambda l: np.abs(np.diff(l, axis=1)).max()
    assert g(lum_p) > 1.8 * g(lum_d), (g(lum_p), g(lum_d))


def test_reverse_orientation_flips_mesh_normal():
    from raytrace_tpu.ops import intersect as isect_ops

    v, i = quad([-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1])

    def build(ro):
        b = SceneBuilder()
        b.triangle_mesh(v, i, material=b.matte(), reverse_orientation=ro)
        return b.build()

    o = jnp.array([[0.0, -2.0, 0.0]])
    d = jnp.array([[0.0, 1.0, 0.0]])
    tmin = jnp.array([1e-3]); tmax = jnp.array([1e30])
    h0 = isect_ops.intersect(build(False), o, d, tmin, tmax)
    h1 = isect_ops.intersect(build(True), o, d, tmin, tmax)
    assert bool(h0.valid[0]) and bool(h1.valid[0])
    np.testing.assert_allclose(np.asarray(h1.ng), -np.asarray(h0.ng),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1.ns), -np.asarray(h0.ns),
                               atol=1e-6)


def test_reverse_orientation_flips_sphere_and_disk_normals():
    from raytrace_tpu.ops import intersect as isect_ops

    def build(ro):
        b = SceneBuilder()
        b.sphere(1.0, material=b.matte(),
                 object_to_world=tr.translate(0, 3, 0),
                 reverse_orientation=ro)
        b.disk(radius=1.0, material=b.matte(),
               object_to_world=tr.translate(3, 3, 0),
               reverse_orientation=ro)
        return b.build()

    o = jnp.array([[0.0, 0.0, 0.0], [3.0, 3.0, 4.0]])
    d = jnp.array([[0.0, 1.0, 0.0], [0.0, 0.0, -1.0]])
    tmin = jnp.full((2,), 1e-3); tmax = jnp.full((2,), 1e30)
    h0 = isect_ops.intersect(build(False), o, d, tmin, tmax)
    h1 = isect_ops.intersect(build(True), o, d, tmin, tmax)
    assert bool(h0.valid.all()) and bool(h1.valid.all())
    np.testing.assert_allclose(np.asarray(h1.ng), -np.asarray(h0.ng),
                               atol=1e-5)


def test_reverse_orientation_area_light_emits_other_side():
    """An area light's ReverseOrientation flips its one-sided emission: the
    floor below a DOWN-facing ceiling light is lit; flipping the light makes
    it emit upward and the floor goes dark (pbrt semantics; emission
    sidedness per cudalight.cu.h:128-138)."""
    def build(ro):
        b = SceneBuilder()
        white = b.matte((0.7, 0.7, 0.7))
        v, i = quad([-2, 0, 0], [2, 0, 0], [2, 4, 0], [-2, 4, 0])
        b.triangle_mesh(v, i, material=white)  # floor z=0
        o2w = tr.translate(0.0, 2.0, 2.0) @ tr.rotate(180.0, (1, 0, 0))
        b.area_light_disk((30.0, 30.0, 30.0), radius=0.5,
                          object_to_world=o2w, material=white,
                          reverse_orientation=ro)
        return b.build()

    c2w = tr.look_at((0.0, -2.0, 1.0), (0.0, 2.0, 0.5), (0.0, 0.0, 1.0))
    cam = PerspectiveCamera.make(c2w, FOV, SIZE, SIZE)
    config = RenderConfig(width=SIZE, height=SIZE, spp=1,
                          scene_epsilon=1e-3)
    img_dn = np.asarray(render_simple(build(False), cam, config,
                                      jax.random.PRNGKey(0), jitter=False))
    img_up = np.asarray(render_simple(build(True), cam, config,
                                      jax.random.PRNGKey(0), jitter=False))
    assert img_dn.mean() > 1e-3
    assert img_up.mean() < 0.02 * img_dn.mean(), (
        img_dn.mean(), img_up.mean())
