"""Visibility-gradient slice (diff/edges.py): the shadow-boundary edge
estimator must match central differences of the full jittered render for an
occluder translation — a gradient pathwise AD cannot see at all (BASELINE
north star; SURVEY.md §7 hard part 3).

Scene: a floor in view, a quad occluder OUTSIDE the camera frustum casting a
shadow into view from a point light — so the image depends on the occluder
position ONLY through the shadow boundary, and the whole FD gradient is the
boundary term."""
import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.core.config import RenderConfig
from raytrace_tpu.diff.edges import (
    project_to_raster,
    quad_boundary_edges,
    shadow_boundary_image_grad,
)
from raytrace_tpu.renderers.simple import render_simple
from raytrace_tpu.scene import transform as tr
from raytrace_tpu.scene.builder import SceneBuilder
from raytrace_tpu.scene.camera import PerspectiveCamera

SIZE = 32
SPP = 64
KEY = jax.random.PRNGKey(17)

OCC_Z = 3.0
OCC_HALF = 0.4
LIGHT = (4.0, 0.0, 6.0)


def _occ_corners(theta: float):
    cx = 1.6 + theta
    return np.array([
        [cx - OCC_HALF, -OCC_HALF, OCC_Z],
        [cx + OCC_HALF, -OCC_HALF, OCC_Z],
        [cx + OCC_HALF, OCC_HALF, OCC_Z],
        [cx - OCC_HALF, OCC_HALF, OCC_Z],
    ])


def _scene(theta: float):
    b = SceneBuilder()
    floor = b.matte((0.7, 0.7, 0.7))
    occ = b.matte((0.3, 0.3, 0.3))
    v, i = np.array([[-8, -8, 0], [8, -8, 0], [8, 8, 0], [-8, 8, 0]],
                    np.float64), np.array([[0, 1, 2], [0, 2, 3]])
    b.triangle_mesh(v, i, material=floor)
    c = _occ_corners(theta)
    b.triangle_mesh(c, np.array([[0, 1, 2], [0, 2, 3]]), material=occ)
    b.point_light(LIGHT, (120.0, 120.0, 120.0))
    return b.build()


def _camera():
    # straight down from z=6, framing ~±1.5 at the floor: the occluder
    # (x ≥ 1.2 at z=3, where the frustum half-width is ~0.75) stays out of
    # view, so only its SHADOW is visible
    c2w = tr.look_at((0.0, 0.0, 6.0), (0.0, 1e-6, 0.0), (0.0, 1.0, 0.0))
    return PerspectiveCamera.make(c2w, 2 * np.degrees(np.arctan(1.5 / 6.0)),
                                  SIZE, SIZE)


def test_projection_roundtrip():
    cam = _camera()
    config = RenderConfig(width=SIZE, height=SIZE)
    # points on the floor at known raster positions: shoot camera rays and
    # re-project their hits
    from raytrace_tpu.scene.camera import generate_rays

    xy = jnp.asarray([[4.5, 7.5], [20.25, 3.75], [31.0, 31.0]], jnp.float32)
    rays = generate_rays(cam, xy, jnp.full((3, 2), 0.5), 1)
    t = -rays.o[:, 2] / rays.d[:, 2]  # intersect z=0 plane
    p = rays.o + rays.d * t[:, None]
    xy_back = project_to_raster(cam, p)
    np.testing.assert_allclose(np.asarray(xy_back), np.asarray(xy),
                               rtol=1e-4, atol=2e-3)


def test_shadow_boundary_gradient_matches_fd():
    cam = _camera()
    config = RenderConfig(width=SIZE, height=SIZE, spp=SPP,
                          scene_epsilon=1e-3)

    # a fixed random pixel weighting makes the scalar loss sensitive to the
    # shadow's SHAPE, not just its area
    wmat = jax.random.uniform(jax.random.PRNGKey(3), (SIZE, SIZE, 3))

    def loss_at(theta):
        img = render_simple(_scene(theta), cam, config, KEY, jitter=True)
        return float(jnp.mean(img * wmat))

    h = 0.06
    fd = (loss_at(+h) - loss_at(-h)) / (2 * h)

    scene0 = _scene(0.0)
    e0, e1 = quad_boundary_edges(_occ_corners(0.0))
    dimg = shadow_boundary_image_grad(
        scene0, cam, config, e0, e1, jnp.asarray([1.0, 0.0, 0.0]),
        samples_per_edge=256,
    )
    ad = float(jnp.mean(dimg * wmat))

    assert abs(fd) > 1e-5, "shadow must actually move the loss"
    assert np.sign(fd) == np.sign(ad), (fd, ad)
    assert abs(fd - ad) <= 0.25 * max(abs(fd), abs(ad)), (fd, ad)


def test_boundary_gradient_zero_when_shadow_out_of_view():
    """Shift the whole configuration so the shadow misses the frustum: the
    estimator must return (near) zero."""
    cam = _camera()
    config = RenderConfig(width=SIZE, height=SIZE, spp=1, scene_epsilon=1e-3)
    # occluder far off: shadow lands outside the framed floor region
    corners = _occ_corners(0.0) + np.array([[-6.0, 0.0, 0.0]])
    b = SceneBuilder()
    b.triangle_mesh(np.array([[-8, -8, 0], [8, -8, 0], [8, 8, 0],
                              [-8, 8, 0]], np.float64),
                    np.array([[0, 1, 2], [0, 2, 3]]),
                    material=b.matte((0.7, 0.7, 0.7)))
    b.triangle_mesh(corners, np.array([[0, 1, 2], [0, 2, 3]]),
                    material=b.matte((0.3, 0.3, 0.3)))
    b.point_light(LIGHT, (120.0, 120.0, 120.0))
    scene = b.build()
    e0, e1 = quad_boundary_edges(corners)
    dimg = shadow_boundary_image_grad(
        scene, cam, config, e0, e1, jnp.asarray([1.0, 0.0, 0.0]),
        samples_per_edge=64,
    )
    assert float(jnp.abs(dimg).sum()) < 1e-4


# ---------------------------------------------------------------------------
# Mesh silhouettes (closed occluder) + optimization recovery
# ---------------------------------------------------------------------------

CUBE_HALF = 0.35


def _cube_mesh(center):
    """Closed axis-aligned cube: 8 verts, 12 consistently-wound tris."""
    cx, cy, cz = center
    s = CUBE_HALF
    v = np.array([
        [cx - s, cy - s, cz - s], [cx + s, cy - s, cz - s],
        [cx + s, cy + s, cz - s], [cx - s, cy + s, cz - s],
        [cx - s, cy - s, cz + s], [cx + s, cy - s, cz + s],
        [cx + s, cy + s, cz + s], [cx - s, cy + s, cz + s],
    ])
    f = np.array([
        [0, 2, 1], [0, 3, 2],      # bottom (z-)
        [4, 5, 6], [4, 6, 7],      # top (z+)
        [0, 1, 5], [0, 5, 4],      # y-
        [2, 3, 7], [2, 7, 6],      # y+
        [1, 2, 6], [1, 6, 5],      # x+
        [3, 0, 4], [3, 4, 7],      # x-
    ])
    return v, f


def test_mesh_silhouette_extraction():
    from raytrace_tpu.diff.edges import mesh_edge_adjacency, silhouette_edges

    v, f = _cube_mesh((0.0, 0.0, 0.0))
    vid, fid = mesh_edge_adjacency(f)
    assert vid.shape == (18, 2)          # cube: 18 unique edges
    assert (fid >= 0).all()              # closed: every edge has 2 faces
    # viewpoint straight above: silhouette = the 4 top-perimeter... no — for
    # a cube seen face-on from far above the silhouette is the 4 vertical
    # side-face boundaries? Facing flips across the 8 edges bounding the
    # top/bottom faces ring depending on position; from (0,0,10) exactly
    # above, the 4 side faces are all back-facing (normals ⟂ view), so the
    # silhouette is the 4 edges of the top face... verify by count & by the
    # invariant below instead of hand geometry:
    _, _, mask = silhouette_edges(v, f, np.array([0.0, 0.0, 10.0]))
    assert int(np.asarray(mask).sum()) in (4, 8)
    # generic viewpoint: silhouette of a convex closed mesh is a single
    # closed loop → every silhouette vertex has exactly 2 silhouette edges
    vp = np.array([3.0, 2.0, 7.0])
    _, _, mask = silhouette_edges(v, f, vp)
    mask = np.asarray(mask)
    assert mask.sum() == 6  # hexagonal outline for a generic cube view
    deg = np.zeros(len(v), int)
    for (a, b), m in zip(vid, mask):
        if m:
            deg[a] += 1
            deg[b] += 1
    assert set(deg[deg > 0]) == {2}


def _cube_scene(theta: float):
    b = SceneBuilder()
    floor = b.matte((0.7, 0.7, 0.7))
    occ = b.matte((0.3, 0.3, 0.3))
    b.triangle_mesh(
        np.array([[-8, -8, 0], [8, -8, 0], [8, 8, 0], [-8, 8, 0]],
                 np.float64),
        np.array([[0, 1, 2], [0, 2, 3]]), material=floor,
    )
    v, f = _cube_mesh((1.7 + theta, 0.0, OCC_Z))
    b.triangle_mesh(v, f, material=occ)
    b.point_light(LIGHT, (120.0, 120.0, 120.0))
    return b.build(), v, f


def test_mesh_silhouette_shadow_gradient_matches_fd():
    """Closed-mesh occluder (cube) out of view: the boundary estimator over
    the EXTRACTED silhouette must match central differences of the full
    render — the mesh generalization of the quad test above."""
    from raytrace_tpu.diff.edges import (
        shadow_boundary_image_grad, silhouette_edges,
    )

    cam = _camera()
    config = RenderConfig(width=SIZE, height=SIZE, spp=SPP,
                          scene_epsilon=1e-3)
    wmat = jax.random.uniform(jax.random.PRNGKey(3), (SIZE, SIZE, 3))

    def loss_at(theta):
        scene, _, _ = _cube_scene(theta)
        img = render_simple(scene, cam, config, KEY, jitter=True)
        return float(jnp.mean(img * wmat))

    h = 0.06
    fd = (loss_at(+h) - loss_at(-h)) / (2 * h)

    scene0, v, f = _cube_scene(0.0)
    lp = jnp.asarray(LIGHT, jnp.float32)
    e0, e1, mask = silhouette_edges(v, f, lp)
    dimg = shadow_boundary_image_grad(
        scene0, cam, config, e0, e1, jnp.asarray([1.0, 0.0, 0.0]),
        samples_per_edge=256, edge_mask=mask,
    )
    ad = float(jnp.mean(dimg * wmat))
    assert abs(fd) > 1e-5, "shadow must actually move the loss"
    assert np.sign(fd) == np.sign(ad), (fd, ad)
    assert abs(fd - ad) <= 0.25 * max(abs(fd), abs(ad)), (fd, ad)


def test_occluder_translation_recovery_by_optimization():
    """Inverse rendering of a GEOMETRY parameter: recover the cube's x-offset
    from a target image by gradient descent on the boundary gradient alone
    (pathwise AD sees zero). BASELINE north star's visibility-gradient
    demonstration."""
    from raytrace_tpu.diff.edges import recover_translation

    cam = _camera()
    config = RenderConfig(width=SIZE, height=SIZE, spp=16,
                          scene_epsilon=1e-3)
    base_scene, base_v, f = _cube_scene(0.0)
    target = render_simple(base_scene, cam, config, KEY, jitter=True)

    def build_scene(verts):
        b = SceneBuilder()
        b.triangle_mesh(
            np.array([[-8, -8, 0], [8, -8, 0], [8, 8, 0], [-8, 8, 0]],
                     np.float64),
            np.array([[0, 1, 2], [0, 2, 3]]), material=b.matte((0.7,) * 3),
        )
        b.triangle_mesh(np.asarray(verts, np.float64), f,
                        material=b.matte((0.3,) * 3))
        b.point_light(LIGHT, (120.0, 120.0, 120.0))
        return b.build()

    theta_hat, losses = recover_translation(
        0.22, jnp.asarray([1.0, 0.0, 0.0]), base_v, f, build_scene, cam,
        config, target, KEY, steps=20, lr=2.0, samples_per_edge=128,
        jitter=True,
    )
    assert losses[-1] < 0.25 * losses[0], losses
    assert abs(theta_hat) < 0.06, (theta_hat, losses)


def test_in_view_occluder_combined_boundary_gradient():
    """Occluder IN VIEW: the image derivative decomposes into the PRIMARY
    boundary term (the cube's own silhouette sweeping pixels) plus the
    SHADOW boundary term — the decomposition real inverse rendering needs
    (round-2 weak #7: the old test only covered the easy all-shadow case).
    Central differences of the full render must match the SUM of the two
    estimators (the interior pathwise term for a slowly-varying matte
    surface is second-order small here)."""
    from raytrace_tpu.diff.edges import (
        primary_boundary_image_grad,
        shadow_boundary_image_grad,
        silhouette_edges,
        silhouette_edges_full,
    )

    cam = _camera()
    config = RenderConfig(width=SIZE, height=SIZE, spp=SPP,
                          scene_epsilon=1e-3)
    wmat = jax.random.uniform(jax.random.PRNGKey(5), (SIZE, SIZE, 3))

    def scene_at(theta):
        b = SceneBuilder()
        b.triangle_mesh(
            np.array([[-8, -8, 0], [8, -8, 0], [8, 8, 0], [-8, 8, 0]],
                     np.float64),
            np.array([[0, 1, 2], [0, 2, 3]]), material=b.matte((0.7,) * 3),
        )
        v, f = _cube_mesh((0.3 + theta, 0.0, 0.8))
        b.triangle_mesh(v, f, material=b.matte((0.25, 0.4, 0.3)))
        b.point_light(LIGHT, (120.0, 120.0, 120.0))
        return b.build(), v, f

    def loss_at(theta):
        scene, _, _ = scene_at(theta)
        img = render_simple(scene, cam, config, KEY, jitter=True)
        return float(jnp.mean(img * wmat))

    h = 0.05
    fd = (loss_at(+h) - loss_at(-h)) / (2 * h)

    scene0, v, f = scene_at(0.0)
    vel = jnp.asarray([1.0, 0.0, 0.0])
    lp = jnp.asarray(LIGHT, jnp.float32)
    cam_o = np.asarray(cam.camera_to_world)[:, 3]

    e0s, e1s, mask_s = silhouette_edges(v, f, lp)
    aabb = (jnp.asarray(v.min(0), jnp.float32),
            jnp.asarray(v.max(0), jnp.float32))
    d_shadow = shadow_boundary_image_grad(
        scene0, cam, config, e0s, e1s, vel, samples_per_edge=256,
        edge_mask=mask_s, occluder_aabb=aabb,
    )
    e0p, e1p, mask_p, fn_p = silhouette_edges_full(v, f, cam_o)
    d_prim = primary_boundary_image_grad(
        scene0, cam, config, e0p, e1p, vel, samples_per_edge=256,
        edge_mask=mask_p, front_normal=fn_p, front_mat=1,
    )
    ad = float(jnp.mean((d_shadow + d_prim) * wmat))
    ad_shadow_only = float(jnp.mean(d_shadow * wmat))

    assert abs(fd) > 1e-5
    assert np.sign(fd) == np.sign(ad), (fd, ad)
    assert abs(fd - ad) <= 0.25 * max(abs(fd), abs(ad)), (
        fd, ad, ad_shadow_only
    )
    # the primary term must be doing real work: shadow-only is NOT enough
    assert abs(fd - ad) < abs(fd - ad_shadow_only), (fd, ad, ad_shadow_only)


# ---------------------------------------------------------------------------
# Multi-DOF Jacobian-product API (VERDICT r4 #5a)
# ---------------------------------------------------------------------------

QUAD_FACES = np.array([[0, 1, 2], [0, 2, 3]])


DOF_LIGHT = (4.0, 1.3, 6.0)  # off the y-axis: both DOFs get a nonzero,
                             # non-degenerate gradient (a y-symmetric setup
                             # makes the true y-derivative ~0 at theta=0)


def _dof_scene_parts():
    base = _occ_corners(0.0)
    # DOF 0: rigid x-translation; DOF 1: rigid y-translation
    vel = np.zeros((2, 4, 3), np.float64)
    vel[0, :, 0] = 1.0
    vel[1, :, 1] = 1.0

    def build_scene(verts):
        b = SceneBuilder()
        floor = b.matte((0.7, 0.7, 0.7))
        occ = b.matte((0.3, 0.3, 0.3))
        v, i = np.array([[-8, -8, 0], [8, -8, 0], [8, 8, 0], [-8, 8, 0]],
                        np.float64), np.array([[0, 1, 2], [0, 2, 3]])
        b.triangle_mesh(v, i, material=floor)
        b.triangle_mesh(np.asarray(verts), QUAD_FACES, material=occ)
        b.point_light(DOF_LIGHT, (120.0, 120.0, 120.0))
        return b.build()

    return base, vel, build_scene


def test_jacobian_gradient_matches_fd_per_dof():
    """Each component of the multi-DOF boundary gradient must match central
    differences of the full jittered render."""
    from raytrace_tpu.diff.edges import jacobian_loss_and_grad

    cam = _camera()
    config = RenderConfig(width=SIZE, height=SIZE, spp=SPP,
                          scene_epsilon=1e-3)
    base, vel, build_scene = _dof_scene_parts()
    target = jnp.zeros((SIZE, SIZE, 3), jnp.float32)

    _, g, _ = jacobian_loss_and_grad(
        np.zeros(2), vel, base, QUAD_FACES, build_scene, cam, config,
        target, KEY, samples_per_edge=256, jitter=True,
    )
    g = np.asarray(g)

    def loss_at(th):
        from raytrace_tpu.renderers.simple import render_simple

        verts = base + th[0] * vel[0] + th[1] * vel[1]
        img = render_simple(build_scene(verts), cam, config, KEY,
                            jitter=True)
        return float(jnp.mean(img ** 2))

    h = 0.06
    for d in range(2):
        e = np.zeros(2)
        e[d] = h
        fd = (loss_at(e) - loss_at(-e)) / (2 * h)
        assert abs(fd) > 1e-6, f"DOF {d}: loss insensitive"
        assert np.sign(fd) == np.sign(g[d]), (d, fd, g[d])
        assert abs(fd - g[d]) <= 0.3 * max(abs(fd), abs(g[d])), (d, fd, g[d])


def test_recover_two_dofs():
    """≥2-DOF recovery: both occluder offsets recovered from the target
    shadow using only boundary gradients."""
    from raytrace_tpu.diff.edges import jacobian_loss_and_grad, recover_dofs

    cam = _camera()
    config = RenderConfig(width=SIZE, height=SIZE, spp=16,
                          scene_epsilon=1e-3)
    base, vel, build_scene = _dof_scene_parts()
    img_target = None
    from raytrace_tpu.renderers.simple import render_simple

    img_target = render_simple(build_scene(base), cam, config, KEY,
                               jitter=True)

    th0 = np.array([0.35, -0.3])
    th_hat, losses = recover_dofs(
        th0, vel, base, QUAD_FACES, build_scene, cam, config, img_target,
        KEY, steps=26, lr=0.4, samples_per_edge=128,
    )
    err0 = np.linalg.norm(th0)
    err1 = np.linalg.norm(th_hat)
    assert err1 < 0.35 * err0, (th0, th_hat, losses)


def test_boundary_gradient_with_photon_gi_matches_fd():
    """VERDICT r4 #5b: the boundary estimator's ΔL is the DIRECT-light jump;
    with the photon (GI) renderer in the loop the finite-difference gradient
    additionally contains (1) the smooth change of indirect flux as the
    occluder moves and (2) any indirect jump across the boundary. For
    diffuse GI both are small — the indirect field is C0-continuous across
    a direct shadow boundary (a hemispherical integral over the photon
    map), and its θ-derivative is volume-distributed rather than
    boundary-concentrated. This test MEASURES that: the direct-only
    boundary gradient must match the full-GI FD within 35%."""
    from raytrace_tpu.renderers.photon import render_photon

    cam = _camera()
    config = RenderConfig(
        width=SIZE, height=SIZE, spp=16, scene_epsilon=1e-3,
        photon_paths=8192, max_photon_depth=4, max_photon_bounces=8,
        initial_radius2=0.25,
    )

    wmat = jax.random.uniform(jax.random.PRNGKey(3), (SIZE, SIZE, 3))

    def loss_at(theta):
        img = render_photon(_scene(theta), cam, config, KEY, jitter=True)
        return float(jnp.mean(img * wmat))

    h = 0.08
    fd = (loss_at(+h) - loss_at(-h)) / (2 * h)

    scene0 = _scene(0.0)
    e0, e1 = quad_boundary_edges(_occ_corners(0.0))
    dimg = shadow_boundary_image_grad(
        scene0, cam, config, e0, e1, jnp.asarray([1.0, 0.0, 0.0]),
        samples_per_edge=256,
    )
    ad = float(jnp.mean(dimg * wmat))

    assert abs(fd) > 1e-5, "shadow must move the loss"
    assert np.sign(fd) == np.sign(ad), (fd, ad)
    # the residual IS the (smooth, uncaptured) indirect θ-dependence —
    # measured ≤ 35% of the boundary term on this BASELINE-style scene
    assert abs(fd - ad) <= 0.35 * max(abs(fd), abs(ad)), (fd, ad)
