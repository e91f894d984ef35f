"""PENUMBRA visibility gradients (diff/edges.area_shadow_boundary_image_grad)
and the unified joint loss (diff/edges.joint_loss_and_grad).

Scene: a floor in view, a quad occluder OUTSIDE the camera frustum, and a
DISK AREA light (the reference's main emitter geometry,
util/light/cudalight.cpp:26-59) — the shadow is a soft penumbra, and the
image depends on the occluder translation ONLY through that penumbra, so the
full FD gradient is the area-light boundary term."""
import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.core.config import RenderConfig
from raytrace_tpu.diff.edges import (
    area_shadow_boundary_image_grad,
    joint_loss_and_grad,
)
from raytrace_tpu.diff.render import SceneParams
from raytrace_tpu.renderers.simple import render_simple
from raytrace_tpu.scene import transform as tr
from raytrace_tpu.scene.builder import SceneBuilder
from raytrace_tpu.scene.camera import PerspectiveCamera

SIZE = 32
SPP = 16
N_LIGHT = 16
KEY = jax.random.PRNGKey(23)

OCC_Z = 3.0
OCC_HALF = 0.4
LIGHT_POS = (4.0, 0.0, 6.0)
LIGHT_R = 0.4
FACES = np.array([[0, 1, 2], [0, 2, 3]])


def _base_verts():
    cx = 1.6
    return np.array([
        [cx - OCC_HALF, -OCC_HALF, OCC_Z],
        [cx + OCC_HALF, -OCC_HALF, OCC_Z],
        [cx + OCC_HALF, OCC_HALF, OCC_Z],
        [cx - OCC_HALF, OCC_HALF, OCC_Z],
    ])


def _build_scene(verts, kd_floor=(0.7, 0.7, 0.7)):
    b = SceneBuilder()
    floor = b.matte(kd_floor)
    occ = b.matte((0.3, 0.3, 0.3))
    v = np.array([[-8, -8, 0], [8, -8, 0], [8, 8, 0], [-8, 8, 0]],
                 np.float64)
    b.triangle_mesh(v, FACES, material=floor)
    b.triangle_mesh(np.asarray(verts), FACES, material=occ)
    # disk light aimed at the occluder (look_at's +z = view direction =
    # the disk normal after the x/y frame transform)
    o2w = tr.look_at(LIGHT_POS, (1.6, 0.0, 0.0), (0.0, 1.0, 0.0))
    b.area_light_disk((60.0, 60.0, 60.0), radius=LIGHT_R,
                      object_to_world=o2w, n_samples=N_LIGHT)
    return b.build()


def _camera():
    c2w = tr.look_at((0.0, 0.0, 6.0), (0.0, 1e-6, 0.0), (0.0, 1.0, 0.0))
    return PerspectiveCamera.make(c2w, 2 * np.degrees(np.arctan(1.5 / 6.0)),
                                  SIZE, SIZE)


def _config():
    return RenderConfig(width=SIZE, height=SIZE, spp=SPP,
                        scene_epsilon=1e-3, max_light_samples=N_LIGHT)


DIRECTION = jnp.asarray([1.0, 0.0, 0.0])


def test_penumbra_gradient_matches_fd():
    cam = _camera()
    config = _config()
    wmat = jax.random.uniform(jax.random.PRNGKey(5), (SIZE, SIZE, 3))

    def loss_at(theta):
        verts = _base_verts() + theta * np.array([1.0, 0.0, 0.0])
        img = render_simple(_build_scene(verts), cam, config, KEY,
                            jitter=True)
        return float(jnp.mean(img * wmat))

    h = 0.08
    fd = (loss_at(+h) - loss_at(-h)) / (2 * h)

    scene0 = _build_scene(_base_verts())
    dimg = area_shadow_boundary_image_grad(
        scene0, cam, config, jnp.asarray(_base_verts(), jnp.float32),
        FACES, DIRECTION, samples_per_edge=128, n_light_samples=N_LIGHT,
    )
    ad = float(jnp.mean(dimg * wmat))

    assert abs(fd) > 1e-5, "penumbra must actually move the loss"
    assert np.sign(fd) == np.sign(ad), (fd, ad)
    assert abs(fd - ad) <= 0.3 * max(abs(fd), abs(ad)), (fd, ad)


def test_joint_loss_grad_theta_matches_fd():
    """The unified loss's θ-gradient (boundary term under the area light)
    must match FD of the loss itself."""
    cam = _camera()
    config = _config()
    target = render_simple(
        _build_scene(_base_verts() + 0.3 * np.array([1.0, 0, 0])),
        cam, config, KEY, jitter=True)
    params = SceneParams(
        kd=_build_scene(_base_verts()).materials.kd,
        intensity=_build_scene(_base_verts()).lights.intensity)

    def lg(theta):
        return joint_loss_and_grad(
            params, theta, DIRECTION, _base_verts(), FACES,
            _build_scene, cam, config, target, KEY,
            samples_per_edge=128, n_light_samples=N_LIGHT, jitter=True,
        )

    loss0, g_params, g_theta, _ = lg(0.0)
    h = 0.08
    lp, *_ = lg(+h)
    lm, *_ = lg(-h)
    fd = (float(lp) - float(lm)) / (2 * h)
    g = float(g_theta)
    assert abs(fd) > 1e-6
    assert np.sign(fd) == np.sign(g), (fd, g)
    assert abs(fd - g) <= 0.3 * max(abs(fd), abs(g)), (fd, g)
    # pathwise part: floor-albedo gradient must be nonzero and finite
    assert np.isfinite(np.asarray(g_params.kd)).all()
    assert float(jnp.abs(g_params.kd).sum()) > 0.0


def test_joint_recovery_albedo_and_translation():
    """Joint inverse rendering: recover the floor albedo AND the occluder
    translation from a target image with ONE loss (VERDICT r3 #4)."""
    cam = _camera()
    config = _config()
    theta_star = 0.35
    kd_star = np.array([[0.75, 0.55, 0.35], [0.3, 0.3, 0.3]])

    def build(verts):
        return _build_scene(verts)

    target_scene = _build_scene(
        _base_verts() + theta_star * np.array([1.0, 0, 0]),
        kd_floor=tuple(kd_star[0]))
    target = render_simple(target_scene, cam, config, KEY, jitter=True)

    scene0 = _build_scene(_base_verts())
    params = SceneParams(kd=scene0.materials.kd,
                         intensity=scene0.lights.intensity)
    theta = 0.0
    # the boundary gradient is signum-like (~constant magnitude ≈3e-3
    # here), so θ needs a large step; backtracking handles overshoot
    lr_p, lr_t = 10.0, 40.0
    best = (float("inf"), theta, params)
    for i in range(28):
        loss, g_p, g_t, _ = joint_loss_and_grad(
            params, theta, DIRECTION, _base_verts(), FACES, build,
            cam, config, target, KEY,
            samples_per_edge=96, n_light_samples=8, jitter=True,
        )
        if float(loss) < best[0]:
            best = (float(loss), theta, params)
        else:
            lr_t *= 0.5
            lr_p *= 0.85
            _, theta, params = best
            loss, g_p, g_t, _ = joint_loss_and_grad(
                params, theta, DIRECTION, _base_verts(), FACES, build,
                cam, config, target, KEY,
                samples_per_edge=96, n_light_samples=8, jitter=True,
            )
        params = SceneParams(
            kd=jnp.clip(params.kd - lr_p * g_p.kd, 0.02, 0.98),
            intensity=params.intensity)
        theta = float(theta - lr_t * float(g_t))

    loss_end, _, _, _ = joint_loss_and_grad(
        params, theta, DIRECTION, _base_verts(), FACES, build,
        cam, config, target, KEY,
        samples_per_edge=96, n_light_samples=8, jitter=True,
    )
    kd_err = float(jnp.abs(params.kd[0] - jnp.asarray(kd_star[0])).max())
    assert abs(theta - theta_star) < 0.1, (theta, theta_star)
    assert kd_err < 0.08, kd_err
    assert float(loss_end) < 0.25 * best[0] + 1e-9 or float(loss_end) < 1e-5
