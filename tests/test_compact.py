"""Survivor-compaction equivalence: the compacted wavefront loops compute
the same per-ray math as the full-batch loops (each lane's outcome is a pure
function of its own state; only the batching changes). Results agree up to
XLA compile-level fusion noise (last-ulp FMA/reassociation differences
between the two program shapes), which can flip a measure-zero set of
Russian-roulette decisions — hence near-total rather than bitwise asserts.

Forced tiny queues exercise the multi-iteration drain (more live rays than
queue slots, so survivors wait across iterations).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytrace_tpu.core.config import RenderConfig
from raytrace_tpu.renderers import common
from raytrace_tpu.renderers.photon import render_photon, trace_photons
from raytrace_tpu.scene import presets
from raytrace_tpu.scene.camera import generate_rays, pixel_samples

SIZE = 64


@pytest.fixture(scope="module")
def scene_cam():
    return presets.cornell_box(size=SIZE, ball="glass")


def _cfg(**kw):
    base = dict(
        width=SIZE, height=SIZE, spp=1, scene_epsilon=1e-3,
        photon_paths=2048, photon_passes=1, max_photon_bounces=6,
    )
    base.update(kw)
    return RenderConfig(**base)


def test_camera_pass_compact_matches_full(scene_cam):
    scene, camera = scene_cam
    cfg_full = _cfg(wavefront_compact=False)
    # queue of 512 on 4096 rays: glass-ball survivors drain over iterations
    cfg_cmp = _cfg(wavefront_compact=True, compact_queue=512)
    assert common.compact_queue_size(cfg_cmp, SIZE * SIZE) == 512

    key = jax.random.PRNGKey(3)
    xy, lens = pixel_samples(key, SIZE, SIZE, 1, jitter=True)
    rays = generate_rays(camera, xy, lens, 1)

    # jit both: outside jit the two paths fuse differently op-by-op and
    # accumulate last-ulp noise; the semantics are identical
    run = jax.jit(
        lambda cfg: common.camera_pass(scene, rays.o, rays.d, cfg, rays=rays),
        static_argnums=0,
    )
    rec_f = run(cfg_full)
    rec_c = run(cfg_cmp)

    for name in ("status", "mat", "light"):
        a = np.asarray(getattr(rec_f, name))
        b = np.asarray(getattr(rec_c, name))
        exact = float(np.mean(a == b))
        assert exact >= 0.999, f"field {name}: {exact:.4f} exact"
    for name in ("p", "ns", "ng", "dpdu", "dpdv", "direction", "atten",
                 "footprint"):
        a = np.asarray(getattr(rec_f, name))
        b = np.asarray(getattr(rec_c, name))
        close = np.isclose(a, b, rtol=1e-4, atol=1e-5)
        assert float(np.mean(close)) >= 0.999, f"field {name}"


def test_photon_walk_compact_matches_full(scene_cam):
    scene, _ = scene_cam
    cfg_full = _cfg(wavefront_compact=False)
    cfg_cmp = _cfg(wavefront_compact=True, compact_queue=256)

    key = jax.random.PRNGKey(7)
    run = jax.jit(
        lambda cfg: trace_photons(scene, cfg, key, pass_idx=0),
        static_argnums=0,
    )
    pm_f = run(cfg_full)
    pm_c = run(cfg_cmp)

    vf, vc = np.asarray(pm_f.valid), np.asarray(pm_c.valid)
    # Russian-roulette survival compares u <= P; last-ulp noise between the
    # two compilations can flip a measure-zero set of decisions, so demand
    # near-total (not bitwise) agreement and exact match where both valid
    assert float(np.mean(vf == vc)) >= 0.995
    both = vf & vc
    for fld in ("p", "alpha", "wi"):
        a = np.asarray(getattr(pm_f, fld))[both]
        b = np.asarray(getattr(pm_c, fld))[both]
        close = np.isclose(a, b, rtol=1e-4, atol=1e-5)
        assert float(np.mean(close)) >= 0.999, fld


def test_full_render_compact_matches_full(scene_cam):
    scene, camera = scene_cam
    img_f = render_photon(
        scene, camera, _cfg(wavefront_compact=False), jax.random.PRNGKey(0)
    )
    img_c = render_photon(
        scene, camera, _cfg(wavefront_compact=True, compact_queue=1024),
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(img_f), np.asarray(img_c), rtol=0, atol=0
    )


def test_footprint_radius_seeding(scene_cam):
    """footprint_radius_scale > 0 seeds per-pixel radii from the camera-ray
    differentials (SPPM-style) — radii must be positive, pixel-scale, and
    the render stays finite and close to the parity render for equal-ish
    radii coverage."""
    scene, camera = scene_cam
    cfg = _cfg(footprint_radius_scale=8.0)
    img, aux = render_photon(
        scene, camera, cfg, jax.random.PRNGKey(0), return_aux=True
    )
    assert np.isfinite(np.asarray(img)).all()
    assert float(jnp.mean(img)) > 0.0
    # the mean gathered radius must be far below the parity constant (4.0)
    assert float(aux["mean_radius2"]) < 0.5


def test_compact_queue_size_gating():
    cfg = RenderConfig(wavefront_compact=True)
    assert common.compact_queue_size(cfg, 4096) == 0  # auto 8192 >= n
    assert common.compact_queue_size(cfg, 1 << 20) == (1 << 20) // 8
    cfg_diff = dataclasses.replace(cfg, differentiable=True)
    assert common.compact_queue_size(cfg_diff, 1 << 20) == 0
    cfg_off = dataclasses.replace(cfg, wavefront_compact=False)
    assert common.compact_queue_size(cfg_off, 1 << 20) == 0
