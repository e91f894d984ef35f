"""End-to-end simple renderer vs the CPU oracle (BASELINE config[0]:
sphere + plane, direct lighting, allclose vs the pbrt-v2-style reference)."""
import jax
import numpy as np

from raytrace_tpu.core.config import RenderConfig
from raytrace_tpu.oracle import cpu_reference as orc
from raytrace_tpu.renderers.simple import render_simple
from raytrace_tpu.scene.camera import PerspectiveCamera
from raytrace_tpu.utils import image as img_util

from tests.scenes import sphere_plane_scene

SIZE = 64
FOV = 50.0


def test_simple_render_matches_oracle():
    scene, oracle, c2w = sphere_plane_scene()
    cam = PerspectiveCamera.make(c2w, FOV, SIZE, SIZE)
    config = RenderConfig(width=SIZE, height=SIZE, spp=1, scene_epsilon=1e-3)
    img = np.asarray(
        render_simple(scene, cam, config, jax.random.PRNGKey(0), jitter=False)
    )
    ref = orc.render_direct(
        oracle, c2w, FOV, SIZE, SIZE, scene_eps=1e-3, include_emitted=False
    )
    assert img.shape == (SIZE, SIZE, 3)
    # point light + deterministic pixel centers → tight tolerance except at
    # silhouette/shadow-edge pixels where f32 vs f64 rounding flips a hit
    err = np.abs(img - ref)
    bad = np.mean(np.any(err > 5e-3 * np.maximum(1.0, np.abs(ref)), axis=-1))
    assert bad < 0.01, f"{bad:.3%} of pixels disagree with the oracle"
    assert img_util.rmse(img, ref) < 2e-2


def test_simple_render_nonblack_and_shadowed():
    scene, _, c2w = sphere_plane_scene()
    cam = PerspectiveCamera.make(c2w, FOV, SIZE, SIZE)
    config = RenderConfig(width=SIZE, height=SIZE, spp=1, scene_epsilon=1e-3)
    img = np.asarray(
        render_simple(scene, cam, config, jax.random.PRNGKey(0), jitter=False)
    )
    assert np.all(np.isfinite(img))
    assert img.max() > 0.05  # lit floor/sphere
    # some pixels are pure shadow or background
    assert (img.sum(-1) == 0).any()


def test_simple_render_spp_antialiases():
    scene, _, c2w = sphere_plane_scene()
    cam = PerspectiveCamera.make(c2w, FOV, SIZE, SIZE)
    c1 = RenderConfig(width=SIZE, height=SIZE, spp=1, scene_epsilon=1e-3)
    c4 = RenderConfig(width=SIZE, height=SIZE, spp=4, scene_epsilon=1e-3)
    img1 = np.asarray(render_simple(scene, cam, c1, jax.random.PRNGKey(1)))
    img4 = np.asarray(render_simple(scene, cam, c4, jax.random.PRNGKey(1)))
    assert img_util.rmse(img1, img4) < 0.1  # same scene, similar content
    assert not np.allclose(img1, img4)  # but actually different sampling
