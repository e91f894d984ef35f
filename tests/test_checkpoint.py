"""PPM checkpoint/resume (SURVEY.md §5.4): resumed rendering must equal
uninterrupted rendering bit-for-bit, and the progressive wave API must agree
with the fused single-jit renderer."""
import dataclasses

import jax
import numpy as np

from raytrace_tpu.core.config import RenderConfig
from raytrace_tpu.renderers.photon import (
    render_photon,
    render_photon_progressive,
)
from raytrace_tpu.scene import presets

KEY = jax.random.PRNGKey(5)
SIZE = 16


def _setup(passes=3):
    scene, camera = presets.cornell_box(size=SIZE)
    config = RenderConfig(
        width=SIZE, height=SIZE, spp=1, scene_epsilon=1e-3,
        photon_paths=1 << 9, photon_passes=passes, max_photon_bounces=4,
        exact_gather=True,
    )
    return scene, camera, config


def test_progressive_matches_fused_renderer():
    scene, camera, config = _setup(passes=2)
    img_prog, _ = render_photon_progressive(
        scene, camera, config, KEY, jitter=False)
    img_fused = render_photon(scene, camera, config, KEY, jitter=False)
    np.testing.assert_allclose(np.asarray(img_prog), np.asarray(img_fused),
                               rtol=1e-5, atol=1e-7)


def test_resume_equals_uninterrupted(tmp_path):
    scene, camera, config = _setup(passes=3)
    ckpt = str(tmp_path / "ppm.ckpt")

    # uninterrupted reference
    img_ref, state_ref = render_photon_progressive(
        scene, camera, config, KEY, jitter=False)

    # "crash" after wave 1: run a 1-pass config that checkpoints, then
    # resume the full 3-pass render from the same file
    cfg1 = dataclasses.replace(config, photon_passes=1)
    render_photon_progressive(
        scene, camera, cfg1, KEY, jitter=False,
        checkpoint_path=ckpt, save_every=1)

    img_res, state_res = render_photon_progressive(
        scene, camera, config, KEY, jitter=False,
        checkpoint_path=ckpt, save_every=1)

    np.testing.assert_array_equal(np.asarray(img_res), np.asarray(img_ref))
    np.testing.assert_array_equal(np.asarray(state_res.flux),
                                  np.asarray(state_ref.flux))
    np.testing.assert_array_equal(np.asarray(state_res.radius2),
                                  np.asarray(state_ref.radius2))


def test_checkpoint_roundtrip(tmp_path):
    from raytrace_tpu.renderers.photon import ProgressiveState
    from raytrace_tpu.utils import checkpoint as ck

    rng = np.random.default_rng(0)
    state = ProgressiveState(
        radius2=jax.numpy.asarray(rng.random(64, dtype=np.float32)),
        photon_count=jax.numpy.asarray(rng.random(64, dtype=np.float32)),
        flux=jax.numpy.asarray(rng.random((64, 3), dtype=np.float32)),
    )
    path = str(tmp_path / "s.ckpt")
    ck.save_progressive(path, state, next_pass=7, key=KEY,
                        emitted_photons=12345.0)
    s2, nxt, key_data, emitted = ck.load_progressive(path)
    assert nxt == 7 and emitted == 12345.0
    np.testing.assert_array_equal(np.asarray(KEY), key_data)
    np.testing.assert_array_equal(np.asarray(state.flux), np.asarray(s2.flux))
