"""Observability subsystem (SURVEY.md §5.1/§5.5): structured pass logs,
throughput counters, gated device debug print."""
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.utils import metrics


def test_log_pass_structured(caplog):
    with caplog.at_level(logging.INFO, logger="raytrace_tpu"):
        metrics.log_pass("photon_wave", wave=3, valid_photons=123)
    text = caplog.text
    assert "pass=photon_wave" in text
    assert "wave=3" in text and "valid_photons=123" in text


def test_throughput_counter():
    with metrics.Throughput() as t:
        time.sleep(0.05)
    assert t.seconds >= 0.05
    assert 0 < t.rate(1000) <= 1000 / 0.05


def test_device_debug_print_compiles():
    @jax.jit
    def f(xy, v):
        metrics.device_debug_print("v={}", xy[0], xy[1], 2, 3, v)
        return v * 2

    out = f(jnp.asarray([2, 3]), jnp.float32(7.0))
    assert float(out) == 14.0
    out = f(jnp.asarray([0, 0]), jnp.float32(7.0))  # non-debug pixel
    assert float(out) == 14.0


def test_progressive_verbose_logs(caplog):
    from raytrace_tpu.core.config import RenderConfig
    from raytrace_tpu.renderers.photon import render_photon_progressive
    from raytrace_tpu.scene import presets

    scene, camera = presets.cornell_box(size=8)
    config = RenderConfig(width=8, height=8, spp=1, scene_epsilon=1e-3,
                          photon_paths=256, photon_passes=2,
                          max_photon_bounces=3)
    with caplog.at_level(logging.INFO, logger="raytrace_tpu"):
        img, _ = render_photon_progressive(
            scene, camera, config, jax.random.PRNGKey(0), jitter=False,
            verbose=True)
    assert np.isfinite(np.asarray(img)).all()
    assert caplog.text.count("pass=photon_wave") == 2
    assert "photons_per_s" in caplog.text
