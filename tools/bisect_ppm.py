"""Bisect full-pipeline frame time by toggling config knobs on TPU.

Run: python tools/bisect_ppm.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from raytrace_tpu.core.config import RenderConfig
from raytrace_tpu.renderers.photon import render_photon
from raytrace_tpu.scene import presets

SIZE = 512
BASE = dict(
    width=SIZE, height=SIZE, spp=1, scene_epsilon=1e-3,
    photon_paths=1 << 18, photon_passes=1, max_photon_bounces=8,
    footprint_radius_scale=8.0,
)

VARIANTS = [
    ("default", {}),
    ("tiny_photons(camera+gatherless)", dict(photon_paths=1 << 10)),
    ("no_specular_chain", dict(max_specular_depth=0)),
    ("one_photon_bounce", dict(max_photon_bounces=1)),
    ("no_compact", dict(wavefront_compact=False)),
]


def main():
    scene, camera = presets.cornell_box(size=SIZE, ball="glass")
    for name, over in VARIANTS:
        config = RenderConfig(**{**BASE, **over})
        fn = lambda k: render_photon(scene, camera, config, k)
        t0 = time.perf_counter()
        img = fn(jax.random.PRNGKey(0))
        img.block_until_ready()
        compile_s = time.perf_counter() - t0
        iters = 5
        t0 = time.perf_counter()
        for i in range(iters):
            img = fn(jax.random.PRNGKey(i + 1))
        img.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:34s} {dt * 1e3:9.2f} ms   (compile {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
