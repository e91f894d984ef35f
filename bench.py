"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: camera rays/sec through the full photon-mapping forward pipeline
(camera pass + direct lighting + photon trace + grid build + gather +
combine) on one chip — the reference's whole 4-pass render
(photonmappingrenderer.cpp:31-45) expressed as work/second. photons/sec for
the photon-trace stage is reported in the same line.

The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against RAYS_PER_S_R1, the first working throughput recorded in round
1 — it tracks our own progress round-over-round.

Compile times on the shared TPU compile service are highly variable, so the
harness tries configs from largest to smallest in subprocesses with a
per-attempt wall-clock cap and reports the largest one that finished.
Run with `--size N --paths P` to force a single config in-process.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

# Round-1 anchor for vs_baseline (first measured working throughput).
RAYS_PER_S_R1 = 2.0e6

# (size, photon_paths) attempts, largest first.
ATTEMPTS = [(512, 1 << 18), (256, 1 << 16), (128, 1 << 14), (64, 1 << 12)]
ATTEMPT_TIMEOUT_S = 1500


def run_once(size: int, photon_paths: int) -> dict:
    import jax

    from raytrace_tpu.core.config import RenderConfig
    from raytrace_tpu.renderers.photon import render_photon
    from raytrace_tpu.scene import presets

    spp = 1
    config = RenderConfig(
        width=size, height=size, spp=spp, scene_epsilon=1e-3,
        photon_paths=photon_paths, photon_passes=1, max_photon_bounces=8,
    )
    scene, camera = presets.cornell_box(size=size, ball="glass")

    def run(key):
        return render_photon(scene, camera, config, key)

    t0 = time.perf_counter()
    run(jax.random.PRNGKey(0)).block_until_ready()
    compile_s = time.perf_counter() - t0

    n_iters = 5
    t0 = time.perf_counter()
    for i in range(n_iters):
        img = run(jax.random.PRNGKey(i + 1))
    img.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters

    camera_rays = size * size * spp
    photons = config.photon_paths * config.photon_passes
    rays_per_s = camera_rays / dt
    return {
        "metric": "camera_rays_per_sec_full_ppm_pipeline",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / RAYS_PER_S_R1,
        "extra": {
            "photons_per_sec": photons / dt,
            "frame_time_s": dt,
            "compile_s": compile_s,
            "width": size, "height": size, "spp": spp,
            "photon_paths": photons,
            "device": str(jax.devices()[0]),
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=0)
    ap.add_argument("--paths", type=int, default=0)
    args = ap.parse_args()

    if args.size:
        print(json.dumps(run_once(args.size, args.paths or (args.size ** 2))))
        return

    for size, paths in ATTEMPTS:
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--size", str(size), "--paths", str(paths)],
                capture_output=True, text=True, timeout=ATTEMPT_TIMEOUT_S,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            if out.returncode == 0:
                for line in reversed(out.stdout.strip().splitlines()):
                    if line.startswith("{"):
                        print(line)
                        return
        except subprocess.TimeoutExpired:
            print(f"# bench attempt {size}x{size} timed out; trying smaller",
                  file=sys.stderr)
    print(json.dumps({
        "metric": "camera_rays_per_sec_full_ppm_pipeline",
        "value": 0.0, "unit": "rays/s", "vs_baseline": 0.0,
        "extra": {"error": "all attempts failed"},
    }))


if __name__ == "__main__":
    main()
