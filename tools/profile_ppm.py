"""Per-pass TPU timing of the PPM pipeline at the headline config.

Times camera pass, direct lighting, photon trace, gather, and the full
pipeline separately so optimization targets the real hot spot.
Run: python tools/profile_ppm.py [--size 512] [--paths 262144]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytrace_tpu.core.config import RenderConfig
from raytrace_tpu.ops import photon_grid
from raytrace_tpu.renderers import common
from raytrace_tpu.renderers import photon as ph
from raytrace_tpu.scene import presets
from raytrace_tpu.scene.camera import generate_rays, pixel_samples


def _fetch(out):
    # the axon backend executes lazily; only a host fetch forces the run
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:2] if leaf.ndim else leaf)


def bench(name, fn, *args, iters=5):
    # the axon tunnel reproducibly rejects the ~5th DISTINCT large program
    # loaded in one process (INVALID_ARGUMENT on the first fetch) — drop
    # compiled executables between timed sections so each pass loads fresh
    # (timings are unaffected: each bench re-warms before the timed loop)
    jax.clear_caches()
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt * 1e3:9.2f} ms")
    return out, dt


def grad_mode(args):
    """--grad: stage-carved fwd+bwd timings of loss_and_grad (VERDICT r3
    #3) — camera+direct-only gradient, forward-only, and the full thing."""
    from raytrace_tpu.diff.render import (apply_params, extract_params,
                                          loss_and_grad)
    from raytrace_tpu.utils import film

    size = args.size
    config = RenderConfig(
        width=size, height=size, spp=1, scene_epsilon=1e-3,
        photon_paths=args.paths, photon_passes=1, max_photon_bounces=8,
        footprint_radius_scale=8.0, differentiable=True,
    )
    scene, camera = presets.cornell_box(size=size, ball="glass")
    ls = common.static_light_samples(scene, config)
    params = extract_params(scene)
    target = jnp.zeros((size, size, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def fwd_only(p):
        sc = apply_params(scene, p)
        img, _ = ph._render_photon(sc, camera, key, config, ls, False)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def grad_direct(p):
        def loss(q):
            sc = apply_params(scene, q)
            k_pix, k_light, _ = jax.random.split(key, 3)
            xy, lens = pixel_samples(k_pix, size, size, 1, jitter=False)
            rays = generate_rays(camera, xy, lens, 1)
            rec = common.camera_pass(sc, rays.o, rays.d, config, rays=rays)
            direct = common.direct_lighting(
                sc, rec, k_light, config, ls, include_emitted=True)
            img = film.splat_box(
                xy, jnp.where(rec.hit[:, None], rec.atten * direct, 0.0),
                size, size)
            return jnp.mean((img - target) ** 2)
        return jax.grad(loss)(p)

    full = jax.jit(lambda p: loss_and_grad.__wrapped__(
        p, target, scene, camera, config, key, ls, False))

    bench("diff fwd only", fwd_only, params, iters=3)
    bench("camera+direct fwd+bwd", grad_direct, params, iters=3)
    bench("FULL loss_and_grad", full, params, iters=3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--paths", type=int, default=262144)
    ap.add_argument("--no-compact", action="store_true")
    ap.add_argument("--grad", action="store_true")
    args = ap.parse_args()
    if args.grad:
        grad_mode(args)
        return
    size = args.size

    config = RenderConfig(
        width=size, height=size, spp=1, scene_epsilon=1e-3,
        photon_paths=args.paths, photon_passes=1, max_photon_bounces=8,
        footprint_radius_scale=8.0,
        wavefront_compact=not args.no_compact,
    )
    scene, camera = presets.cornell_box(size=size, ball="glass")
    light_samples = common.static_light_samples(scene, config)
    key = jax.random.PRNGKey(0)
    k_pix, k_light, k_photon = jax.random.split(key, 3)

    xy, lens = pixel_samples(k_pix, size, size, 1, jitter=True)
    rays = generate_rays(camera, xy, lens, 1)

    # FULL pipeline first: timing it after the per-pass jits has twice
    # produced a spurious axon INVALID_ARGUMENT on the final fetch (the
    # per-pass programs + their live outputs interact badly with the big
    # scan'd program on the tunnel backend; bench.py, which runs the same
    # render_photon call in a fresh process, is unaffected).
    # render_photon jits internally (scene as a dynamic arg; the light-
    # sample counts are read host-side before tracing) — no outer jit
    full = lambda sc, k: ph.render_photon(sc, camera, config, k)
    _, t_full = bench("FULL pipeline", full, scene, key)

    # scene/rays enter as traced ARGS (closures would embed them as HLO
    # constants — at 4M-triangle scale that exceeds the remote compile
    # service's request size limit)
    cam = jax.jit(lambda sc, o, d, ry: common.camera_pass(
        sc, o, d, config, rays=ry))
    rec, t_cam = bench("camera_pass", cam, scene, rays.o, rays.d, rays)

    dl = jax.jit(lambda sc, rec, k: common.direct_lighting(
        sc, rec, k, config, light_samples, include_emitted=True))
    direct, t_dl = bench("direct_lighting", dl, scene, rec, k_light)

    tp = jax.jit(lambda sc, k: ph.trace_photons(sc, config, k, 0))
    photons, t_tp = bench("photon_trace", tp, scene, k_photon)

    state = ph.ProgressiveState(
        radius2=ph.initial_radius2(rec, config),
        photon_count=jnp.zeros((rays.o.shape[0],), jnp.float32),
        flux=jnp.zeros((rays.o.shape[0], 3), jnp.float32),
    )
    gp = jax.jit(lambda sc, rec, st, pm: ph.gathering_pass(
        sc, rec, st, pm, config))
    (_, _), t_g = bench("gathering_pass", gp, scene, rec, state, photons)

    parts = t_cam + t_dl + t_tp + t_g
    print(f"{'sum of parts':28s} {parts * 1e3:9.2f} ms")
    print(f"rays/s (full): {size * size / t_full:,.0f}")


if __name__ == "__main__":
    main()
