"""Micro-profile of the photon-trace pass internals at the headline config.

Carves trace_photons into: emission sampling + uniforms, one full-width
_photon_step, the intersect alone, and the full trace — so the 400 ms
trace cost is attributed to real sub-ops.
Run: python tools/profile_trace.py [--paths 262144]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytrace_tpu.core import sampling, spectrum, vec
from raytrace_tpu.core.config import RenderConfig
from raytrace_tpu.ops import intersect as isect_ops
from raytrace_tpu.shading import light as light_ops
from raytrace_tpu.renderers import photon as ph
from raytrace_tpu.scene import presets


def _fetch(out):
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:2] if leaf.ndim else leaf)


def bench(name, fn, *args, iters=5):
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt * 1e3:9.2f} ms", flush=True)
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=262144)
    args = ap.parse_args()

    config = RenderConfig(
        width=512, height=512, spp=1, scene_epsilon=1e-3,
        photon_paths=args.paths, photon_passes=1, max_photon_bounces=8,
    )
    scene, _cam = presets.cornell_box(size=512, ball="glass")
    key = jax.random.PRNGKey(7)
    n = args.paths
    max_depth = config.max_photon_depth

    # ---- stage 1: emission + uniforms --------------------------------------
    @jax.jit
    def emit(key):
        k_perm, k_bounce = jax.random.split(jax.random.fold_in(key, 0))
        perms = sampling.halton_permutations(k_perm)
        ids = jnp.arange(n, dtype=jnp.uint32)
        smp = sampling.halton_sample_4d(
            ids * jnp.uint32(max_depth if config.halton_stride_by_depth else 1),
            perms)
        le, o, d, ns_l, pdf = light_ops.sample_Le(
            scene.lights, 0, smp[:, 0], smp[:, 1], smp[:, 2], smp[:, 3])
        path_keys = jax.vmap(lambda i: jax.random.fold_in(k_bounce, i))(ids)
        uniforms = jax.vmap(
            lambda k: jax.random.uniform(k, (max_depth + 1, 3),
                                         dtype=jnp.float32))(path_keys)
        return le, o, d, uniforms

    (le, o, d, uniforms), t_emit = bench("emission+halton+uniforms", emit, key)
    alpha = jnp.broadcast_to(jnp.float32(1.0), (n, 3)) * le
    act = jnp.ones((n,), bool)
    u0 = uniforms[:, 0]

    # ---- stage 2: intersect alone ------------------------------------------
    @jax.jit
    def isect(o, d, act):
        eps = jnp.float32(config.scene_epsilon)
        return isect_ops.intersect(
            scene, o, d, jnp.full((n,), eps),
            jnp.where(act, jnp.float32(1e30), 0.0))

    bench("intersect full-width", isect, o, d, act)

    # ---- stage 3: one full _photon_step ------------------------------------
    step = jax.jit(partial(ph._photon_step, scene, config))
    ni = jnp.zeros((n,), jnp.int32)
    bench("one full-width photon step", step, o, d, alpha, ni, act, u0)

    # ---- stage 4: full trace ----------------------------------------------
    @jax.jit
    def trace(key):
        pm, info, _, _ = ph._trace_photons_core(scene, config, key, 0)
        return pm.valid.sum(), pm.alpha

    bench("FULL trace_photons", trace, key)

    # grid build on top
    from raytrace_tpu.ops import photon_grid

    @jax.jit
    def trace_and_grid(key):
        pm, info, _, _ = ph._trace_photons_core(scene, config, key, 0)
        cell = jnp.float32(0.05)
        g = photon_grid.build_grid(pm, cell)
        return g.cell_start.sum() if hasattr(g, "cell_start") else g

    try:
        bench("trace + grid build", trace_and_grid, key)
    except Exception as e:  # grid API may differ; the trace number stands
        print("trace+grid skipped:", type(e).__name__, str(e)[:120])


if __name__ == "__main__":
    main()
