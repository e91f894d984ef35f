"""Chained-iteration micro-profile of the photon-step sub-ops.

The axon tunnel adds a ~25 ms host-fetch floor per timed call, swamping
ops in the 5-50 ms range. Here each op runs CHAINED inside one jitted
fori_loop (output perturbs the next input, so the backend cannot skip or
overlap iterations) and the per-iteration time is (t_loop(2R) - t_loop(R))
/ R — fetch floor and dispatch cancel in the difference.

Run: python tools/profile_step.py [--paths 262144]
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
import numpy as np

from raytrace_tpu.core import sampling, vec
from raytrace_tpu.core.config import RenderConfig
from raytrace_tpu.ops import intersect as isect_ops
from raytrace_tpu.shading import light as light_ops
from raytrace_tpu.shading import material as mat_ops
from raytrace_tpu.renderers import photon as ph
from raytrace_tpu.scene import presets

R = 8  # chain length unit


def _fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:2] if leaf.ndim else leaf)


def timed(fn, *args, iters=3):
    out = fn(*args)
    _fetch(out)
    best = 1e30
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _fetch(out)
        best = min(best, time.perf_counter() - t0)
    return best


def chain_bench(name, mk_loop, *args):
    """mk_loop(reps) -> jitted fn running `reps` chained iterations."""
    f1 = mk_loop(R)
    f2 = mk_loop(2 * R)
    t1 = timed(f1, *args)
    t2 = timed(f2, *args)
    dt = (t2 - t1) / R
    print(f"{name:34s} {dt * 1e3:9.2f} ms/iter   (loop{R}={t1*1e3:.0f}ms, "
          f"loop{2*R}={t2*1e3:.0f}ms)", flush=True)
    return dt


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
    eps = jnp.float32(config.scene_epsilon)

    # a realistic bounce population: emission rays
    ids = jnp.arange(n, dtype=jnp.uint32)
    perms = sampling.halton_permutations(jax.random.fold_in(key, 1))
    smp = sampling.halton_sample_4d(ids * jnp.uint32(8), perms)
    le, o0, d0, ns_l, pdf = light_ops.sample_Le(
        scene.lights, 0, smp[:, 0], smp[:, 1], smp[:, 2], smp[:, 3])
    o0 = jax.device_put(o0)
    d0 = jax.device_put(d0)

    # ---- full intersect ----------------------------------------------------
    def mk_isect(reps):
        @jax.jit
        def run(o, d):
            def body(i, od):
                o, d = od
                hit = isect_ops.intersect(
                    scene, o, d, jnp.full((n,), eps),
                    jnp.full((n,), jnp.float32(1e30)))
                # perturb: dependency chain, cheap
                return (o + 1e-9 * hit.t[:, None], d)
            return jax.lax.fori_loop(0, reps, body, (o, d))[0]
        return run

    chain_bench("intersect (all families)", mk_isect, o0, d0)

    # ---- triangles only ----------------------------------------------------
    def mk_tri(reps):
        @jax.jit
        def run(o, d):
            def body(i, od):
                o, d = od
                t, idx, b, g = isect_ops.intersect_triangles(
                    scene, o, d, jnp.full((n,), eps),
                    jnp.full((n,), jnp.float32(1e30)))
                return (o + 1e-9 * t[:, None], d)
            return jax.lax.fori_loop(0, reps, body, (o, d))[0]
        return run

    chain_bench("intersect triangles only", mk_tri, o0, d0)

    # ---- tri attributes ----------------------------------------------------
    def mk_tri_attr(reps):
        @jax.jit
        def run(o, d):
            t, idx, b, g = isect_ops.intersect_triangles(
                scene, o, d, jnp.full((n,), eps),
                jnp.full((n,), jnp.float32(1e30)))
            def body(i, acc):
                p, ng, ns, dpdu, dpdv, uv, mat, light = (
                    isect_ops.triangle_attributes(
                        scene, idx, b, g, o, d, t + 1e-12 * acc))
                return acc + p[0, 0]
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        return run

    chain_bench("triangle_attributes", mk_tri_attr, o0, d0)

    # ---- spheres + disks ---------------------------------------------------
    def mk_sph(reps):
        @jax.jit
        def run(o, d):
            def body(i, od):
                o, d = od
                t, idx = isect_ops.intersect_spheres(
                    scene, o, d, jnp.full((n,), eps),
                    jnp.full((n,), jnp.float32(1e30)))
                return (o + 1e-9 * t[:, None], d)
            return jax.lax.fori_loop(0, reps, body, (o, d))[0]
        return run

    chain_bench("intersect spheres only", mk_sph, o0, d0)

    def mk_disk(reps):
        @jax.jit
        def run(o, d):
            def body(i, od):
                o, d = od
                t, idx = isect_ops.intersect_disks(
                    scene, o, d, jnp.full((n,), eps),
                    jnp.full((n,), jnp.float32(1e30)))
                return (o + 1e-9 * t[:, None], d)
            return jax.lax.fori_loop(0, reps, body, (o, d))[0]
        return run

    chain_bench("intersect disks only", mk_disk, o0, d0)

    # ---- one full photon step ---------------------------------------------
    step = partial(ph._photon_step, scene, config)
    u = jax.random.uniform(key, (n, 3))
    alpha0 = jnp.abs(le) + 0.1

    def mk_step(reps):
        @jax.jit
        def run(o, d, alpha):
            ni = jnp.zeros((n,), jnp.int32)
            act = jnp.ones((n,), bool)
            def body(i, s):
                o, d, alpha = s
                out = step(o, d, alpha, ni, act, u)
                return (out["o"], out["d"],
                        alpha + 1e-9 * out["alpha"])
            return jax.lax.fori_loop(0, reps, body, (o, d, alpha))[0]
        return run

    chain_bench("FULL _photon_step", mk_step, o0, d0, alpha0)

    # ---- sample_f + RNG ----------------------------------------------------
    hit = jax.jit(lambda o, d: isect_ops.intersect(
        scene, o, d, jnp.full((n,), eps),
        jnp.full((n,), jnp.float32(1e30))))(o0, d0)

    def mk_bsdf(reps):
        @jax.jit
        def run(d):
            def body(i, d):
                fr, wi, pdf = mat_ops.sample_f(
                    scene.materials, hit.mat, hit.ns, hit.dpdu, -d,
                    u[:, 0], u[:, 1], uv=hit.uv)
                return d + 1e-9 * wi
            return jax.lax.fori_loop(0, reps, body, d)
        return run

    chain_bench("sample_f", mk_bsdf, d0)

    def mk_rng(reps):
        @jax.jit
        def run(k):
            def body(i, k):
                kk = jax.vmap(lambda j: jax.random.fold_in(k, j))(ids)
                uu = jax.vmap(lambda kk_: jax.random.uniform(
                    kk_, (9, 3), dtype=jnp.float32))(kk)
                return jax.random.fold_in(k, jnp.int32(uu[0, 0, 0] * 2))
            return jax.lax.fori_loop(0, reps, body, k)
        return run

    chain_bench("uniforms (9x3 per path)", mk_rng, key)

    # ---- deposit scatter ---------------------------------------------------
    md = config.max_photon_depth
    buf = jnp.zeros((n * md, 3), jnp.float32)
    slot = jnp.argmin(jnp.abs(u[:, 0]))  # dummy
    fslot = jnp.arange(n) * md + (ids % md).astype(jnp.int32)
    dep = u[:, 2] > 0.5

    def mk_scat(reps):
        @jax.jit
        def run(b):
            def body(i, b):
                v = o0 + 1e-9 * i
                return b.at[fslot].set(
                    jnp.where(dep[:, None], v, b[fslot]))
            return jax.lax.fori_loop(0, reps, body, b)
        return run

    chain_bench("one masked deposit scatter", mk_scat, buf)


if __name__ == "__main__":
    main()
