"""Experiment round 3: padding-free deposit writes.

  F  flat one-hot on [N*D, 3] without rank-3 reshape (iota%D mask)
  G  three 1-D [N*D] component buffers (never tile-padded) + flat one-hot
Run: python tools/exp_scatter3.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 18
DEPTH = 8
R = 8


def _fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:2])


def chain_bench(name, mk, *args):
    f1, f2 = mk(R), mk(2 * R)
    outs = []
    for f in (f1, f2):
        o = f(*args)
        _fetch(o)
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            o = f(*args)
            _fetch(o)
            best = min(best, time.perf_counter() - t0)
        outs.append((o, best))
    dt = (outs[1][1] - outs[0][1]) / R
    print(f"{name:46s} {dt * 1e3:9.3f} ms/step", flush=True)
    return outs[1][0]


def main():
    key = jax.random.PRNGKey(0)
    slot = jax.random.randint(key, (N,), 0, DEPTH)
    dep = jax.random.uniform(jax.random.fold_in(key, 1), (N,)) > 0.5
    val = jax.random.normal(jax.random.fold_in(key, 2), (N, 3))
    ND = N * DEPTH
    col_iota = (jnp.arange(ND, dtype=jnp.int32) % DEPTH)

    # --- F: flat mask on [N*D, 3], no rank-3 intermediate
    buf0 = jnp.zeros((ND, 3), jnp.float32)

    def mk_f(reps):
        @jax.jit
        def run(buf):
            def body(i, b):
                v = val + 1e-9 * i
                mask = jnp.repeat(dep, DEPTH) & (
                    col_iota == jnp.repeat(slot, DEPTH))
                vr = jnp.repeat(v, DEPTH, axis=0)
                return jnp.where(mask[:, None], vr, b)
            return jax.lax.fori_loop(0, reps, body, buf)
        return run

    out_f = chain_bench("F flat one-hot [N*D,3]", mk_f, buf0)

    # --- G: three 1-D component buffers
    b1 = (jnp.zeros((ND,), jnp.float32),) * 3

    def mk_g(reps):
        @jax.jit
        def run(bufs):
            def body(i, bs):
                v = val + 1e-9 * i
                mask = jnp.repeat(dep, DEPTH) & (
                    col_iota == jnp.repeat(slot, DEPTH))
                return tuple(
                    jnp.where(mask, jnp.repeat(v[:, c], DEPTH), bs[c])
                    for c in range(3))
            return jax.lax.fori_loop(0, reps, body, bufs)
        return run

    out_g = chain_bench("G three 1-D [N*D] buffers", mk_g, b1)

    # --- G4: all four photon buffers (p,a,wi = 9 comps + valid) 1-D
    b4 = tuple(jnp.zeros((ND,), jnp.float32) for _ in range(9)) + (
        jnp.zeros((ND,), bool),)
    v2 = jax.random.normal(jax.random.fold_in(key, 3), (N, 3))
    v3 = jax.random.normal(jax.random.fold_in(key, 4), (N, 3))

    def mk_g4(reps):
        @jax.jit
        def run(bufs):
            def body(i, bs):
                v = val + 1e-9 * i
                mask = jnp.repeat(dep, DEPTH) & (
                    col_iota == jnp.repeat(slot, DEPTH))
                comps = [v[:, 0], v[:, 1], v[:, 2],
                         v2[:, 0], v2[:, 1], v2[:, 2],
                         v3[:, 0], v3[:, 1], v3[:, 2]]
                new = tuple(
                    jnp.where(mask, jnp.repeat(comps[c], DEPTH), bs[c])
                    for c in range(9))
                return new + (bs[9] | mask,)
            return jax.lax.fori_loop(0, reps, body, bufs)
        return run

    chain_bench("G4 full deposit (9 f32 + valid) 1-D", mk_g4, b4)

    print("F == G:", bool(jnp.array_equal(
        out_f, jnp.stack(out_g, axis=1))))


if __name__ == "__main__":
    main()
