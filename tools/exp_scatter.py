"""Experiment: deposit-scatter alternatives for the photon walk.

The walk writes one [N,3] value row per path into a flat [N*depth, 3]
buffer at fslot = path*depth + slot (sorted, unique). Measured 11+ ms per
scatter at N=262k on v5e — 4 of them per walk step dominate the trace
pass. Candidates:
  A. baseline .at[fslot].set(where(dep, v, buf[fslot]))
  B. same + indices_are_sorted/unique_indices flags (+ mode=drop on a
     sentinel row for masked lanes — no gather of old rows)
  C. dense one-hot rewrite: view [N, depth], mask = dep & (col == slot),
     buf = where(mask, repeat(v), buf) — pure elementwise, no scatter
Run: python tools/exp_scatter.py
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
    print(f"{name:44s} {dt * 1e3:9.3f} ms/scatter", flush=True)
    return outs[1][0]


def main():
    key = jax.random.PRNGKey(0)
    rows = jnp.arange(N)
    slot = jax.random.randint(key, (N,), 0, DEPTH)
    dep = jax.random.uniform(jax.random.fold_in(key, 1), (N,)) > 0.5
    val = jax.random.normal(jax.random.fold_in(key, 2), (N, 3))
    buf0 = jnp.zeros((N * DEPTH, 3), jnp.float32)
    fslot = rows * DEPTH + slot

    def mk_a(reps):
        @jax.jit
        def run(buf):
            def body(i, b):
                v = val + 1e-9 * i
                return b.at[fslot].set(jnp.where(dep[:, None], v, b[fslot]))
            return jax.lax.fori_loop(0, reps, body, buf)
        return run

    def mk_b(reps):
        nrows = N * DEPTH
        # masked lanes scatter to an out-of-range row → dropped
        fs = jnp.where(dep, fslot, nrows)

        @jax.jit
        def run(buf):
            def body(i, b):
                v = val + 1e-9 * i
                return b.at[fs].set(v, mode="drop",
                                    indices_are_sorted=True,
                                    unique_indices=True)
            return jax.lax.fori_loop(0, reps, body, buf)
        return run

    def mk_c(reps):
        cols = jnp.arange(DEPTH, dtype=jnp.int32)[None, :]  # [1, D]

        @jax.jit
        def run(buf):
            def body(i, b):
                v = val + 1e-9 * i
                b3 = b.reshape(N, DEPTH, 3)
                mask = (dep[:, None] & (cols == slot[:, None]))[..., None]
                b3 = jnp.where(mask, v[:, None, :], b3)
                return b3.reshape(N * DEPTH, 3)
            return jax.lax.fori_loop(0, reps, body, buf)
        return run

    out_a = chain_bench("A baseline gather+set", mk_a, buf0)
    out_b = chain_bench("B sorted/unique drop-scatter", mk_b, buf0)
    out_c = chain_bench("C dense one-hot rewrite", mk_c, buf0)
    print("B == A:", bool(jnp.array_equal(out_a, out_b)),
          " C == A:", bool(jnp.array_equal(out_a, out_c)))

    # bool variant (validity buffer)
    vbuf0 = jnp.zeros((N * DEPTH,), bool)

    def mk_vb(reps):
        fs = jnp.where(dep, fslot, N * DEPTH)

        @jax.jit
        def run(buf):
            def body(i, b):
                return b.at[fs].set(dep | (i < 0), mode="drop",
                                    indices_are_sorted=True,
                                    unique_indices=True)
            return jax.lax.fori_loop(0, reps, body, buf)
        return run

    chain_bench("B bool validity scatter", mk_vb, vbuf0)


if __name__ == "__main__":
    main()
