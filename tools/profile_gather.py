"""TPU micro-benchmark: Morton-span grid kernel vs row-span kernel vs dense
at Cornell-like photon/query scales.

Run: python tools/profile_gather.py [--photons 2097152] [--queries 262144]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.ops import pallas_gather as pgp


def bench(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:24s} {dt * 1e3:9.2f} ms")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--photons", type=int, default=1 << 21)
    ap.add_argument("--queries", type=int, default=1 << 18)
    ap.add_argument("--dense", action="store_true")
    args = ap.parse_args()
    P, N = args.photons, args.queries

    rng = np.random.default_rng(0)
    # Cornell-like: photons over a 5.5-unit box, ~55% valid
    p = rng.uniform(0, 5.5, (P, 3)).astype(np.float32)
    alpha = rng.uniform(0, 1e-3, (P, 3)).astype(np.float32)
    wi = rng.normal(size=(P, 3)).astype(np.float32)
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    valid = rng.uniform(size=P) < 0.55

    # queries on walls-ish with footprint radii 0.02..0.12, a few at 0.4
    qp = rng.uniform(0, 5.5, (N, 3)).astype(np.float32)
    r = rng.uniform(0.02, 0.12, N).astype(np.float32)
    r[rng.uniform(size=N) < 0.02] = 0.4
    r2 = (r * r).astype(np.float32)
    ns = rng.normal(size=(N, 3)).astype(np.float32)
    ns /= np.linalg.norm(ns, axis=-1, keepdims=True)
    kd = rng.uniform(0, 1, (N, 3)).astype(np.float32)

    cell = float(r.max())
    j = jnp.asarray
    pj, aj, wj, vj = j(p), j(alpha), j(wi), j(valid)
    qj, r2j, nsj, kdj = j(qp), j(r2), j(ns), j(kd)

    Lr, mr, ovf = bench(
        "rowspan", pgp.gather_radius_pallas_rowspan,
        pj, aj, wj, vj, cell, qj, r2j, nsj, kdj)
    print("  overflow:", int(ovf), " sumM:", int(jnp.sum(mr)))
    Lg, mg = bench(
        "morton-span", pgp.gather_radius_pallas_grid,
        pj, aj, wj, vj, cell, qj, r2j, nsj, kdj)
    print("  sumM:", int(jnp.sum(mg)))
    print("  M equal:", bool(jnp.all(mr == mg)),
          " L close:", bool(jnp.allclose(Lr, Lg, rtol=2e-4, atol=1e-6)))
    if args.dense:
        pp, pa, pw, pv, nv = pgp.compact_photons(
            type("PM", (), dict(p=pj, alpha=aj, wi=wj, valid=vj))())
        bench("dense", pgp.gather_radius_pallas,
              pp, pa, pw, pv, nv, qj, r2j, nsj, kdj)


if __name__ == "__main__":
    main()
