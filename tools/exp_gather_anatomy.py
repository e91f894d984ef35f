"""Carve gather_radius_pallas_rowspan into prep stages and time each.

Stages (cumulative jits, differenced):
  1. photon cell keys + argsort              (2M int32 sort)
  2. + sorted row gathers (10 rows)          (gdata/adata builds)
  3. + query morton sort + tile boxes + searchsorted spans
  4. + cov rasterize + nonzero job list
  5. + one kernel round (the real call)
Run: python tools/exp_gather_anatomy.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.ops import pallas_gather as pgp
from raytrace_tpu.ops import photon_grid as pg

CHUNK = pgp.ROWSPAN_CHUNK
TILE_Q = pgp.TILE_Q
R_MAX = pgp.R_MAX
_KEY_SENTINEL = pgp._KEY_SENTINEL


def _fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:2] if leaf.ndim else leaf)


def bench(name, fn, *args, iters=5):
    out = fn(*args)
    _fetch(out)
    best = 1e30
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _fetch(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best * 1e3:9.2f} ms", flush=True)
    return out, best


def main():
    P, N = 1 << 21, 1 << 18
    rng = np.random.default_rng(0)
    p = rng.uniform(0, 5.5, (P, 3)).astype(np.float32)
    alpha = rng.uniform(0, 1e-3, (P, 3)).astype(np.float32)
    wi = rng.normal(size=(P, 3)).astype(np.float32)
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    valid = rng.uniform(size=P) < 0.25
    qp = rng.uniform(0, 5.5, (N, 3)).astype(np.float32)
    r = rng.uniform(0.02, 0.12, N).astype(np.float32)
    r2 = (r * r).astype(np.float32)
    ns = rng.normal(size=(N, 3)).astype(np.float32)
    ns /= np.linalg.norm(ns, axis=-1, keepdims=True)
    cell_f = float(np.quantile(r, 0.9))

    j = jnp.asarray
    pp, pa, pw, pv = j(p), j(alpha), j(wi), j(valid)
    qpj, r2j, nsj = j(qp), j(r2), j(ns)
    cell = jnp.float32(cell_f)

    def keys_sort(pp, pv):
        cellc = jnp.floor(pp / cell).astype(jnp.int32)
        big = jnp.int32(2 ** 30)
        origin = jnp.min(jnp.where(pv[:, None], cellc, big), axis=0)
        origin = jnp.where(origin == big, 0, origin)
        pcell = jnp.clip(cellc - origin, 0, 1023)
        pack = lambda z, y, x: (z << 20) | (y << 10) | x
        pkey = jnp.where(pv, pack(pcell[:, 2], pcell[:, 1], pcell[:, 0]),
                         _KEY_SENTINEL)
        order = jnp.argsort(pkey)
        return pkey[order], order, origin

    bench("1. cell keys + argsort(2M)", jax.jit(keys_sort), pp, pv)

    def with_rows(pp, pv, pw, pa):
        pkey_s, order, origin = keys_sort(pp, pv)
        p_pad = -P % CHUNK
        pad1 = lambda x: jnp.pad(x, (0, p_pad))
        grows = [pp[order][:, k] for k in range(3)]
        grows += [pw[order][:, k] for k in range(3)]
        grows += [pv[order].astype(jnp.float32)]
        gdata = jnp.stack([pad1(rw) for rw in grows], axis=0)
        gdata = jnp.pad(gdata, ((0, pgp._GROWS - gdata.shape[0]), (0, 0)))
        n_chunks = gdata.shape[1] // CHUNK
        gdata = gdata.reshape(pgp._GROWS, n_chunks, CHUNK).transpose(1, 0, 2)
        adata = jnp.stack([pad1(pa[order][:, k]) for k in range(3)], axis=0)
        adata = jnp.pad(adata, ((0, pgp._AROWS - adata.shape[0]), (0, 0)))
        adata = adata.reshape(pgp._AROWS, n_chunks, CHUNK).transpose(1, 0, 2)
        return gdata, adata, pkey_s, origin

    bench("2. + sorted row gathers (gdata/adata)", jax.jit(with_rows),
          pp, pv, pw, pa)

    def with_spans(pp, pv, pw, pa, qp_, r2_):
        gdata, adata, pkey_s, origin = with_rows(pp, pv, pw, pa)
        n_chunks = gdata.shape[0]
        live = r2_ > 0.0
        qcell = jnp.clip(
            jnp.floor(qp_ / cell).astype(jnp.int32) - origin, 0, 1023)
        qkey = pg.morton3(qcell)
        qorder = jnp.argsort(jnp.where(live, qkey, jnp.uint32(0xFFFFFFFF)))
        n_pad = -N % TILE_Q
        n_tiles = (N + n_pad) // TILE_Q
        big = jnp.int32(2 ** 30)
        pack = lambda z, y, x: (z << 20) | (y << 10) | x
        qc_t = jnp.pad(qcell[qorder], ((0, n_pad), (0, 0))).reshape(
            n_tiles, TILE_Q, 3)
        live_t = jnp.pad(live[qorder], (0, n_pad)).reshape(n_tiles, TILE_Q)
        r2_t = jnp.max(jnp.pad(r2_[qorder], (0, n_pad)).reshape(
            n_tiles, TILE_Q), axis=1)
        reach_t = jnp.ceil(jnp.sqrt(jnp.maximum(r2_t, 0.0)) / cell
                           ).astype(jnp.int32)[:, None]
        blo = jnp.clip(jnp.min(jnp.where(live_t[..., None], qc_t, big),
                               axis=1) - reach_t, 0, 1023)
        bhi = jnp.clip(jnp.max(jnp.where(live_t[..., None], qc_t, -big),
                               axis=1) + reach_t, 0, 1023)
        any_live = jnp.any(live_t, axis=1)
        nz = bhi[:, 2] - blo[:, 2] + 1
        ny = bhi[:, 1] - blo[:, 1] + 1
        n_rows = nz * ny
        r_ids = jnp.arange(R_MAX, dtype=jnp.int32)[None, :]
        fits_zy = (n_rows <= R_MAX)[:, None]
        fits_z = ~fits_zy & (nz <= R_MAX)[:, None]
        zr = blo[:, 2:3] + r_ids // ny[:, None]
        yr = blo[:, 1:2] + r_ids % ny[:, None]
        klo_fit = pack(zr, yr, blo[:, 0:1])
        khi_fit = pack(zr, yr, bhi[:, 0:1]) + 1
        zs = blo[:, 2:3] + r_ids
        klo_slab = pack(zs, blo[:, 1:2], blo[:, 0:1])
        khi_slab = pack(zs, bhi[:, 1:2], bhi[:, 0:1]) + 1
        klo_fb = pack(blo[:, 2:3], blo[:, 1:2], blo[:, 0:1])
        khi_fb = pack(bhi[:, 2:3], bhi[:, 1:2], bhi[:, 0:1]) + 1
        klo = jnp.where(fits_zy, klo_fit,
                        jnp.where(fits_z, klo_slab,
                                  jnp.where(r_ids == 0, klo_fb, 0)))
        khi = jnp.where(fits_zy, khi_fit,
                        jnp.where(fits_z, khi_slab,
                                  jnp.where(r_ids == 0, khi_fb, 0)))
        valid_row = any_live[:, None] & jnp.where(
            fits_zy, r_ids < n_rows[:, None],
            jnp.where(fits_z, r_ids < nz[:, None], r_ids == 0))
        lo_e = jnp.searchsorted(pkey_s, klo.ravel()).reshape(n_tiles, R_MAX)
        hi_e = jnp.searchsorted(pkey_s, khi.ravel()).reshape(n_tiles, R_MAX)
        has = valid_row & (lo_e < hi_e)
        c_lo = jnp.where(has, lo_e // CHUNK, 0)
        c_hi = jnp.where(has, -(-hi_e // CHUNK), 0)
        return gdata, adata, c_lo, c_hi, n_chunks, n_tiles

    bench("3. + query sort/boxes/searchsorted", jax.jit(with_spans),
          pp, pv, pw, pa, qpj, r2j)

    def with_jobs(pp, pv, pw, pa, qp_, r2_):
        gdata, adata, c_lo, c_hi, n_chunks, n_tiles = with_spans(
            pp, pv, pw, pa, qp_, r2_)
        iota_c = jnp.arange(n_chunks, dtype=jnp.int32)[None, :]
        cov = jnp.zeros((n_tiles, n_chunks), bool)
        for r_ in range(R_MAX):
            cov = cov | ((iota_c >= c_lo[:, r_:r_ + 1])
                         & (iota_c < c_hi[:, r_:r_ + 1]))
        cov = cov.at[:, 0].set(True)
        flat = cov.reshape(-1)
        n_jobs = jnp.sum(flat.astype(jnp.int32))
        capacity = (1 << 17) * 8
        (job_idx,) = jnp.nonzero(flat, size=capacity,
                                 fill_value=n_tiles * n_chunks)
        return n_jobs, job_idx[:8], gdata[0, 0, 0], adata[0, 0, 0]

    (nj, *_), _ = bench("4. + cov rasterize + nonzero", jax.jit(with_jobs),
                        pp, pv, pw, pa, qpj, r2j)
    print("    n_jobs =", int(nj), "of capacity", (1 << 17) * 8)

    bench("5. FULL rowspan call", lambda: pgp.gather_radius_pallas_rowspan(
        pp, pa, pw, pv, cell, qpj, r2j, nsj, jnp.abs(nsj),
        job_budget=1 << 17, rounds=8))


if __name__ == "__main__":
    main()
