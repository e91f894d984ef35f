"""Stage-level timing of the epoch intersector on TPU.

Run: python tools/profile_epoch.py [n_tris_log2] [n_rays_log2]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.ops import epoch_intersect as ei
from raytrace_tpu.scene import presets
from tools.exp_subtile import bounce_rays

NT = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
NR = 1 << int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20


def _fetch(out):
    # the axon tunnel executes lazily: block_until_ready does NOT force
    # execution — only a host fetch does. Every timed iteration fetches a
    # few elements (≈25 ms tunnel roundtrip floor).
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:2] if leaf.ndim else leaf)


def t(fn, name, *args, iters=3):
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:8.1f} ms")
    return out


def main():
    scene, _ = presets.triangle_field(n_triangles=NT)
    cs = scene.clusters
    print(f"{NT} tris, {cs.tv.shape[0]} clusters x {cs.tv.shape[2]}")
    o, d = bounce_rays(scene, NR, jax.random.PRNGKey(3))
    o = jnp.asarray(o); d = jnp.asarray(d)
    tmin = jnp.full((NR,), 1e-3, jnp.float32)
    tmax = jnp.full((NR,), ei.BIG, jnp.float32)

    full = t(jax.jit(lambda o, d: ei.intersect_epochs(cs, o, d, tmin, tmax)),
             "full intersect_epochs     ", o, d)
    print("  subpairs", int(full[2]), "ovf", int(full[3]))

    # stage timings (one epoch worth, full window = worst epoch bound)
    n = NR
    n_pad = -n % (ei.TILE * ei.TILE_GROUP)
    np_ = n + n_pad
    o_p = jnp.pad(o, ((0, n_pad), (0, 0)))
    d_p = jnp.pad(d, ((0, n_pad), (0, 0)))
    tmin_p = jnp.pad(tmin, (0, n_pad))
    n_tiles = np_ // ei.TILE
    n_subtiles = np_ // ei.SUB
    oT, dT = o_p.T, d_p.T
    tb = jnp.full((np_,), ei.BIG, jnp.float32)
    w0P = jnp.full((1, np_), -ei.BIG, jnp.float32)
    w1P = jnp.full((1, np_), ei.BIG, jnp.float32)

    cull = t(jax.jit(lambda oT, dT: ei._cull_bits(
        cs, oT, dT, tmin_p[None], tb[None], w0P, w1P, n_tiles, False)),
        "cull (full window)        ", oT, dT)

    cp = cs.tv.shape[0]
    PB, SPB = ei._budgets(n, n_tiles, cp, 1.0, ei.ROUND)
    SPB_AL = SPB + -(-(ei.JPS * cp) // ei.ROUND) * ei.ROUND
    rounds = SPB_AL // ei.ROUND
    print(f"  PB {PB} SPB {SPB} SPB_AL {SPB_AL} rounds {rounds}")

    JPS = ei.JPS

    @jax.jit
    def compact(bits):
        flatT = bits.T.reshape(-1)
        nzmask = flatT != 0
        n_pairs = jnp.sum(nzmask.astype(jnp.int32))
        (pair_idx,) = jnp.nonzero(nzmask, size=PB, fill_value=n_tiles * cp)
        pair_safe = jnp.minimum(pair_idx, n_tiles * cp - 1)
        pvalid = jnp.arange(PB) < jnp.minimum(n_pairs, PB)
        pbits = jnp.where(pvalid, flatT[pair_safe], 0)
        submask = ((pbits[:, None] >> jnp.arange(ei.NSUB)[None, :]) & 1) > 0
        n_sp_all = jnp.sum(submask.astype(jnp.int32))
        (sp_idx,) = jnp.nonzero(submask.reshape(-1), size=SPB,
                                fill_value=PB * ei.NSUB)
        n_sp = jnp.minimum(n_sp_all, SPB)
        spvalid = jnp.arange(SPB) < n_sp
        prow = jnp.minimum(sp_idx // ei.NSUB, PB - 1)
        sub = (sp_idx % ei.NSUB).astype(jnp.int32)
        clus = (pair_safe[prow] // n_tiles).astype(jnp.int32)
        tile = (pair_safe[prow] % n_tiles).astype(jnp.int32)
        packed = clus * n_subtiles + tile * ei.NSUB + sub
        fill_pid = cp * n_subtiles - 1
        packed = jnp.where(spvalid, packed, fill_pid).astype(jnp.int32)
        cl_sp = packed // n_subtiles
        cl_ids = jnp.arange(cp, dtype=jnp.int32)
        starts = jnp.searchsorted(cl_sp, cl_ids, side="left")
        ends = jnp.searchsorted(cl_sp, cl_ids, side="right")
        lens = (ends - starts).astype(jnp.int32)
        al = ((lens + JPS - 1) // JPS) * JPS
        new_starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(al).astype(jnp.int32)])
        total_al = new_starts[-1]
        j = jnp.arange(SPB_AL, dtype=jnp.int32)
        c_of_j = jnp.clip(
            jnp.searchsorted(new_starts[1:], j, side="right"), 0, cp - 1
        ).astype(jnp.int32)
        k_off = j - new_starts[c_of_j]
        in_run = (k_off < lens[c_of_j]) & (j < total_al)
        src = jnp.clip(starts[c_of_j] + k_off, 0, SPB - 1)
        pid_al = jnp.where(
            in_run, packed[src],
            jnp.where(j < total_al,
                      c_of_j * n_subtiles + (n_subtiles - 1), fill_pid)
        ).astype(jnp.int32)
        return pid_al, total_al

    pid_al, n_sp = t(compact, "compact + align           ", cull)
    print("  n_sp_al", int(n_sp))

    rayT = jnp.stack(
        [o_p[:, 0], o_p[:, 1], o_p[:, 2],
         d_p[:, 0], d_p[:, 1], d_p[:, 2],
         tmin_p, tb], axis=0
    ).reshape(8, n_subtiles, ei.SUB).transpose(1, 0, 2)

    mt = t(jax.jit(lambda pid, nsp, rf: ei._mt_rounds(
        pid, nsp, rf, cs.tv, n_subtiles, rounds, ei.ROUND, False)),
        "mt_rounds (incl segment)  ", pid_al, n_sp, rayT)


if __name__ == "__main__":
    main()
