"""Cluster-binned wavefront intersector — the TPU-native acceleration
structure for large triangle scenes.

WHY NOT BVH TRAVERSAL ON TPU: the reference's hot loop is per-ray BVH
traversal inside OptiX rtTrace (cudarender.cpp:44-50) — a pointer chase.
Measured on this stack, per-ray dynamic gathers from a ~megabyte node table
are pathological for both XLA-TPU compile time (minutes for a gather loop)
and run time (~ms per wavefront step); a 1M-triangle frame took 18-39 s.
So the acceleration structure is restructured into three dense, gather-free
stages that map onto the VPU and Pallas block pipelining:

  A. CULL  (Pallas, dense): every ray tile [TR] against every cluster AABB
     [C] — slab tests only, one [TR, C] block per tile, emits a per-tile
     cluster hit mask. Clusters = contiguous runs of CLUSTER_SIZE triangles
     in BVH-leaf (spatially coherent) order, so their AABBs are tight.
  B. COMPACT (jnp): flatten the [tiles, C] mask to a (tile, cluster) pair
     list sorted by tile (row-major nonzero), padded to a static budget.
  C. INTERSECT (Pallas, block-sparse): grid over pairs; scalar-prefetched
     pair ids drive the BlockSpec index maps — the ray tile block revisits
     (pairs are tile-sorted, so Pallas keeps it resident) and each pair's
     [9, CLUSTER_SIZE] triangle slab streams through VMEM double-buffered.
     Möller–Trumbore on [TR, CLUSTER_SIZE], running best folded in VMEM.

Correctness: stage A is conservative (slab test over the ray's [tmin, tmax]
segment with no best-t shrinking), stage C is exact; the only budget is the
global pair count (overflow is COUNTED and returned — callers size
`pair_budget` and can assert; same observability contract as the photon
grid's occupancy counter). Gradients follow the framework contract: this
module returns the primal winner under stop_gradient; callers re-intersect
the winner (ops/bvh.reintersect_winner).
"""
from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30
CLUSTER_SIZE = 256
TILE_RAYS = 128


@flax.struct.dataclass
class ClusterSet:
    """Triangles grouped into fixed-size spatially-coherent clusters.

    tv: [C, 9, CLUSTER_SIZE] — v0/v1/v2 xyz as 9 rows per cluster (lane dim
        = triangle), padded with degenerate triangles (det=0, never hit).
    cmin/cmax: [C, 3] cluster AABBs (padding clusters get +inf/-inf boxes).
    n_tris: true (unpadded) triangle count.
    """
    tv: Array
    cmin: Array
    cmax: Array
    n_tris: int = flax.struct.field(pytree_node=False, default=0)

    @property
    def n_clusters(self) -> int:
        return self.tv.shape[0]


def build_clusters(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                   cluster_size: int = CLUSTER_SIZE) -> ClusterSet:
    """Group triangles (already in spatially-coherent BVH-leaf order) into
    contiguous clusters of `cluster_size` and compute their AABBs."""
    t = v0.shape[0]
    pad = -t % cluster_size
    z = lambda a: np.concatenate(
        [a.astype(np.float32), np.zeros((pad, 3), np.float32)]) if pad else (
        a.astype(np.float32))
    v0p, v1p, v2p = z(v0), z(v1), z(v2)
    tp = t + pad
    c = tp // cluster_size
    tv = np.concatenate([v0p, v1p, v2p], axis=1)  # [Tp, 9]
    tv = tv.reshape(c, cluster_size, 9).transpose(0, 2, 1)  # [C, 9, S]

    valid = np.zeros(tp, bool)
    valid[:t] = True
    bmin = np.minimum(np.minimum(v0p, v1p), v2p)
    bmax = np.maximum(np.maximum(v0p, v1p), v2p)
    bmin = np.where(valid[:, None], bmin, np.float32(np.inf))
    bmax = np.where(valid[:, None], bmax, np.float32(-np.inf))
    cmin = bmin.reshape(c, cluster_size, 3).min(axis=1)
    cmax = bmax.reshape(c, cluster_size, 3).max(axis=1)
    # pad cluster count to a lane multiple for the cull kernel
    cpad = -c % 128
    if cpad:
        tvp = np.zeros((cpad,) + tv.shape[1:], np.float32)
        tv = np.concatenate([tv, tvp])
        cmin = np.concatenate(
            [cmin, np.full((cpad, 3), np.inf, np.float32)])
        cmax = np.concatenate(
            [cmax, np.full((cpad, 3), -np.inf, np.float32)])
    return ClusterSet(
        tv=jnp.asarray(tv), cmin=jnp.asarray(cmin.astype(np.float32)),
        cmax=jnp.asarray(cmax.astype(np.float32)), n_tris=int(t),
    )


# ---------------------------------------------------------------------------
# Stage A: dense ray-tile × cluster-AABB culling
# ---------------------------------------------------------------------------

# tiles are culled in groups of 8 so the output block is (8, chunk) — TPU
# block shapes need the sublane dim divisible by 8
TILE_GROUP = 8


def _cull_kernel(o_ref, d_ref, tmin_ref, tmax_ref, cmin_ref, cmax_ref,
                 out_ref, *, tile_rays: int):
    r = lambda a: a[:, None]
    c = lambda a: a[None, :]
    for g in range(TILE_GROUP):
        s = slice(g * tile_rays, (g + 1) * tile_rays)
        ox, oy, oz = o_ref[0, s], o_ref[1, s], o_ref[2, s]
        inv = lambda a: 1.0 / jnp.where(a == 0.0, 1e-30, a)
        ix, iy, iz = inv(d_ref[0, s]), inv(d_ref[1, s]), inv(d_ref[2, s])
        tmin = tmin_ref[0, s]
        tmax = tmax_ref[0, s]

        def axis_slab(bmin, bmax, o, invd):
            t0 = (c(bmin) - r(o)) * r(invd)
            t1 = (c(bmax) - r(o)) * r(invd)
            return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

        n0, f0 = axis_slab(cmin_ref[0, :], cmax_ref[0, :], ox, ix)
        n1, f1 = axis_slab(cmin_ref[1, :], cmax_ref[1, :], oy, iy)
        n2, f2 = axis_slab(cmin_ref[2, :], cmax_ref[2, :], oz, iz)
        tnear = jnp.maximum(jnp.maximum(n0, n1), n2)
        tfar = jnp.minimum(jnp.minimum(f0, f1), f2)
        hit = (tnear <= tfar) & (tfar > r(tmin)) & (tnear < r(tmax))
        out_ref[g, :] = jnp.max(hit.astype(jnp.float32), axis=0)


CULL_CHUNK = 2048  # clusters per cull block: [TILE_RAYS, CULL_CHUNK] VMEM


def _cull(clusters: ClusterSet, oT, dT, tminP, tmaxP, n_tiles, interpret,
          tile_rays: int = TILE_RAYS):
    cp = clusters.cmin.shape[0]
    chunk = min(CULL_CHUNK, cp)
    assert cp % chunk == 0 or cp < CULL_CHUNK, (cp, chunk)
    cpad = -cp % chunk
    cminT = jnp.pad(clusters.cmin.T, ((0, 0), (0, cpad)),
                    constant_values=jnp.float32(BIG))
    cmaxT = jnp.pad(clusters.cmax.T, ((0, 0), (0, cpad)),
                    constant_values=jnp.float32(-BIG))
    cpp = cp + cpad
    gr = TILE_GROUP * tile_rays
    assert oT.shape[1] % gr == 0, (oT.shape, gr)
    ray3 = pl.BlockSpec((3, gr), lambda i, j: (0, i),
                        memory_space=pltpu.VMEM)
    ray1 = pl.BlockSpec((1, gr), lambda i, j: (0, i),
                        memory_space=pltpu.VMEM)
    cl3 = pl.BlockSpec((3, chunk), lambda i, j: (0, j),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((TILE_GROUP, chunk), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM)
    hit = pl.pallas_call(
        functools.partial(_cull_kernel, tile_rays=tile_rays),
        grid=(n_tiles // TILE_GROUP, cpp // chunk),
        in_specs=[ray3, ray3, ray1, ray1, cl3, cl3],
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((n_tiles, cpp), jnp.float32),
        interpret=interpret,
    )(oT, dT, tminP, tmaxP, cminT, cmaxT)
    return hit[:, :cp]


# ---------------------------------------------------------------------------
# Stage C: block-sparse pair intersection
# ---------------------------------------------------------------------------

def _pair_kernel(pid_ref, np_ref, o_ref, d_ref, tmin_ref, tmax_ref,
                 tv_ref, t_ref, idx_ref, *, cluster_size: int, cp: int):
    # pair ids arrive PACKED (pid = tile·cp + cluster) so only ONE
    # s32[budget] scalar-prefetch array occupies SMEM — two unpacked arrays
    # at budget 2^17 (512 KB each) overflow the v5e's ~1 MB SMEM
    p = pl.program_id(0)
    tile = pid_ref[p] // cp
    new_tile = jnp.logical_or(
        p == 0, tile != pid_ref[jnp.maximum(p - 1, 0)] // cp
    )

    @pl.when(new_tile)
    def _():
        t_ref[0, :] = jnp.full_like(t_ref[0, :], BIG)
        idx_ref[0, :] = jnp.zeros_like(idx_ref[0, :])

    @pl.when(p < np_ref[0])
    def _():
        ox, oy, oz = o_ref[0, :], o_ref[1, :], o_ref[2, :]
        dx, dy, dz = d_ref[0, :], d_ref[1, :], d_ref[2, :]
        tmin = tmin_ref[0, :]
        tmax = jnp.minimum(tmax_ref[0, :], t_ref[0, :])

        v0x, v0y, v0z = tv_ref[0, 0, :], tv_ref[0, 1, :], tv_ref[0, 2, :]
        v1x, v1y, v1z = tv_ref[0, 3, :], tv_ref[0, 4, :], tv_ref[0, 5, :]
        v2x, v2y, v2z = tv_ref[0, 6, :], tv_ref[0, 7, :], tv_ref[0, 8, :]
        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z

        r = lambda a: a[:, None]
        c = lambda a: a[None, :]
        # pvec = d × e2
        px = r(dy) * c(e2z) - r(dz) * c(e2y)
        py = r(dz) * c(e2x) - r(dx) * c(e2z)
        pz = r(dx) * c(e2y) - r(dy) * c(e2x)
        det = c(e1x) * px + c(e1y) * py + c(e1z) * pz
        inv_det = jnp.where(det != 0.0,
                            1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
        tvx, tvy, tvz = r(ox) - c(v0x), r(oy) - c(v0y), r(oz) - c(v0z)
        beta = (tvx * px + tvy * py + tvz * pz) * inv_det
        qx = tvy * c(e1z) - tvz * c(e1y)
        qy = tvz * c(e1x) - tvx * c(e1z)
        qz = tvx * c(e1y) - tvy * c(e1x)
        gamma = (r(dx) * qx + r(dy) * qy + r(dz) * qz) * inv_det
        t = (c(e2x) * qx + c(e2y) * qy + c(e2z) * qz) * inv_det
        ok = (
            (det != 0.0)
            & (beta >= 0.0)
            & (gamma >= 0.0)
            & (beta + gamma <= 1.0)
            & (t > r(tmin))
            & (t < r(tmax))
        )
        t = jnp.where(ok, t, BIG)

        tbest = jnp.min(t, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        jbest = jnp.min(jnp.where(t <= tbest[:, None], lane, cluster_size),
                        axis=1)
        prev = t_ref[0, :]
        better = tbest < prev
        base = (pid_ref[p] % cp) * cluster_size
        t_ref[0, :] = jnp.where(better, tbest, prev)
        idx_ref[0, :] = jnp.where(better, base + jbest, idx_ref[0, :])


@functools.partial(
    jax.jit,
    static_argnames=("pair_budget", "interpret", "sort_rays", "rounds",
                     "tile_rays"))
def intersect_clusters(
    clusters: ClusterSet,
    o: Array, d: Array, tmin: Array, tmax: Array,
    pair_budget: int = 1 << 17,
    interpret: bool = False,
    sort_rays: bool = True,
    rounds: int = 1,
    tile_rays: int | None = None,
):
    """Closest hit through the cluster structure → (t [N], idx [N],
    n_pairs [], overflow [] int32). idx is the GLOBAL triangle index
    (cluster-padded order == builder order since clusters are contiguous).
    Differentiability: primal only; callers re-intersect the winner.

    sort_rays: order rays by (origin-cell Morton, direction octant) before
    tiling. Camera rays arrive coherent, but photon BOUNCE rays are random
    — an unsorted 256-ray tile then culls against most of the scene and
    the pair list explodes (measured 2× fewer pairs with sorting on 1M
    incoherent rays). Sorting is a pure permutation (per-ray results are
    identical); the cost is one argsort + gathers.

    rounds: pair-list capacity = pair_budget·rounds. One round's id list is
    SMEM-bound (scalar prefetch, ~2^17 s32); rounds run consecutive
    tile-major slices and min-combine. Under CAPACITY overflow the
    truncated tail tiles return a DEFINED miss (t = BIG, idx 0) instead of
    uninitialized memory, and the overflow count reports the deficit."""
    sg = jax.lax.stop_gradient
    o = sg(o); d = sg(d); tmin = sg(tmin); tmax = sg(tmax)
    n = o.shape[0]

    # tile granularity: fine tiles waste less stage-C work (every ray in
    # a tile pays for every cluster any member culls into), but the
    # stage-B [tiles, clusters] mask is O(rays·clusters/tile_rays) — at
    # multi-million-ray launches the coarser tile wins (PERF.md §3)
    if tile_rays is None:
        tile_rays = 256 if n >= (1 << 21) else TILE_RAYS

    if sort_rays and n > tile_rays:
        from raytrace_tpu.ops import photon_grid as pg

        smin = jnp.min(clusters.cmin, axis=0)  # padding rows are +inf
        smax = jnp.max(clusters.cmax, axis=0)
        ext = jnp.maximum(smax - smin, 1e-6) / 64.0
        ocell = jnp.clip(
            jnp.floor((o - smin[None, :]) / ext[None, :]).astype(jnp.int32),
            0, 63,
        )
        octant = (
            (d[:, 0] > 0).astype(jnp.uint32) * 4
            + (d[:, 1] > 0).astype(jnp.uint32) * 2
            + (d[:, 2] > 0).astype(jnp.uint32)
        )
        key = (pg.morton3(ocell) << 3) | octant
        # dead rays (empty [tmin, tmax] window — padding lanes upstream)
        # sort to the back so live tiles stay dense
        key = jnp.where(tmax > tmin, key, jnp.uint32(0xFFFFFFFF))
        order = jnp.argsort(key)
        unsort = jnp.argsort(order)
        t_s, idx_s, n_pairs, overflow = intersect_clusters(
            clusters, o[order], d[order], tmin[order], tmax[order],
            pair_budget=pair_budget, interpret=interpret, sort_rays=False,
            rounds=rounds, tile_rays=tile_rays,
        )
        return t_s[unsort], idx_s[unsort], n_pairs, overflow
    n_pad = -n % (tile_rays * TILE_GROUP)  # cull groups 8 tiles per step
    pad_r = lambda x: jnp.pad(x.T, ((0, 0), (0, n_pad)))
    oT, dT = pad_r(o), pad_r(d)
    tminP = jnp.pad(tmin, (0, n_pad))[None, :]
    # padded rays: tmax 0 → cull + intersect never match
    tmaxP = jnp.pad(tmax, (0, n_pad))[None, :]
    np_ = n + n_pad
    n_tiles = np_ // tile_rays
    cp = clusters.cmin.shape[0]

    hit = _cull(clusters, oT, dT, tminP, tmaxP, n_tiles, interpret,
                tile_rays=tile_rays)
    # every tile gets a seed pair (tile, cluster 0): guarantees the tile's
    # output block is visited (and initialized to "miss") even when the
    # cull found nothing, and pins the fill-pair tile (n_tiles-1) to a tile
    # that already appeared, so fill entries never re-trigger an init
    hit = hit.at[:, 0].set(1.0)

    # ---- stage B: compact to a tile-sorted PACKED pair list ---------------
    # pid = tile·cp + cluster in one s32 array (SMEM budget: see kernel)
    flat = hit.reshape(-1) > 0.0
    n_pairs = jnp.sum(flat.astype(jnp.int32))
    capacity = pair_budget * rounds
    (pair_idx,) = jnp.nonzero(flat, size=capacity,
                              fill_value=n_tiles * cp)
    pid_full = jnp.minimum(pair_idx, n_tiles * cp - 1).astype(jnp.int32)
    n_valid_total = jnp.minimum(n_pairs, capacity)
    overflow = jnp.maximum(n_pairs - capacity, 0)
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)

    ray3 = pl.BlockSpec((3, tile_rays),
                        lambda p, pid_, npr: (0, pid_[p] // cp),
                        memory_space=pltpu.VMEM)
    ray1 = pl.BlockSpec((1, tile_rays),
                        lambda p, pid_, npr: (0, pid_[p] // cp),
                        memory_space=pltpu.VMEM)
    cluster_size = clusters.tv.shape[2]  # per-scene (builder heuristic)
    tvspec = pl.BlockSpec((1, 9, cluster_size),
                          lambda p, pid_, npr: (pid_[p] % cp, 0, 0),
                          memory_space=pltpu.VMEM)
    out1 = pl.BlockSpec((1, tile_rays),
                        lambda p, pid_, npr: (0, pid_[p] // cp),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(pair_budget,),
        in_specs=[ray3, ray3, ray1, ray1, tvspec],
        out_specs=(out1, pl.BlockSpec(
            (1, tile_rays), lambda p, pid_, npr: (0, pid_[p] // cp),
            memory_space=pltpu.VMEM)),
    )
    kern = functools.partial(_pair_kernel, cluster_size=cluster_size, cp=cp)

    # ---- multi-round min-combine (see docstring) --------------------------
    t_best = jnp.full((np_,), BIG, jnp.float32)
    i_best = jnp.zeros((np_,), jnp.int32)
    for rr in range(rounds):
        pid_r = pid_full[rr * pair_budget:(rr + 1) * pair_budget]
        nvr = jnp.clip(n_valid_total - rr * pair_budget, 0, pair_budget)

        def run_round(pid_r=pid_r, nvr=nvr):
            t_out, i_out = pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=(
                    jax.ShapeDtypeStruct((1, np_), jnp.float32),
                    jax.ShapeDtypeStruct((1, np_), jnp.int32),
                ),
                interpret=interpret,
            )(pid_r, jnp.asarray([nvr], jnp.int32).reshape(1),
              oT, dT, tminP, tmaxP, clusters.tv)
            # only tiles in this round's [first, last] range were visited;
            # anything else in the output is uninitialized → defined miss
            first_t = pid_r[0] // cp
            last_t = pid_r[jnp.maximum(nvr, 1) - 1] // cp
            ok = jnp.repeat((tile_ids >= first_t) & (tile_ids <= last_t),
                            tile_rays)
            return (jnp.where(ok, t_out[0], BIG),
                    jnp.where(ok, i_out[0], 0))

        if rounds == 1:
            t_r, i_r = run_round()
        else:
            t_r, i_r = jax.lax.cond(
                nvr > 0, run_round,
                lambda: (jnp.full((np_,), BIG, jnp.float32),
                         jnp.zeros((np_,), jnp.int32)),
            )
        better = t_r < t_best
        t_best = jnp.where(better, t_r, t_best)
        i_best = jnp.where(better, i_r, i_best)

    t = t_best[:n]
    idx = jnp.clip(i_best[:n], 0, clusters.n_tris - 1)
    return t, idx, n_pairs, overflow
