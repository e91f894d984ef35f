"""Epoch-subtile cluster intersector — exact traversal for INCOHERENT rays.

The round-3 cluster intersector (ops/cluster_intersect.py) is exact only
within a (tile, cluster) pair budget: a 256-ray tile of incoherent
photon-bounce rays culls into the union of all members' clusters (~32×
per-ray waste, PERF.md §6), and at BASELINE config[4] the full-width bounce
wave wants ~18M pairs ≈ 73 TFLOP of pair tests — unpayable. This engine
restores the two properties of the reference's per-ray OptiX Sbvh traversal
(/root/reference/cuda_render/cudarender.cpp:44-50) that the tile design
lost, while keeping everything dense and gather-free for the TPU:

  1. EARLY TERMINATION → epoch-segmented culling. Rays advance through
     geometrically growing t-windows anchored at their scene-entry
     distance ([−∞, te+L0), [te+L0, ∞) at the default n_epochs=2;
     L0 ≈ 2 cluster extents). A cluster is assigned to the single epoch
     containing its entry distance; a ray whose epoch-e best hit lands
     inside epoch e's window is resolved and culls nothing afterwards.
     Front-to-back BVH traversal with early exit, in wavefront form:
     89% of config[4] bounce rays hit, most in the first window
     (tools/exp_epochs.py), so the first epoch resolves them and the
     second pays almost nothing. TWO epochs measured best end-to-end
     (1.70 s vs 2.17 s at 1M rays for +3% job count) — each extra epoch
     re-pays the fixed cull+compaction cost for shrinking term gains.
  2. PER-RAY GRANULARITY → 32-ray subtiles. The cull still runs on dense
     [256-ray tile × cluster] blocks (cheap), but emits a PACKED 8-bit
     subtile bitmask per (tile, cluster) — which 32-ray subgroups actually
     cross the cluster — so the intersect stage only pays for 32-ray
     granules (~8× less pair-test waste on incoherent rays, measured
     union(32)/union(256) ≈ 3.3 → compute ÷ 2.4).

The per-subpair intersect kernel is elementwise Möller–Trumbore on the
VPU at [JPS·32 rays × S tris] per grid step (see the JPS note for why an
MXU bilinear-feature formulation measured 4× SLOWER). Jobs stream
cluster-major — the transposed-mask compaction produces that order for
free — so each cluster's vertex slab loads once per run (Pallas revisit
caching), and every job writes its own output row: no cross-job
accumulation in VMEM, so job order is free. Per-subtile winners are then
min-combined by a segment reduction at the jnp level.

Budgets: the (tile, cluster) pair list and the subpair list live in HBM
(not SMEM — only the per-round 2^17-job slice is scalar-prefetched), sized
from the launch geometry (see _budgets). Overflow is COUNTED and returned;
truncated jobs are clean defined misses, same observability contract as the
round-3 engine.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytrace_tpu.ops.cluster_intersect import BIG, ClusterSet

TILE = 256          # cull-tile rays (dense [TILE, C] stage-A blocks)
SUB = 32            # subtile rays (intersect granularity, MXU M dim)
NSUB = TILE // SUB  # subtiles per tile → bits in the packed cull mask
ROUND = 1 << 17     # jobs per scan round (one SMEM scalar-prefetch array)
TILE_GROUP = 8      # cull tiles per kernel step (sublane-divisible output)


# ---------------------------------------------------------------------------
# Stage A: dense cull → packed subtile bitmask
# ---------------------------------------------------------------------------

def _cull_kernel(nlg_ref, o_ref, d_ref, tmin_ref, tbest_ref, w0_ref, w1_ref,
                 cmin_ref, cmax_ref, out_ref):
    # live-prefix gate: rays are sorted dead-last (empty t-window →
    # 0xFFFFFFFF sort key), so tile groups past the live prefix hold ONLY
    # dead rays — skip their slab tests entirely and emit zero masks. A
    # late queue-batch bounce with 10% live lanes then pays ~10% of the
    # dense cull compute (the cull is compute-bound at ~50 flops/element).
    @pl.when(pl.program_id(0) >= nlg_ref[0])
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(pl.program_id(0) < nlg_ref[0])
    def _():
        _cull_kernel_body(o_ref, d_ref, tmin_ref, tbest_ref, w0_ref,
                          w1_ref, cmin_ref, cmax_ref, out_ref)


def _cull_kernel_body(o_ref, d_ref, tmin_ref, tbest_ref, w0_ref, w1_ref,
                      cmin_ref, cmax_ref, out_ref):
    r = lambda a: a[:, None]
    c = lambda a: a[None, :]
    for g in range(TILE_GROUP):
        s = slice(g * TILE, (g + 1) * TILE)
        ox, oy, oz = o_ref[0, s], o_ref[1, s], o_ref[2, s]
        inv = lambda a: 1.0 / jnp.where(a == 0.0, 1e-30, a)
        ix, iy, iz = inv(d_ref[0, s]), inv(d_ref[1, s]), inv(d_ref[2, s])
        tmin = tmin_ref[0, s]
        tbest = tbest_ref[0, s]
        w0 = w0_ref[0, s]
        w1 = w1_ref[0, s]

        def axis_slab(bmin, bmax, o, invd):
            t0 = (c(bmin) - r(o)) * r(invd)
            t1 = (c(bmax) - r(o)) * r(invd)
            return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

        n0, f0 = axis_slab(cmin_ref[0, :], cmax_ref[0, :], ox, ix)
        n1, f1 = axis_slab(cmin_ref[1, :], cmax_ref[1, :], oy, iy)
        n2, f2 = axis_slab(cmin_ref[2, :], cmax_ref[2, :], oz, iz)
        tn = jnp.maximum(jnp.maximum(n0, n1), n2)
        tf = jnp.minimum(jnp.minimum(f0, f1), f2)
        # entry distance clamped to the ray start assigns each cluster to
        # exactly ONE epoch window [w0, w1) — no straddler double-testing
        tnc = jnp.maximum(tn, r(tmin))
        hit = (
            (tn <= tf)
            & (tf > r(tmin))
            & (tnc >= r(w0))
            & (tnc < r(w1))
            & (tnc < r(tbest))  # resolved / capped rays cull nothing
        )
        hitf = hit.astype(jnp.float32)
        bits = jnp.max(hitf[0:SUB, :], axis=0)
        for k in range(1, NSUB):
            bits = bits + jnp.max(
                hitf[k * SUB:(k + 1) * SUB, :], axis=0) * float(1 << k)
        out_ref[g, :] = bits.astype(jnp.int32)


CULL_CHUNK = 2048


def _cull_bits(clusters, oT, dT, tminP, tbestP, w0P, w1P, n_tiles,
               interpret, n_live_groups=None):
    cp = clusters.cmin.shape[0]
    chunk = min(CULL_CHUNK, cp)
    cpad = -cp % chunk
    cminT = jnp.pad(clusters.cmin.T, ((0, 0), (0, cpad)),
                    constant_values=jnp.float32(BIG))
    cmaxT = jnp.pad(clusters.cmax.T, ((0, 0), (0, cpad)),
                    constant_values=jnp.float32(-BIG))
    cpp = cp + cpad
    gr = TILE_GROUP * TILE
    n_groups = n_tiles // TILE_GROUP
    if n_live_groups is None:
        nlg = jnp.full((1,), n_groups, jnp.int32)
    else:
        nlg = jnp.minimum(n_live_groups, n_groups).reshape(1).astype(
            jnp.int32)
    smem1 = pl.BlockSpec(memory_space=pltpu.SMEM)
    ray3 = pl.BlockSpec((3, gr), lambda i, j: (0, i),
                        memory_space=pltpu.VMEM)
    ray1 = pl.BlockSpec((1, gr), lambda i, j: (0, i),
                        memory_space=pltpu.VMEM)
    cl3 = pl.BlockSpec((3, chunk), lambda i, j: (0, j),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((TILE_GROUP, chunk), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM)
    bits = pl.pallas_call(
        _cull_kernel,
        grid=(n_groups, cpp // chunk),
        in_specs=[smem1, ray3, ray3, ray1, ray1, ray1, ray1, cl3, cl3],
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((n_tiles, cpp), jnp.int32),
        interpret=interpret,
    )(nlg, oT, dT, tminP, tbestP, w0P, w1P, cminT, cmaxT)
    return bits[:, :cp]


# ---------------------------------------------------------------------------
# Stage C: per-subpair MXU Möller–Trumbore
# ---------------------------------------------------------------------------

JPS = 4  # jobs per grid step: amortizes per-step fixed cost 4×. The job
         # list is cluster-run-aligned to JPS so a step's jobs share one
         # cluster (one tv block per step).
# NOTE — an MXU formulation was tried and REVERTED: the four MT quantities
# are bilinear in (ray, triangle) features ([128, 10] @ [10, 4S] per step),
# but a K=10 matmul is MXU-pipeline-overhead-bound (≈10 useful cycles per
# 128×128 output tile) and f32 needs 6 bf16 passes; measured ~0.9 µs/job
# vs ~0.2 µs/job for the elementwise VPU form below (which hits
# ~1.3 TFLOP/s, the same rate as the round-3 kernel).


def _mt_kernel(pid_ref, np_ref, r0, r1, r2, r3, tv_ref, t_ref,
               i_ref, *, cluster_size: int, n_subtiles: int):
    p = pl.program_id(0)  # STEP index (JPS jobs per step)

    @pl.when(p * JPS < np_ref[0])
    def _():
        # [8, JPS·SUB]: rows ox,oy,oz,dx,dy,dz,tmin,tbest; rays on lanes
        rays = jnp.concatenate(
            [r0[0], r1[0], r2[0], r3[0]], axis=1)
        ox, oy, oz = rays[0, :], rays[1, :], rays[2, :]
        dx, dy, dz = rays[3, :], rays[4, :], rays[5, :]
        tmin = rays[6, :]
        tmax = rays[7, :]

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
        jbest = jnp.min(
            jnp.where(t <= tbest[:, None], lane, cluster_size), axis=1
        )
        cl = pid_ref[p * JPS] // n_subtiles  # shared by the step (aligned)
        ibest = cl * cluster_size + jnp.minimum(jbest, cluster_size - 1)
        for k in range(JPS):
            t_ref[0, k, :] = tbest[k * SUB:(k + 1) * SUB]
            i_ref[0, k, :] = ibest[k * SUB:(k + 1) * SUB]

    @pl.when(p * JPS >= np_ref[0])
    def _():
        t_ref[0, :, :] = jnp.full_like(t_ref[0, :, :], BIG)
        i_ref[0, :, :] = jnp.zeros_like(i_ref[0, :, :])


def _mt_rounds(pid_sorted, n_sp, rayT, tv, n_subtiles, rounds,
               round_size, interpret):
    """lax.scan over ROUND-sized job slices → per-subtile (t, idx)
    [n_subtiles, SUB]. pid_sorted is cluster-major so each cluster's
    vertex slab is fetched once per run of jobs (Pallas skips re-copies on
    unchanged block ids)."""
    cp = tv.shape[0]
    cluster_size = tv.shape[2]
    rfspecs = [
        pl.BlockSpec((1, 8, SUB),
                     (lambda k: lambda p, pid_, npr:
                      (pid_[p * JPS + k] % n_subtiles, 0, 0))(k),
                     memory_space=pltpu.VMEM)
        for k in range(JPS)
    ]
    fspec = pl.BlockSpec((1, 9, cluster_size),
                         lambda p, pid_, npr: (pid_[p * JPS] // n_subtiles,
                                               0, 0),
                         memory_space=pltpu.VMEM)
    # rank-3 (steps, JPS, 32) outputs: Pallas wants the last-two block dims
    # ∈ {multiple of (8, 128), equal to array dims}
    outt = pl.BlockSpec((1, JPS, SUB), lambda p, pid_, npr: (p, 0, 0),
                        memory_space=pltpu.VMEM)
    outi = pl.BlockSpec((1, JPS, SUB), lambda p, pid_, npr: (p, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(round_size // JPS,),
        in_specs=rfspecs + [fspec],
        out_specs=(outt, outi),
    )
    kern = functools.partial(_mt_kernel, cluster_size=cluster_size,
                             n_subtiles=n_subtiles)

    nvr = jnp.clip(n_sp - jnp.arange(rounds) * round_size, 0, round_size)
    pid_chunks = pid_sorted.reshape(rounds, round_size)

    def body(carry, xs):
        pid_r, nv = xs

        def run(carry):
            t_r, i_r = pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=(
                    jax.ShapeDtypeStruct((round_size // JPS, JPS, SUB),
                                         jnp.float32),
                    jax.ShapeDtypeStruct((round_size // JPS, JPS, SUB),
                                         jnp.int32),
                ),
                interpret=interpret,
            )(pid_r, nv.reshape(1).astype(jnp.int32), rayT, rayT, rayT,
              rayT, tv)
            # segment-combine this round into the carry immediately: keeps
            # the transient at [ROUND, 32] instead of [SPB, 32] (2 GB at
            # config[4])
            seg = pid_r % n_subtiles
            t_r = t_r.reshape(-1, SUB)
            i_r = i_r.reshape(-1, SUB)
            t_carry, i_carry = carry
            t_min = jax.ops.segment_min(t_r, seg, num_segments=n_subtiles)
            upd = t_min < t_carry
            # winner triangle: rows matching the per-segment min
            win = t_r <= t_min[seg]
            i_cand = jnp.where(win & (t_r < BIG), i_r,
                               jnp.int32(2**31 - 1))
            i_min = jax.ops.segment_min(i_cand, seg,
                                        num_segments=n_subtiles)
            return (jnp.where(upd, t_min, t_carry),
                    jnp.where(upd, i_min, i_carry))

        # empty rounds (the static budget's slack) skip EVERYTHING — the
        # kernel AND the segment combine (500 skipped combines once cost
        # 15 s/frame)
        return jax.lax.cond(nv > 0, run, lambda c: c, carry), None

    init = (jnp.full((n_subtiles, SUB), BIG, jnp.float32),
            jnp.zeros((n_subtiles, SUB), jnp.int32))
    (t_sub, i_sub), _ = jax.lax.scan(body, init, (pid_chunks, nvr))
    return t_sub, i_sub


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------

def _budgets(n_rays: int, n_tiles: int, cp: int, scale: float,
             round_size: int):
    """Per-epoch pair/subpair budgets from launch geometry.

    Physical law: Σ_subtiles union(32) ≤ Σ_rays crossings(ray), and with
    epoch windows the effective per-ray crossing count is small (measured
    ≈ 2.4 at the config[4] bounce population, tools/exp_epochs.py; sparse
    launches see more per subtile but have fewer rays). Budget ≈ 4
    crossings/ray, clamped to [1 round, 2^23]; PB ≈ 2 pairs/ray. Overflow
    is counted, returned, and warned on; budget_scale buys more."""
    p2 = lambda v: 1 << max(0, (int(v) - 1).bit_length())
    clamp = lambda v, lo, hi: max(lo, min(int(v), hi))
    pb = p2(min(n_tiles * cp,
                clamp(n_rays * 4 * scale, 1 << 14, 1 << 22)))
    spb = p2(min(n_tiles * cp * NSUB,
                 clamp(n_rays * 8 * scale, round_size, 1 << 24)))
    return pb, max(spb, round_size)


def _rank_bit(word, r, nbits: int):
    """Elementwise position of the r-th (0-based) set bit of `word`
    (int32/uint32, low nbits). Fully fused VPU code — the run-expansion
    compaction's inner lookup."""
    pos = jnp.zeros_like(r)
    for k in range(nbits):
        below = jax.lax.population_count(
            word & jnp.uint32((1 << k) - 1)).astype(jnp.int32)
        here = ((word >> k) & 1).astype(jnp.int32) > 0
        pos = jnp.where(here & (below == r), k, pos)
    return pos


def _run_expand(offsets, total, width: int):
    """Run-id per output slot from run start `offsets` [R+1]: slot j maps to
    the run r with offsets[r] <= j < offsets[r+1], for j < total. By
    scatter-ones + cumsum (a width-sized searchsorted measured 20× slower
    at 8.5M, see the alignment stage below)."""
    marks = jnp.zeros((width,), jnp.int32).at[offsets[1:-1]].add(
        1, mode="drop")
    return jnp.cumsum(marks)


W_PACK = 32  # mask word width for the two-level pair compaction
# Flat-mask size at which the word-packed pair compaction beats sorting the
# full mask. Measured on TPU v5e (tools/ab_compact.py + stage profile): a
# 16.8M-element mask sorts in ~60 ms — cheaper than the word scheme's
# budget-bound run-expansion+gathers (~200 ms) — but the sort scales
# linearly (134M at BASELINE config[4] ≈ 500 ms/epoch) while the word
# scheme stays budget-bound, so big masks switch over.
WORD_COMPACT_MIN_M = 1 << 25


def _compact_pairs_word(flatT, n_tiles, cp, PB):
    """Word-packed pair compaction: pack the mask's nonzero flags into
    32-bit words (elementwise), sort only the SET-WORD ids (mask/32
    elements), then expand words → pairs by popcount-prefix run-expansion
    + an elementwise r-th-set-bit lookup (_rank_bit). Order (ascending
    flat = cluster-major) is preserved by construction. Returns
    (pair_safe [PB], pbits [PB], pvalid [PB])."""
    MAXI = jnp.int32(2**31 - 1)
    M = cp * n_tiles
    nz = flatT != 0
    pad = -M % W_PACK
    nzp = jnp.pad(nz, (0, pad))
    NW = (M + pad) // W_PACK
    wbits = jnp.sum(
        nzp.reshape(NW, W_PACK).astype(jnp.uint32)
        << jnp.arange(W_PACK, dtype=jnp.uint32)[None, :],
        axis=1,
    )
    WB = min(PB, NW)  # word budget: words_set ≤ pairs_set ≤ PB coverage
    vals_w = jnp.where(wbits != 0, jnp.arange(NW, dtype=jnp.int32), MAXI)
    widx = jax.lax.sort(vals_w)[:WB]
    n_words = jnp.minimum(jnp.sum((wbits != 0).astype(jnp.int32)), WB)
    widx_safe = jnp.minimum(widx, NW - 1)
    wsel = jnp.where(jnp.arange(WB) < n_words, wbits[widx_safe],
                     jnp.uint32(0))

    wcnt = jax.lax.population_count(wsel).astype(jnp.int32)
    woff = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(wcnt).astype(jnp.int32)])
    n_pairs_c = jnp.minimum(woff[-1], PB)
    j = jnp.arange(PB, dtype=jnp.int32)
    w_of_j = jnp.clip(_run_expand(woff, n_pairs_c, PB), 0, WB - 1)
    # ONE fused row gather for the three per-word streams (three separate
    # PB-sized gathers measured ~66 ms EACH on TPU — gathers, not the
    # sort, are what made the naive form lose)
    wrow = jnp.stack(
        [wsel.astype(jnp.int32), woff[:-1], widx_safe], axis=1)  # [WB, 3]
    g = wrow[w_of_j]  # [PB, 3]
    bw = g[:, 0].astype(jnp.uint32)
    r = j - g[:, 1]
    pvalid = (j < n_pairs_c) & (r < jax.lax.population_count(
        bw).astype(jnp.int32))
    pos = _rank_bit(bw, r, W_PACK)
    pair_idx = jnp.where(pvalid, g[:, 2] * W_PACK + pos, MAXI)
    pair_safe = jnp.minimum(pair_idx, M - 1)
    pbits = jnp.where(pvalid, flatT[pair_safe], 0)
    return pair_safe, pbits, pvalid


def _sort_key(clusters, o, d, tmax, tmin):
    """Ray-coherence sort key: origin Morton cell (32³ over the cluster
    bounds) then a FINE direction Morton (16³ over [-1,1]³, 12 bits —
    whose MSBs are the sign octant). Dead rays (empty window) go last.

    The direction bits matter enormously for common-origin launches
    (photon EMISSION from a point light: every origin identical, so the
    old 3-bit octant left each 256-ray tile spanning an eighth of the
    sphere — the tile's cluster union was the whole scene slice. The
    config[4] emission intersect alone measured 8.1 s of the 12.7 s
    trace before this; fine direction sorting makes emission tiles tight
    cones, the same property the round-3 tile engine exploits for camera
    rays)."""
    from raytrace_tpu.ops import photon_grid as pg

    smin = jnp.min(clusters.cmin, axis=0)
    smax = jnp.max(clusters.cmax, axis=0)
    ext = jnp.maximum(smax - smin, 1e-6) / 32.0
    ocell = jnp.clip(
        jnp.floor((o - smin[None, :]) / ext[None, :]).astype(jnp.int32),
        0, 31,
    )
    dcell = jnp.clip(
        jnp.floor((d + 1.0) * 8.0).astype(jnp.int32), 0, 15
    )
    key = (pg.morton3(ocell) << 12) | pg.morton3(dcell)
    return jnp.where(tmax > tmin, key, jnp.uint32(0xFFFFFFFF))


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "n_epochs", "budget_scale",
                     "round_size"))
def intersect_epochs(
    clusters: ClusterSet,
    o: Array, d: Array, tmin: Array, tmax: Array,
    interpret: bool = False,
    n_epochs: int = 2,
    budget_scale: float = 1.0,
    round_size: int = ROUND,
):
    """Closest hit through the cluster structure with epoch-segmented
    early-terminating traversal → (t [N], idx [N], n_subpairs [], overflow
    [] int32). Exact for any scene/ray mix up to the counted budgets.
    Differentiability: primal only (stop_gradient); callers re-intersect
    the winner (ops/bvh.reintersect_winner)."""
    sg = jax.lax.stop_gradient
    o = sg(o); d = sg(d); tmin = sg(tmin); tmax = sg(tmax)
    n = o.shape[0]
    tv = clusters.tv
    cp = tv.shape[0]

    # ---- sort rays for tile coherence (pure permutation) ------------------
    key = _sort_key(clusters, o, d, tmax, tmin)
    order = jnp.argsort(key)
    unsort = jnp.argsort(order)
    o_s, d_s = o[order], d[order]
    tmin_s, tmax_s = tmin[order], tmax[order]

    n_pad = -n % (TILE * TILE_GROUP)
    np_ = n + n_pad
    pad1 = lambda x, v=0.0: jnp.pad(x, (0, n_pad), constant_values=v)
    o_p = jnp.pad(o_s, ((0, n_pad), (0, 0)))
    d_p = jnp.pad(d_s, ((0, n_pad), (0, 0)))
    tmin_p = pad1(tmin_s)
    tmax_p = pad1(tmax_s)  # pad tmax 0 → dead (cull excludes)
    n_tiles = np_ // TILE
    n_subtiles = np_ // SUB

    oT, dT = o_p.T, d_p.T
    tminP = tmin_p[None, :]

    # ---- epoch windows: L0 = 2 × mean cluster extent, ×4 growth,
    # anchored at each ray's SCENE-ENTRY distance (a distant viewpoint
    # would otherwise put all geometry in the last window and disable the
    # early-out entirely) -----------------------------------------------
    real = jnp.isfinite(clusters.cmin[:, 0])
    extm = jnp.where(real[:, None], clusters.cmax - clusters.cmin, 0.0)
    mean_ext = jnp.sum(jnp.max(extm, axis=1)) / jnp.maximum(
        jnp.sum(real.astype(jnp.float32)), 1.0)
    L0 = 2.0 * jnp.maximum(mean_ext, 1e-6)
    uppers = jnp.array(
        [4.0 ** e for e in range(n_epochs - 1)] + [np.inf], jnp.float32)
    bounds = jnp.concatenate(
        [jnp.asarray([0.0], jnp.float32), uppers * L0])
    # per-ray entry distance into the scene AABB (clamped to tmin)
    smin = jnp.min(jnp.where(real[:, None], clusters.cmin, BIG), axis=0)
    smax = jnp.max(jnp.where(real[:, None], clusters.cmax, -BIG), axis=0)
    inv_d = 1.0 / jnp.where(d_p == 0.0, 1e-30, d_p)
    t0 = (smin[None, :] - o_p) * inv_d
    t1 = (smax[None, :] - o_p) * inv_d
    t_enter = jnp.max(jnp.minimum(t0, t1), axis=1)
    t_enter = jnp.maximum(t_enter, tmin_p)

    # live-prefix group count for the cull gate: dead lanes (empty
    # t-window — masked-out queue lanes, padding) sort last, so tile
    # groups past ceil(n_live/2048) are all-dead and the cull skips them
    n_live = jnp.sum((tmax_p > tmin_p).astype(jnp.int32))
    n_live_groups = -(-n_live // (TILE * TILE_GROUP))

    PB, SPB = _budgets(n, n_tiles, cp, budget_scale, round_size)
    # aligned job-list capacity: alignment adds < JPS per cluster run
    SPB_AL = SPB + -(-(JPS * cp) // round_size) * round_size
    rounds = SPB_AL // round_size

    def epoch_body(carry, xs):
        t_best, i_best = carry
        w0, w1, first, last = xs
        # epoch 0 opens at -BIG (rays starting inside geometry); the last
        # closes at +BIG
        w0P = jnp.where(first, -BIG, t_enter + w0)[None, :]
        w1P = jnp.where(last, BIG, t_enter + w1)[None, :]
        tb = jnp.minimum(t_best, tmax_p)
        bits = _cull_bits(clusters, oT, dT, tminP, tb[None, :], w0P, w1P,
                          n_tiles, interpret, n_live_groups=n_live_groups)

        # Pair compaction: compact-by-SORT of the transposed mask for
        # small/medium masks (set entries keep their cluster-major flat
        # index, rest INT_MAX — one ascending sort is both compaction AND
        # job ordering; measured 60 ms at 16.8M on v5e), switching to the
        # word-packed scheme (_compact_pairs_word) once the mask crosses
        # WORD_COMPACT_MIN_M — the full-mask sort scales linearly
        # (~500 ms/epoch at config[4]'s 134M) while the word path stays
        # budget-bound. RAYTRACE_TPU_COMPACT=sort|word forces either.
        import os

        MAXI = jnp.int32(2**31 - 1)
        fill_pid = cp * n_subtiles - 1
        flatT = bits.T.reshape(-1)
        nzmask = flatT != 0
        n_pairs = jnp.sum(nzmask.astype(jnp.int32))
        forced = os.environ.get("RAYTRACE_TPU_COMPACT")
        use_word = (forced == "word" or
                    (forced != "sort"
                     and n_tiles * cp >= WORD_COMPACT_MIN_M))
        if use_word:
            pair_safe, pbits, _ = _compact_pairs_word(
                flatT, n_tiles, cp, PB)
        else:
            vals = jnp.where(
                nzmask, jnp.arange(n_tiles * cp, dtype=jnp.int32), MAXI)
            pair_idx = jax.lax.sort(vals)[:PB]
            pair_safe = jnp.minimum(pair_idx, n_tiles * cp - 1)
            pvalid = jnp.arange(PB) < jnp.minimum(n_pairs, PB)
            pbits = jnp.where(pvalid, flatT[pair_safe], 0)

        # subpair expansion (shared): budget-bound PB·NSUB sort
        clus = (pair_safe // n_tiles).astype(jnp.int32)
        tile = (pair_safe % n_tiles).astype(jnp.int32)
        base = clus * n_subtiles + tile * NSUB  # [PB]
        submask = ((pbits[:, None] >> jnp.arange(NSUB)[None, :]) & 1) > 0
        n_sp_all = jnp.sum(submask.astype(jnp.int32))
        vals2 = jnp.where(
            submask, base[:, None] + jnp.arange(NSUB, dtype=jnp.int32),
            MAXI)
        n_sp = jnp.minimum(n_sp_all, SPB)
        packed = jnp.minimum(jax.lax.sort(vals2.reshape(-1))[:SPB],
                             fill_pid)

        # ---- align each cluster's run to a JPS multiple -----------------
        # so every kernel step's JPS jobs share ONE cluster (one feat
        # block per step). Pad slots become jobs (cluster, LAST subtile):
        # real jobs against already-covered rays — duplicate hits are
        # idempotent under min-combine, so fills need no masking at all.
        cl_sp = packed // n_subtiles
        cl_ids = jnp.arange(cp, dtype=jnp.int32)
        # clamp run bounds to the VALID prefix: the SPB − n_sp fill entries
        # all carry cluster cp−1 and would otherwise count into its run —
        # total_al then ≈ SPB and every round of every epoch runs on fills
        # (measured as the entire 16 s → 4 s difference at the 1M proxy)
        starts = jnp.minimum(
            jnp.searchsorted(cl_sp, cl_ids, side="left"), n_sp)
        ends = jnp.minimum(
            jnp.searchsorted(cl_sp, cl_ids, side="right"), n_sp)
        lens = (ends - starts).astype(jnp.int32)
        al = ((lens + JPS - 1) // JPS) * JPS
        new_starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(al).astype(jnp.int32)])
        total_al = new_starts[-1]
        j = jnp.arange(SPB_AL, dtype=jnp.int32)
        # run id per output slot via scatter-ones + cumsum (a searchsorted
        # of 8.5M values measured 1.26 s on TPU; this is ~60 ms)
        marks = jnp.zeros((SPB_AL,), jnp.int32).at[new_starts[1:-1]].add(
            1, mode="drop")
        c_of_j = jnp.clip(jnp.cumsum(marks), 0, cp - 1).astype(jnp.int32)
        k_off = j - new_starts[c_of_j]
        in_run = (k_off < lens[c_of_j]) & (j < total_al)
        src = jnp.clip(starts[c_of_j] + k_off, 0, SPB - 1)
        pid_al = jnp.where(
            in_run, packed[src],
            jnp.where(j < total_al,
                      c_of_j * n_subtiles + (n_subtiles - 1), fill_pid)
        ).astype(jnp.int32)
        n_sp_al = total_al

        # per-subtile ray blocks [NST, 8, SUB]: rows o/d/tmin/tbest,
        # rays on lanes — the layout the elementwise kernel broadcasts from
        rayT = jnp.stack(
            [o_p[:, 0], o_p[:, 1], o_p[:, 2],
             d_p[:, 0], d_p[:, 1], d_p[:, 2],
             tmin_p, tb], axis=0
        ).reshape(8, n_subtiles, SUB).transpose(1, 0, 2)

        t_sub, i_sub = _mt_rounds(pid_al, n_sp_al, rayT, tv,
                                  n_subtiles, rounds, round_size,
                                  interpret)
        t_e = t_sub.reshape(np_)
        i_e = i_sub.reshape(np_)
        better = t_e < t_best
        t_best = jnp.where(better, t_e, t_best)
        i_best = jnp.where(better, i_e, i_best)
        ovf = (jnp.maximum(n_pairs - PB, 0)
               + jnp.maximum(n_sp_all - SPB, 0))
        return (t_best, i_best), (n_sp_all, ovf)

    # PYTHON loop over epochs, not lax.scan: nesting the rounds-scan
    # (with its pallas_call) inside an outer scan measured ~11× higher
    # per-round cost on the axon TPU backend (78 → 880 ms/round at 4
    # epochs); unrolled, each epoch compiles like the flat 1-epoch graph.
    # n_epochs is small and static, so graph growth is bounded.
    carry = (jnp.full((np_,), BIG, jnp.float32),
             jnp.zeros((np_,), jnp.int32))
    sp_total = jnp.int32(0)
    ovf_total = jnp.int32(0)
    for e in range(n_epochs):
        carry, (n_sp_e, ovf_e) = epoch_body(
            carry, (bounds[e], bounds[e + 1],
                    jnp.asarray(e == 0), jnp.asarray(e == n_epochs - 1)))
        sp_total = sp_total + n_sp_e
        ovf_total = ovf_total + ovf_e
    t_best, i_best = carry

    t = t_best[:n][unsort]
    idx = jnp.clip(i_best[:n][unsort], 0, max(clusters.n_tris - 1, 0))
    return t, idx, sp_total, ovf_total
