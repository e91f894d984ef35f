"""Pallas TPU wavefront intersection megakernel.

The reference's hot loop is BVH traversal + per-shape intersection inside
every rtTrace (SURVEY.md §3.4). The TPU-native hot op is this kernel: a tile
of rays (sublanes) is tested against a chunk of triangles (lanes) as dense
[TR, TC] Möller–Trumbore on the VPU, with the running closest hit
accumulated in VMEM across triangle chunks — no [N, T] intermediate ever
touches HBM (the jnp scan fallback in ops/intersect.py materializes [N,
chunk] temporaries per step). Coordinates travel as [3, N] SoA so the lane
dimension is the batch dimension.

Used for the dense (non-BVH) path; with a BVH present, traversal culls to
leaf ranges first (ops/bvh.py) and this kernel's math is the same one applied
per leaf. Gradients: the kernel runs under stop_gradient (it returns the
winning index and primal t/beta/gamma); callers re-intersect the winner with
plain jnp ops — same contract as the BVH path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30

# Ray tile (sublanes) × triangle chunk (lanes). f32 min tile is (8, 128);
# 128×512 keeps each [TR, TC] temporary at 256 KB and the working set well
# under VMEM while giving the VPU long lanes.
TILE_RAYS = 128
TILE_TRIS = 512


def _cross(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _kernel(o_ref, d_ref, tmin_ref, tmax_ref, v0_ref, v1_ref, v2_ref,
            t_ref, idx_ref, beta_ref, gamma_ref, *, tile_tris: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[:] = jnp.full_like(t_ref, BIG)
        idx_ref[:] = jnp.zeros_like(idx_ref)
        beta_ref[:] = jnp.zeros_like(beta_ref)
        gamma_ref[:] = jnp.zeros_like(gamma_ref)

    # rays: [TR] per component (sublane axis of the pair matrices)
    ox, oy, oz = o_ref[0, :], o_ref[1, :], o_ref[2, :]
    dx, dy, dz = d_ref[0, :], d_ref[1, :], d_ref[2, :]
    tmin = tmin_ref[0, :]
    tmax = tmax_ref[0, :]
    # triangles: [TC] per component (lane axis)
    v0x, v0y, v0z = v0_ref[0, :], v0_ref[1, :], v0_ref[2, :]
    v1x, v1y, v1z = v1_ref[0, :], v1_ref[1, :], v1_ref[2, :]
    v2x, v2y, v2z = v2_ref[0, :], v2_ref[1, :], v2_ref[2, :]

    e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
    e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z

    r = lambda a: a[:, None]   # ray component → [TR, 1]
    c = lambda a: a[None, :]   # tri component → [1, TC]

    # pvec = d × e2 → [TR, TC] per component
    px, py, pz = _cross(r(dx), r(dy), r(dz), c(e2x), c(e2y), c(e2z))
    det = c(e1x) * px + c(e1y) * py + c(e1z) * pz
    inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    tvx, tvy, tvz = r(ox) - c(v0x), r(oy) - c(v0y), r(oz) - c(v0z)
    beta = (tvx * px + tvy * py + tvz * pz) * inv_det
    qx, qy, qz = _cross(tvx, tvy, tvz, c(e1x), c(e1y), c(e1z))
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

    # closest triangle in this chunk, then fold into the running best
    tbest = jnp.min(t, axis=1)  # [TR]
    lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    jbest = jnp.min(jnp.where(t <= tbest[:, None], lane, tile_tris), axis=1)
    onehot = (lane == jbest[:, None]) & (t <= tbest[:, None])
    beta_best = jnp.sum(jnp.where(onehot, beta, 0.0), axis=1)
    gamma_best = jnp.sum(jnp.where(onehot, gamma, 0.0), axis=1)

    prev = t_ref[0, :]
    better = tbest < prev
    t_ref[0, :] = jnp.where(better, tbest, prev)
    idx_ref[0, :] = jnp.where(
        better, j * tile_tris + jbest, idx_ref[0, :]
    )
    beta_ref[0, :] = jnp.where(better, beta_best, beta_ref[0, :])
    gamma_ref[0, :] = jnp.where(better, gamma_best, gamma_ref[0, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def intersect_triangles_pallas(tris, o, d, tmin, tmax, interpret: bool = False):
    """Closest triangle hit via the Pallas megakernel — same contract as
    ops/intersect.intersect_triangles: (t [N], idx [N], beta [N], gamma [N]).
    """
    o_sg = jax.lax.stop_gradient(o)
    d_sg = jax.lax.stop_gradient(d)
    v0 = jax.lax.stop_gradient(tris.v0)
    v1 = jax.lax.stop_gradient(tris.v1)
    v2 = jax.lax.stop_gradient(tris.v2)

    n = o.shape[0]
    n_tris = v0.shape[0]
    # clamp the triangle tile so tiny scenes don't pad up to a full chunk
    pow2 = 1 << max(0, (n_tris - 1).bit_length())
    tile_tris = min(TILE_TRIS, max(128, pow2))
    n_pad = -n % TILE_RAYS
    t_pad = -n_tris % tile_tris

    # SoA [3, N] layout; rays pad with zeros (results sliced off), triangles
    # pad with degenerate zeros (det == 0 → never hit)
    pad_r = lambda x: jnp.pad(x.T, ((0, 0), (0, n_pad)))
    pad_t = lambda x: jnp.pad(x.T, ((0, 0), (0, t_pad)))
    oT, dT = pad_r(o_sg), pad_r(d_sg)
    v0T, v1T, v2T = pad_t(v0), pad_t(v1), pad_t(v2)
    tminP = jnp.pad(jax.lax.stop_gradient(tmin), (0, n_pad))[None, :]
    tmaxP = jnp.pad(jax.lax.stop_gradient(tmax), (0, n_pad))[None, :]

    np_ = n + n_pad
    tp_ = n_tris + t_pad
    grid = (np_ // TILE_RAYS, tp_ // tile_tris)

    ray_spec3 = pl.BlockSpec(
        (3, TILE_RAYS), lambda i, j: (0, i), memory_space=pltpu.VMEM
    )
    ray_spec1 = pl.BlockSpec(
        (1, TILE_RAYS), lambda i, j: (0, i), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(
        (3, tile_tris), lambda i, j: (0, j), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, TILE_RAYS), lambda i, j: (0, i), memory_space=pltpu.VMEM
    )

    t, idx, beta, gamma = pl.pallas_call(
        functools.partial(_kernel, tile_tris=tile_tris),
        grid=grid,
        in_specs=[ray_spec3, ray_spec3, ray_spec1, ray_spec1,
                  tri_spec, tri_spec, tri_spec],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.int32),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=90 * np_ * tp_, bytes_accessed=(np_ * 10 + tp_ * 9) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(oT, dT, tminP, tmaxP, v0T, v1T, v2T)

    t_primal = t[0, :n]
    idx = jnp.clip(idx[0, :n], 0, n_tris - 1)
    # restore differentiability by re-intersecting the winner outside the
    # kernel (same contract as the BVH path)
    from raytrace_tpu.ops.bvh import reintersect_winner

    found = t_primal < jnp.minimum(BIG, tmax)
    t_diff, beta_diff, gamma_diff = reintersect_winner(tris, idx, o, d, found)
    return t_diff, idx, beta_diff, gamma_diff
