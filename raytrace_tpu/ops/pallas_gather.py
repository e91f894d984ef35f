"""Pallas TPU photon radius-search + shading kernel.

The reference's gather pass walks a kd-tree per pixel with an explicit
40-deep stack (gathering.cu:25-96). The hash-grid jnp path (ops/
photon_grid.py) replaces the tree, but its 27-neighborhood × per-cell scan
lowers to hundreds of serial dynamic gathers — the measured hot spot of the
whole pipeline on TPU. This kernel restructures the search as a dense
wavefront: a tile of queries (sublanes) against a chunk of photons (lanes),
accumulating

    L += kd/π · Σ_{dist² < r²} |n_s · wi_p| · α_p     and     M += count

entirely in VMEM across photon chunks. Photons arrive validity-compacted
(valid prefix), and chunks past the valid count are skipped via a prefetched
scalar, so the effective cost is O(queries × valid photons) of pure VPU
math — exact (no per-cell truncation), same semantics as the reference's
in-radius test (gathering.cu:40-42).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 128
TILE_P = 512


def _kernel(nv_ref, qp_ref, qr2_ref, qns_ref, qkd_ref,
            pp_ref, pal_ref, pwi_ref, pval_ref,
            acc_ref, m_ref, *, tile_p: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.zeros_like(m_ref)

    @pl.when(j * tile_p < nv_ref[0])
    def _():
        qx, qy, qz = qp_ref[0, :], qp_ref[1, :], qp_ref[2, :]
        r2 = qr2_ref[0, :]
        nsx, nsy, nsz = qns_ref[0, :], qns_ref[1, :], qns_ref[2, :]
        px, py, pz = pp_ref[0, :], pp_ref[1, :], pp_ref[2, :]
        wix, wiy, wiz = pwi_ref[0, :], pwi_ref[1, :], pwi_ref[2, :]
        pval = pval_ref[0, :]

        r = lambda a: a[:, None]
        c = lambda a: a[None, :]
        dx = r(qx) - c(px)
        dy = r(qy) - c(py)
        dz = r(qz) - c(pz)
        dist2 = dx * dx + dy * dy + dz * dz
        ok = (dist2 < r(r2)) & (c(pval) > 0.0)

        w = jnp.abs(r(nsx) * c(wix) + r(nsy) * c(wiy) + r(nsz) * c(wiz))
        wm = jnp.where(ok, w, 0.0)  # [TQ, TP]

        for ch in range(3):
            s = jnp.sum(wm * c(pal_ref[ch, :]), axis=1)  # [TQ]
            acc_ref[ch, :] += qkd_ref[ch, :] * s
        m_ref[0, :] += jnp.sum(ok.astype(jnp.float32), axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_radius_pallas(
    photons_p: Array,      # [P, 3] validity-compacted (valid prefix)
    photons_alpha: Array,  # [P, 3]
    photons_wi: Array,     # [P, 3]
    photons_valid: Array,  # [P] bool
    n_valid: Array,        # scalar int32
    q_p: Array,            # [N, 3]
    radius2: Array,        # [N]
    q_ns: Array,           # [N, 3]
    q_kd_over_pi: Array,   # [N, 3]
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Exact radius search + photon shading → (L [N, 3], M [N] int32).

    Same contract as ops/photon_grid.gather_radius but dense and exact
    (no max_per_cell budget). All inputs run under stop_gradient except
    alpha/kd, whose gradient path is restored by the caller re-applying the
    linear combination — here the kernel itself is the primal; the
    differentiable renderers use the jnp grid path (config.differentiable).
    """
    sg = jax.lax.stop_gradient
    n = q_p.shape[0]
    p = photons_p.shape[0]
    n_pad = -n % TILE_Q
    tile_p = min(TILE_P, max(128, 1 << max(0, (p - 1).bit_length())))
    p_pad = -p % tile_p

    pad_q = lambda x: jnp.pad(sg(x).T, ((0, 0), (0, n_pad)))
    pad_p = lambda x: jnp.pad(sg(x).T, ((0, 0), (0, p_pad)))
    qpT = pad_q(q_p)
    qnsT = pad_q(q_ns)
    qkdT = pad_q(q_kd_over_pi)
    # padded queries get radius² = 0 → never match
    qr2 = jnp.pad(sg(radius2), (0, n_pad))[None, :]
    ppT = pad_p(photons_p)
    palT = pad_p(photons_alpha)
    pwiT = pad_p(photons_wi)
    pval = jnp.pad(sg(photons_valid).astype(jnp.float32), (0, p_pad))[None, :]

    np_ = n + n_pad
    pp_ = p + p_pad
    grid = (np_ // TILE_Q, pp_ // tile_p)

    q3 = pl.BlockSpec((3, TILE_Q), lambda i, j, nv: (0, i),
                      memory_space=pltpu.VMEM)
    q1 = pl.BlockSpec((1, TILE_Q), lambda i, j, nv: (0, i),
                      memory_space=pltpu.VMEM)
    p3 = pl.BlockSpec((3, tile_p), lambda i, j, nv: (0, j),
                      memory_space=pltpu.VMEM)
    p1 = pl.BlockSpec((1, tile_p), lambda i, j, nv: (0, j),
                      memory_space=pltpu.VMEM)
    out3 = pl.BlockSpec((3, TILE_Q), lambda i, j, nv: (0, i),
                        memory_space=pltpu.VMEM)
    out1 = pl.BlockSpec((1, TILE_Q), lambda i, j, nv: (0, i),
                        memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[q3, q1, q3, q3, p3, p3, p3, p1],
        out_specs=(out3, out1),
    )
    acc, m = pl.pallas_call(
        functools.partial(_kernel, tile_p=tile_p),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((3, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * np_ * pp_,
            bytes_accessed=(np_ * 10 + pp_ * 10) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray([n_valid], jnp.int32).reshape(1),
        qpT, qr2, qnsT, qkdT, ppT, palT, pwiT, pval,
    )
    return acc[:, :n].T, m[0, :n].astype(jnp.int32)


def compact_photons(photons) -> tuple:
    """Sort a PhotonMap so valid photons form a prefix → (sorted map fields,
    n_valid). The stable argsort keeps deposition order within each class —
    gather results are order-independent sums either way."""
    sg = jax.lax.stop_gradient
    order = jnp.argsort(~sg(photons.valid), stable=True)
    return (
        photons.p[order],
        photons.alpha[order],
        photons.wi[order],
        photons.valid[order],
        jnp.sum(photons.valid).astype(jnp.int32),
    )
