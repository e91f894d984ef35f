"""Batched BSDF evaluation/sampling — the tagged-union dispatch of the
reference's device material library (util/material/cudamaterial.cu.h), turned
into masked vector math. Differentiable in the material table (kd/kr/eta).

Deliberate fixes over the reference (documented; BASELINE requires them):
  - mirror multiplies by Kr (the reference uploads Kr, cudamaterial.cpp:53-59,
    then returns 1.0 in materialSpecularMirror, cu.h:101-105 — a dropped
    parameter; pbrt-v2 uses Kr, and so do we);
  - glass handles total internal reflection by reflecting (the reference
    returns black and kills the path, cu.h:122-124);
  - glass eta is per-material (reference hard-codes 1.5, cu.h:118).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from jax import Array

from raytrace_tpu.core import vec
from raytrace_tpu.core.sampling import INV_PI, cosine_sample_hemisphere
from raytrace_tpu.scene.scene import GLASS, MATTE, MIRROR, Materials


TEX_CHECKER_LO = 0.25  # odd checker cells scale kd by this


def texture_eval(materials: Materials, mat: Array, uv: Array) -> Array:
    """Per-material texture factor at uv [N, 2] → [N] (the reference's
    texture hook, util/texture/cudatexture.cu.h:7-9, made real: constant or
    procedural checker). Differentiable in nothing (a piecewise-constant
    modulation of kd — AD flows through kd itself)."""
    m = jnp.maximum(mat, 0)
    tt = materials.tex_type[m]
    sc = materials.tex_scale[m]
    cell = (jnp.floor(uv[..., 0] * sc) + jnp.floor(uv[..., 1] * sc))
    odd = jnp.mod(cell, 2.0) >= 1.0
    checker = jnp.where(odd, jnp.float32(TEX_CHECKER_LO), 1.0)
    return jnp.where(tt == 1, checker, 1.0)


def f(materials: Materials, mat: Array, wo_w: Array, wi_w: Array,
      uv: Array | None = None) -> Array:
    """BSDF value for non-specular scattering: Lambert kd/π for matte, black
    for everything else (reference: cudamaterial.cu.h:17-32). World-space
    directions are accepted for signature parity; Lambert ignores them.
    uv (optional) evaluates the material's texture at the shading point."""
    kd = materials.kd[jnp.maximum(mat, 0)]
    if uv is not None:
        kd = kd * texture_eval(materials, mat, uv)[..., None]
    is_matte = (materials.mtype[jnp.maximum(mat, 0)] == MATTE) & (mat >= 0)
    return jnp.where(is_matte[..., None], kd * INV_PI, 0.0)


def is_specular(materials: Materials, mat: Array) -> Array:
    """(reference: cudamaterial.cu.h:168-173)"""
    mt = materials.mtype[jnp.maximum(mat, 0)]
    return ((mt == MIRROR) | (mt == GLASS)) & (mat >= 0)


def kd_in_specular(materials: Materials, mat: Array) -> Array:
    """True where the SPECULAR throughput multiplies by the material's kd row
    (mirror: Kr is stored in kd). Glass throughput is parameter-free —
    `specular()` returns ones for it — so glass bounces must contribute NO
    kd factor to the record-and-replay AD chain: recording them would make
    the replay ratio sg(alpha)·Πkd/sg(Πkd) report a spurious nonzero
    d(alpha)/d(kd[glass]) where the true gradient is exactly 0."""
    mt = materials.mtype[jnp.maximum(mat, 0)]
    return (mt == MIRROR) & (mat >= 0)


def pdf_lambert(wo_local: Array, wi_local: Array) -> Array:
    """(reference: cudamaterial.cu.h:44-47)"""
    same_hemi = wo_local[..., 2] * wi_local[..., 2] > 0.0
    return jnp.where(same_hemi, jnp.abs(wi_local[..., 2]) * INV_PI, 0.0)


def sample_f(
    materials: Materials,
    mat: Array,
    ns: Array,
    dpdu: Array,
    wo_w: Array,
    u1: Array,
    u2: Array,
    uv: Array | None = None,
) -> tuple[Array, Array, Array]:
    """Cosine-hemisphere BSDF sampling in the shading frame
    (reference: cudamaterial.cu.h:68-98 Sample_f). Returns (f, wi_world, pdf)."""
    nn, sn, tn = vec.shading_frame(ns, dpdu)
    wo = vec.world_to_local(wo_w, nn, sn, tn)
    wi = cosine_sample_hemisphere(u1, u2)
    wi = wi.at[..., 2].set(jnp.where(wo[..., 2] < 0.0, -wi[..., 2], wi[..., 2]))
    pdf = pdf_lambert(wo, wi)
    fr = f(materials, mat, wo_w, wo_w, uv=uv)  # Lambert: dir-independent
    wi_w = vec.local_to_world(wi, nn, sn, tn)
    return fr, wi_w, pdf


def specular(
    materials: Materials,
    mat: Array,
    ns: Array,
    dpdu: Array,
    wo_w: Array,
) -> tuple[Array, Array]:
    """Specular scattering for mirror/glass
    (reference: cudamaterial.cu.h:136-165 materialSpecular).
    Returns (throughput [N,3], wi_world [N,3])."""
    nn, sn, tn = vec.shading_frame(ns, dpdu)
    wo = vec.world_to_local(wo_w, nn, sn, tn)
    mt = materials.mtype[jnp.maximum(mat, 0)]
    kr = materials.kd[jnp.maximum(mat, 0)]
    eta_mat = materials.eta[jnp.maximum(mat, 0)]

    # mirror (cu.h:101-105), with Kr applied
    wi_mirror = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)

    # glass (cu.h:112-134)
    cos_o = wo[..., 2]
    entering = cos_o > 0.0
    eta = jnp.where(entering, 1.0 / eta_mat, eta_mat)
    sini2 = jnp.maximum(0.0, 1.0 - cos_o * cos_o)
    sint2 = eta * eta * sini2
    tir = sint2 >= 1.0
    cost = jnp.sqrt(jnp.maximum(0.0, 1.0 - sint2))
    cost = jnp.where(entering, -cost, cost)
    wi_refract = jnp.stack(
        [eta * -wo[..., 0], eta * -wo[..., 1], cost], axis=-1
    )
    # TIR → reflect instead of dying (fix of reference cu.h:122-124)
    wi_glass = jnp.where(tir[..., None], wi_mirror, wi_refract)

    is_mirror = mt == MIRROR
    wi = jnp.where(is_mirror[..., None], wi_mirror, wi_glass)
    thr = jnp.where(is_mirror[..., None], kr, jnp.ones_like(kr))
    wi_w = vec.local_to_world(wi, nn, sn, tn)
    return thr, wi_w
