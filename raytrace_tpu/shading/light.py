"""Batched light sampling — illumination sampling for direct lighting,
emission sampling for photon shooting, and emitted-radiance lookup.

Reimplements the reference's device light library
(util/light/cudalight.cu.h) over the flattened light table. Differentiable in
the light intensities (for emitter-power gradients).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import Array

from raytrace_tpu.core import vec
from raytrace_tpu.core.sampling import (
    INV_TWOPI,
    concentric_sample_disk,
    uniform_sample_sphere,
    uniform_sphere_pdf,
)
from raytrace_tpu.scene.scene import (
    LIGHT_AREA_DISK,
    LIGHT_DISTANT,
    LIGHT_POINT,
    Lights,
)


def _light_row(lights: Lights, i):
    """Row(s) of the light table. `i` may be a static int (scalar row) or an
    [N] index array (one row per sample — used for per-path light selection
    in photon shooting)."""
    return jax.tree_util.tree_map(lambda a: a[i], lights)


def sample_L_illum(
    lights: Lights, i_light: int, p: Array, u2d: Array
) -> tuple[Array, Array, Array]:
    """Illumination sampling toward light i from points p [N,3] with 2D
    samples u2d [N,2] (reference: cudalight.cu.h:18-64 Sample_L).

    Returns (li [N,3], uwi [N,3] UNNORMALIZED toward the light, pdf [N]).
    The unnormalized uwi doubles as the shadow-ray extent, matching the
    reference's shadow rays over [eps, 1-eps] of uwi (raytracing.cu:72).
    """
    cld = _light_row(lights, i_light)

    # point light (cu.h:18-29)
    uwi_pt = cld.o - p
    inv_len2 = 1.0 / jnp.maximum(vec.length_squared(uwi_pt), 1e-20)
    li_pt = cld.intensity * inv_len2[:, None]
    pdf_pt = jnp.ones(p.shape[0], p.dtype)

    # disk area light (cu.h:31-52)
    dx, dy = concentric_sample_disk(u2d[:, 0], u2d[:, 1])
    uwi_ar = cld.o + dx[:, None] * cld.p1 + dy[:, None] * cld.p2 - p
    wi = vec.normalize(uwi_ar)
    dist2 = vec.length_squared(uwi_ar)
    cos_t = -vec.dot(jnp.broadcast_to(cld.normal, wi.shape), wi)
    pdf_ar = dist2 / jnp.where(
        cos_t * cld.area == 0.0, 1e-20, cos_t * cld.area
    )
    li_ar = jnp.where(cos_t[:, None] > 0.0, cld.intensity, 0.0)

    # distant light (pbrt DistantLight::Sample_L): li = L, pdf = 1; the
    # shadow "extent" reaches 2·world_radius against the travel direction
    # (the launch-disk radius is encoded as area = π·r²)
    r_w = jnp.sqrt(jnp.maximum(cld.area, 1e-20) * (1.0 / math.pi))
    uwi_di = jnp.broadcast_to(-cld.normal, uwi_pt.shape) * (
        2.0 * jnp.asarray(r_w)[..., None]
    )
    li_di = jnp.broadcast_to(cld.intensity, li_pt.shape)
    pdf_di = jnp.ones(p.shape[0], p.dtype)

    is_point = cld.ltype == LIGHT_POINT
    is_dist = cld.ltype == LIGHT_DISTANT
    li = jnp.where(is_point, li_pt, jnp.where(is_dist, li_di, li_ar))
    uwi = jnp.where(is_point, uwi_pt, jnp.where(is_dist, uwi_di, uwi_ar))
    pdf = jnp.where(is_point, pdf_pt, jnp.where(is_dist, pdf_di, pdf_ar))
    return li, uwi, pdf


def sample_Le(
    lights: Lights, i_light, lu1: Array, lu2: Array, u1: Array, u2: Array
) -> tuple[Array, Array, Array, Array, Array]:
    """Emission sampling for photon shooting
    (reference: cudalight.cu.h:78-124 Sample_L ray variant).

    i_light: static int (all samples from one light, reference semantics —
    lightSourceIndex=0, photonmappingrenderer.cpp:211) or an [N] index array
    (per-path light selection for multi-light scenes).

    Returns (Le [N,3], ray_o [N,3], ray_d [N,3], Ns [N,3], pdf [N]).
    """
    cld = _light_row(lights, i_light)
    n = lu1.shape[0]

    # point light: uniform sphere (cu.h:78-88)
    d_pt = uniform_sample_sphere(lu1, lu2)
    o_pt = jnp.broadcast_to(cld.o, (n, 3))
    ns_pt = d_pt
    pdf_pt = jnp.full((n,), uniform_sphere_pdf(), lu1.dtype)
    le_pt = jnp.broadcast_to(cld.intensity, (n, 3))

    # disk area light: disk origin + uniform-sphere dir flipped to the normal
    # hemisphere, pdf 1/2π, Le = intensity·area (cu.h:90-110)
    dx, dy = concentric_sample_disk(lu1, lu2)
    o_ar = jnp.broadcast_to(cld.o, (n, 3)) + dx[:, None] * cld.p1 + dy[:, None] * cld.p2
    d_ar = uniform_sample_sphere(u1, u2)
    ns_ar = jnp.broadcast_to(cld.normal, (n, 3))
    flip = vec.dot(d_ar, ns_ar) < 0.0
    d_ar = jnp.where(flip[:, None], -d_ar, d_ar)
    pdf_ar = jnp.full((n,), INV_TWOPI, lu1.dtype)
    area = jnp.broadcast_to(jnp.asarray(cld.area), (n,))
    le_ar = jnp.broadcast_to(cld.intensity, (n, 3)) * area[:, None]

    # distant light (pbrt DistantLight::Sample_L ray variant): origin on the
    # world-bounding disk pushed back one world radius against the travel
    # direction, direction = the travel direction, pdf = 1/(π·r²) = 1/area
    r_w = jnp.sqrt(jnp.maximum(jnp.asarray(cld.area), 1e-20) * (1.0 / math.pi))
    nrm = jnp.broadcast_to(cld.normal, (n, 3))
    o_di = (
        jnp.broadcast_to(cld.o, (n, 3))
        - jnp.broadcast_to(jnp.asarray(r_w)[..., None] * cld.normal, (n, 3))
        + dx[:, None] * cld.p1
        + dy[:, None] * cld.p2
    )
    d_di = nrm
    ns_di = nrm
    pdf_di = 1.0 / jnp.maximum(area, 1e-20)
    le_di = jnp.broadcast_to(cld.intensity, (n, 3))

    is_point = jnp.broadcast_to(jnp.asarray(cld.ltype == LIGHT_POINT), (n,))
    is_dist = jnp.broadcast_to(jnp.asarray(cld.ltype == LIGHT_DISTANT), (n,))
    ip3 = is_point[:, None]
    id3 = is_dist[:, None]
    le = jnp.where(ip3, le_pt, jnp.where(id3, le_di, le_ar))
    o = jnp.where(ip3, o_pt, jnp.where(id3, o_di, o_ar))
    d = jnp.where(ip3, d_pt, jnp.where(id3, d_di, d_ar))
    ns = jnp.where(ip3, ns_pt, jnp.where(id3, ns_di, ns_ar))
    pdf = jnp.where(is_point, pdf_pt, jnp.where(is_dist, pdf_di, pdf_ar))
    return le, o, d, ns, pdf


def light_L(lights: Lights, i_light: Array, wow: Array) -> Array:
    """Emitted radiance when a camera ray hits emitter geometry front-face
    (reference: cudalight.cu.h:128-138 lightL; per-instance lightIndex set at
    cudarender.cpp:193). i_light is a per-ray int array, -1 = not an emitter."""
    idx = jnp.maximum(i_light, 0)
    normal = lights.normal[idx]
    intensity = lights.intensity[idx]
    front = vec.dot(normal, wow) > 0.0
    hit_emitter = i_light >= 0
    return jnp.where((front & hit_emitter)[..., None], intensity, 0.0)
