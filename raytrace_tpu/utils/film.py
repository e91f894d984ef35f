"""Film: sample accumulation into the image raster.

The reference hands every GPU radiance sample back to pbrt's film on the host
in a per-sample loop (photonmappingrenderer.cpp:247-273, simplerender.cpp:73-97
— another flagged hot host loop). Here the splat is a single on-device
scatter-add over all samples: pbrt-v2 box-filter semantics (default film
filter), NaN/negative/infinite samples zeroed first exactly like the
reference's guards. `splat` additionally offers pbrt's triangle and
gaussian reconstruction filters (the reference splats through pbrt's
`camera->film->AddSample`, photonmappingrenderer.cpp:269, which applies the
scene's PixelFilter) as a fixed-tap scatter-add.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from jax import Array

from raytrace_tpu.core import spectrum


def splat_box(
    image_xy: Array, radiance: Array, width: int, height: int
) -> Array:
    """Box-filter (radius 0.5) film accumulation.

    Args:
      image_xy: [N, 2] raster-space sample positions.
      radiance: [N, 3] radiance samples.
    Returns [height, width, 3] filtered image.
    """
    l = spectrum.sanitize(radiance)
    # pbrt discrete coords: a sample at continuous x lands in pixel floor(x)
    px = jnp.clip(jnp.floor(image_xy[:, 0]).astype(jnp.int32), 0, width - 1)
    py = jnp.clip(jnp.floor(image_xy[:, 1]).astype(jnp.int32), 0, height - 1)
    flat = py * width + px
    acc = jnp.zeros((height * width, 3), l.dtype).at[flat].add(l)
    wsum = jnp.zeros((height * width,), l.dtype).at[flat].add(1.0)
    img = acc / jnp.maximum(wsum, 1e-20)[:, None]
    return img.reshape(height, width, 3)


def splat(
    image_xy: Array,
    radiance: Array,
    width: int,
    height: int,
    filter_type: str = "box",
    filter_radius: float = 0.0,
    gaussian_alpha: float = 2.0,
) -> Array:
    """Film accumulation through a pbrt reconstruction filter.

    filter_type: "box" (radius 0.5, one tap — splat_box), "triangle"
    (pbrt TriangleFilter, default radius 2) or "gaussian" (pbrt
    GaussianFilter, default radius 2, alpha 2). filter_radius 0 picks the
    pbrt default for the filter. Non-box filters scatter each sample into
    the (2·ceil(r)+1)² pixel taps whose centers lie within the radius,
    weight-normalized per pixel exactly like pbrt's Film::WriteImage."""
    if filter_type == "box":
        return splat_box(image_xy, radiance, width, height)
    if filter_type not in ("triangle", "gaussian"):
        raise ValueError(f"unknown pixel filter {filter_type!r}")
    r = float(filter_radius) if filter_radius > 0.0 else 2.0
    l = spectrum.sanitize(radiance)
    x, y = image_xy[:, 0], image_xy[:, 1]
    px0 = jnp.floor(x).astype(jnp.int32)
    py0 = jnp.floor(y).astype(jnp.int32)
    taps = int(math.ceil(r))
    if filter_type == "gaussian":
        a = jnp.float32(gaussian_alpha)
        edge = jnp.float32(math.exp(-gaussian_alpha * r * r))
        w1d = lambda t: jnp.maximum(0.0, jnp.exp(-a * t * t) - edge)
    else:
        w1d = lambda t: jnp.maximum(0.0, r - jnp.abs(t))
    acc = jnp.zeros((height * width, 3), l.dtype)
    wsum = jnp.zeros((height * width,), l.dtype)
    for dy in range(-taps, taps + 1):
        for dx in range(-taps, taps + 1):
            pxc = px0 + dx
            pyc = py0 + dy
            wx = w1d(x - (pxc.astype(x.dtype) + 0.5))
            wy = w1d(y - (pyc.astype(y.dtype) + 0.5))
            w = wx * wy
            inb = (pxc >= 0) & (pxc < width) & (pyc >= 0) & (pyc < height)
            w = jnp.where(inb, w, 0.0)
            flat = (jnp.clip(pyc, 0, height - 1) * width
                    + jnp.clip(pxc, 0, width - 1))
            acc = acc.at[flat].add(w[:, None] * l)
            wsum = wsum.at[flat].add(w)
    img = acc / jnp.maximum(wsum, 1e-20)[:, None]
    return img.reshape(height, width, 3)
