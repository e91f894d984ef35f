"""Film: sample accumulation into the image raster.

The reference hands every GPU radiance sample back to pbrt's film on the host
in a per-sample loop (photonmappingrenderer.cpp:247-273, simplerender.cpp:73-97
— another flagged hot host loop). Here the splat is a single on-device
scatter-add over all samples: pbrt-v2 box-filter semantics (default film
filter), NaN/negative/infinite samples zeroed first exactly like the
reference's guards.
"""
from __future__ import annotations

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
