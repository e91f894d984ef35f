"""The "simple" direct-lighting renderer — the reference's sanity/test path
(simple_render/simplerender.{h,cpp,cu}: one bounce, per-light shadow rays,
film splat).

Deviation documented: the reference kernel omits the 1/pdf factor for area
lights (simplerender.cu:69 has no pdf division — a bug its own photon
renderer does not share, raytracing.cu:78). We use the correct estimator,
matching pbrt-v2 and our CPU oracle.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array

from raytrace_tpu.core.config import RenderConfig
from raytrace_tpu.renderers import common
from raytrace_tpu.scene.camera import PerspectiveCamera, generate_rays, pixel_samples
from raytrace_tpu.scene.scene import Scene
from raytrace_tpu.utils import film


def render_simple(
    scene: Scene,
    camera: PerspectiveCamera,
    config: RenderConfig,
    key: Array,
    jitter: bool = True,
) -> Array:
    """Render and return the [H, W, 3] image."""
    light_samples = common.static_light_samples(scene, config)
    return _render_simple(
        scene, camera, key, config, light_samples, jitter
    )


@partial(jax.jit, static_argnames=("config", "light_samples", "jitter"))
def _render_simple(
    scene: Scene,
    camera: PerspectiveCamera,
    key: Array,
    config: RenderConfig,
    light_samples: tuple[int, ...],
    jitter: bool,
) -> Array:
    k_pix, k_light = jax.random.split(key)
    xy, lens = pixel_samples(
        k_pix, config.width, config.height, config.spp, jitter=jitter
    )
    rays = generate_rays(camera, xy, lens, config.spp)

    # Camera pass with specular chains followed to the cap, then direct
    # lighting at the first diffuse hit weighted by the chain throughput
    # rec.atten — the oracle's render_direct semantics. (The reference's
    # simple kernel has no specular path at all, simplerender.cu:47-78 —
    # a mirror renders black there; following the chain is the documented
    # capability upgrade, and matches the photon renderer's camera pass.)
    rec = common.camera_pass(scene, rays.o, rays.d, config)
    L = common.direct_lighting(
        scene, rec, k_light, config, light_samples, include_emitted=False
    )
    L = rec.atten * L
    return film.splat(xy, L, config.width, config.height,
                      config.pixel_filter, config.filter_radius)
