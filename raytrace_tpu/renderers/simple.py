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

    # single-bounce camera pass: reuse the shared wavefront pass with a
    # specular cap of 0 so specular hits flag exception → black, like the
    # simple kernel has no specular path at all (simplerender.cu:47-78)
    cfg = config
    rec = common.camera_pass(scene, rays.o, rays.d, cfg)
    L = common.direct_lighting(
        scene, rec, k_light, cfg, light_samples, include_emitted=False
    )
    return film.splat_box(xy, L, config.width, config.height)
