"""Texture seam (shading/material.texture_eval): a checker-textured floor
must match the CPU oracle pixel-for-pixel through the simple renderer —
closing the reference's placeholder texture hook
(util/texture/cudatexture.cu.h:7-9, which returns a constant).
"""
import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.core.config import RenderConfig
from raytrace_tpu.oracle import cpu_reference as orc
from raytrace_tpu.renderers.simple import render_simple
from raytrace_tpu.scene import transform as tr
from raytrace_tpu.scene.builder import SceneBuilder
from raytrace_tpu.scene.camera import PerspectiveCamera
from raytrace_tpu.shading.material import TEX_CHECKER_LO, texture_eval

SIZE = 48


def _scene():
    b = SceneBuilder()
    floor = b.matte((0.7, 0.6, 0.5), texture="checker", tex_scale=6.0)
    verts = np.array([[-4, -4, 0], [4, -4, 0], [4, 4, 0], [-4, 4, 0]],
                     np.float64)
    idx = np.array([[0, 1, 2], [0, 2, 3]])
    b.triangle_mesh(verts, idx, material=floor)
    b.point_light((1.0, -2.0, 5.0), (60.0, 60.0, 60.0))
    scene = b.build()

    mats = [orc.OMaterial(0, np.array([0.7, 0.6, 0.5]), tex_type=1,
                          tex_scale=6.0)]
    tris = [orc.OTriangle(verts[i0], verts[i1], verts[i2], mat=0)
            for i0, i1, i2 in idx]
    lights = [orc.OLight(0, np.array([1.0, -2.0, 5.0]),
                         np.array([60.0, 60.0, 60.0]))]
    oracle = orc.OScene(tris, [], [], mats, lights)
    c2w = tr.look_at((0.0, -4.0, 4.0), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0))
    return scene, oracle, c2w


def test_texture_eval_checker():
    scene, _, _ = _scene()
    uv = jnp.asarray([[0.05, 0.05], [0.2, 0.05], [0.2, 0.2], [0.9, 0.1]])
    mat = jnp.zeros((4,), jnp.int32)
    f = np.asarray(texture_eval(scene.materials, mat, uv))
    # tex_scale 6: cells flip every 1/6 in u/v
    np.testing.assert_allclose(f, [1.0, TEX_CHECKER_LO, 1.0,
                                   TEX_CHECKER_LO])


def test_textured_floor_matches_oracle():
    scene, oracle, c2w = _scene()
    cam = PerspectiveCamera.make(c2w, 60.0, SIZE, SIZE)
    config = RenderConfig(width=SIZE, height=SIZE, spp=1,
                          scene_epsilon=1e-3)
    img = np.asarray(render_simple(scene, cam, config,
                                   jax.random.PRNGKey(0), jitter=False))
    ref = orc.render_direct(
        oracle, c2w, 60.0, SIZE, SIZE, scene_eps=1e-3,
        include_emitted=False,
    )
    assert np.isfinite(img).all()
    # the checker must actually appear (distinct dark/light floor cells)
    assert img.max() > 2.0 * max(img[img > 1e-4].min(), 1e-4)
    np.testing.assert_allclose(img, ref, rtol=2e-3, atol=2e-3)


def test_untextured_material_unchanged():
    """tex_type 0 materials must be bit-identical to the pre-seam shading."""
    scene, _, _ = _scene()
    uv = jax.random.uniform(jax.random.PRNGKey(1), (16, 2)) * 10
    f = np.asarray(texture_eval(
        scene.materials.replace(
            tex_type=jnp.zeros_like(scene.materials.tex_type)),
        jnp.zeros((16,), jnp.int32), uv))
    np.testing.assert_array_equal(f, np.ones(16, np.float32))
