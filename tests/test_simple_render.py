"""End-to-end simple renderer vs the CPU oracle (BASELINE config[0]:
sphere + plane, direct lighting, allclose vs the pbrt-v2-style reference)."""
import jax
import numpy as np

from raytrace_tpu.core.config import RenderConfig
from raytrace_tpu.oracle import cpu_reference as orc
from raytrace_tpu.renderers.simple import render_simple
from raytrace_tpu.scene.camera import PerspectiveCamera
from raytrace_tpu.utils import image as img_util

from tests.scenes import sphere_plane_scene

SIZE = 64
FOV = 50.0


def test_simple_render_matches_oracle():
    scene, oracle, c2w = sphere_plane_scene()
    cam = PerspectiveCamera.make(c2w, FOV, SIZE, SIZE)
    config = RenderConfig(width=SIZE, height=SIZE, spp=1, scene_epsilon=1e-3)
    img = np.asarray(
        render_simple(scene, cam, config, jax.random.PRNGKey(0), jitter=False)
    )
    ref = orc.render_direct(
        oracle, c2w, FOV, SIZE, SIZE, scene_eps=1e-3, include_emitted=False
    )
    assert img.shape == (SIZE, SIZE, 3)
    # point light + deterministic pixel centers → tight tolerance except at
    # silhouette/shadow-edge pixels where f32 vs f64 rounding flips a hit
    err = np.abs(img - ref)
    bad = np.mean(np.any(err > 5e-3 * np.maximum(1.0, np.abs(ref)), axis=-1))
    assert bad < 0.01, f"{bad:.3%} of pixels disagree with the oracle"
    assert img_util.rmse(img, ref) < 2e-2


def test_simple_render_nonblack_and_shadowed():
    scene, _, c2w = sphere_plane_scene()
    cam = PerspectiveCamera.make(c2w, FOV, SIZE, SIZE)
    config = RenderConfig(width=SIZE, height=SIZE, spp=1, scene_epsilon=1e-3)
    img = np.asarray(
        render_simple(scene, cam, config, jax.random.PRNGKey(0), jitter=False)
    )
    assert np.all(np.isfinite(img))
    assert img.max() > 0.05  # lit floor/sphere
    # some pixels are pure shadow or background
    assert (img.sum(-1) == 0).any()


def test_simple_render_mirror_matches_oracle():
    """A mirror in a 'simple' scene: the camera pass follows the specular
    chain and the direct light at the reflected hit must be weighted by the
    chain throughput rec.atten (= Kr) — exactly the oracle's render_direct
    semantics. Kr is deliberately non-uniform (0.3/0.6/0.9) so a dropped
    atten shows as a large per-channel error (VERDICT r4 weak #4: atten was
    silently ignored on the simple path)."""
    import numpy as np

    from raytrace_tpu.oracle import cpu_reference as orc
    from raytrace_tpu.scene import transform as tr
    from raytrace_tpu.scene.builder import SceneBuilder

    from tests.scenes import quad

    kr = (0.3, 0.6, 0.9)
    b = SceneBuilder()
    m_floor = b.matte((0.7, 0.7, 0.7))
    m_ball = b.mirror(kr)
    verts, idx = quad([-10, -10, 0], [10, -10, 0], [10, 10, 0], [-10, 10, 0])
    b.triangle_mesh(verts, idx, material=m_floor)
    b.sphere(radius=1.0, material=m_ball,
             object_to_world=tr.translate(0, 0, 1))
    b.point_light((3.0, -2.0, 5.0), (60.0, 60.0, 60.0))
    scene = b.build()

    mats = [orc.OMaterial(0, np.array([0.7, 0.7, 0.7])),
            orc.OMaterial(1, np.array(kr))]
    tris = [orc.OTriangle(verts[i0], verts[i1], verts[i2], mat=0)
            for i0, i1, i2 in idx]
    spheres = [orc.OSphere(np.array([0.0, 0.0, 1.0]), 1.0, mat=1)]
    lights = [orc.OLight(0, np.array([3.0, -2.0, 5.0]),
                         np.array([60.0, 60.0, 60.0]))]
    oracle = orc.OScene(tris, spheres, [], mats, lights)
    c2w = tr.look_at((4.0, -4.0, 2.5), (0.0, 0.0, 1.0), (0.0, 0.0, 1.0))

    cam = PerspectiveCamera.make(c2w, FOV, SIZE, SIZE)
    config = RenderConfig(width=SIZE, height=SIZE, spp=1, scene_epsilon=1e-3)
    img = np.asarray(
        render_simple(scene, cam, config, jax.random.PRNGKey(0),
                      jitter=False)
    )
    ref = orc.render_direct(
        oracle, c2w, FOV, SIZE, SIZE, scene_eps=1e-3, include_emitted=False
    )
    err = np.abs(img - ref)
    bad = np.mean(np.any(err > 5e-3 * np.maximum(1.0, np.abs(ref)), axis=-1))
    assert bad < 0.015, f"{bad:.3%} of pixels disagree with the oracle"
    assert img_util.rmse(img, ref) < 2e-2
    # the reflection must actually be attenuated per-channel: reflected
    # pixels carry more blue (kr_b=0.9) than red (kr_r=0.3)
    assert img[..., 2].sum() > img[..., 0].sum()


def test_simple_render_spp_antialiases():
    scene, _, c2w = sphere_plane_scene()
    cam = PerspectiveCamera.make(c2w, FOV, SIZE, SIZE)
    c1 = RenderConfig(width=SIZE, height=SIZE, spp=1, scene_epsilon=1e-3)
    c4 = RenderConfig(width=SIZE, height=SIZE, spp=4, scene_epsilon=1e-3)
    img1 = np.asarray(render_simple(scene, cam, c1, jax.random.PRNGKey(1)))
    img4 = np.asarray(render_simple(scene, cam, c4, jax.random.PRNGKey(1)))
    assert img_util.rmse(img1, img4) < 0.1  # same scene, similar content
    assert not np.allclose(img1, img4)  # but actually different sampling
