"""pbrt scene-file ingestion: the parsed Cornell box must produce the SAME
scene tables as the programmatic preset (the reference's input path is pbrt
files, /root/reference/README:12), plus parser unit behaviors: transforms,
instancing, graceful degradation on unsupported statements."""
import os
import warnings

import jax
import numpy as np
import pytest

from raytrace_tpu.scene import presets
from raytrace_tpu.scene.pbrt import load_pbrt, loads_pbrt

EXAMPLE = os.path.join(os.path.dirname(__file__), "..", "examples",
                       "cornell.pbrt")


def test_cornell_pbrt_matches_preset():
    parsed = load_pbrt(EXAMPLE)
    scene_ref, cam_ref = presets.cornell_box(size=128, ball="glass")

    assert parsed.width == 128 and parsed.height == 128
    assert parsed.renderer == "photonmapping"
    s, r = parsed.scene, scene_ref
    np.testing.assert_allclose(np.asarray(s.tris.v0), np.asarray(r.tris.v0),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.tris.v1), np.asarray(r.tris.v1),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s.tris.mat),
                                  np.asarray(r.tris.mat))
    np.testing.assert_allclose(np.asarray(s.materials.kd),
                               np.asarray(r.materials.kd), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s.materials.mtype),
                                  np.asarray(r.materials.mtype))
    np.testing.assert_allclose(np.asarray(s.spheres.radius),
                               np.asarray(r.spheres.radius), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.spheres.o2w),
                               np.asarray(r.spheres.o2w), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.lights.o), np.asarray(r.lights.o),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.lights.intensity),
                               np.asarray(r.lights.intensity), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.disks.o), np.asarray(r.disks.o),
                               atol=1e-6)
    # camera: same camera-to-world
    np.testing.assert_allclose(np.asarray(parsed.camera.camera_to_world),
                               np.asarray(cam_ref.camera_to_world),
                               atol=1e-6)


def test_parsed_scene_renders():
    from raytrace_tpu.core.config import RenderConfig
    from raytrace_tpu.renderers.simple import render_simple

    parsed = load_pbrt(EXAMPLE)
    config = RenderConfig(width=parsed.width, height=parsed.height, spp=1,
                          scene_epsilon=1e-3)
    img = render_simple(parsed.scene, parsed.camera, config,
                        jax.random.PRNGKey(0), jitter=False)
    assert np.isfinite(np.asarray(img)).all()
    assert float(np.asarray(img).mean()) > 0.0


def test_transform_stack_and_instancing():
    text = """
    Film "image" "integer xresolution" [8] "integer yresolution" [8]
    WorldBegin
    Material "matte" "rgb Kd" [0.5 0.5 0.5]
    ObjectBegin "ball"
      Shape "sphere" "float radius" [2]
    ObjectEnd
    AttributeBegin
      Translate 5 0 0
      ObjectInstance "ball"
    AttributeEnd
    AttributeBegin
      Translate 0 7 0
      Scale 2 2 2
      ObjectInstance "ball"
    AttributeEnd
    LightSource "point" "rgb I" [10 10 10] "point from" [0 0 5]
    WorldEnd
    """
    parsed = loads_pbrt(text)
    s = parsed.scene
    assert s.spheres.count == 2
    np.testing.assert_allclose(np.asarray(s.spheres.o2w[0, :, 3]),
                               [5.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.spheres.o2w[1, :, 3]),
                               [0.0, 7.0, 0.0], atol=1e-6)
    # scaled instance: linear part is 2*I
    np.testing.assert_allclose(np.asarray(s.spheres.o2w[1, :, :3]),
                               2 * np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.lights.o[0]), [0, 0, 5],
                               atol=1e-6)


def test_unsupported_statements_warn_not_crash():
    text = """
    Film "image" "integer xresolution" [8] "integer yresolution" [8]
    WorldBegin
    Material "plastic" "rgb Kd" [0.3 0.3 0.3]
    Shape "cone" "float radius" [1]
    LightSource "spot" "rgb I" [1 1 1]
    Material "matte" "rgb Kd" [0.4 0.4 0.4]
    Shape "sphere" "float radius" [1]
    WorldEnd
    """
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        parsed = loads_pbrt(text)
    msgs = " ".join(str(x.message) for x in w)
    assert "plastic" in msgs and "cone" in msgs and "spot" in msgs
    assert parsed.scene.spheres.count == 1
    # the unknown material fell back to matte 0.5 (cudamaterial.h:29-31)
    np.testing.assert_allclose(np.asarray(parsed.scene.materials.kd[0]),
                               [0.5, 0.5, 0.5])


def test_lookat_and_fov():
    text = """
    LookAt 1 2 3  4 5 6  0 0 1
    Camera "perspective" "float fov" [42.5]
    Film "image" "integer xresolution" [32] "integer yresolution" [16]
    WorldBegin
    WorldEnd
    """
    parsed = loads_pbrt(text)
    assert parsed.width == 32 and parsed.height == 16
    from raytrace_tpu.scene import transform as tr

    expect = tr.look_at((1, 2, 3), (4, 5, 6), (0, 0, 1))
    np.testing.assert_allclose(
        np.asarray(parsed.camera.camera_to_world)[:, 3], expect[:3, 3],
        atol=1e-5)


def test_texture_checkerboard_maps_to_checker_seam():
    """'Texture' + 'texture Kd' reference → material-table checker entry
    (the reference stubs textures to constants, cudatexture.cu.h:7-9)."""
    import numpy as np

    from raytrace_tpu.scene.pbrt import loads_pbrt

    text = """
    Film "image" "integer xresolution" [32] "integer yresolution" [32]
    Camera "perspective" "float fov" [45]
    WorldBegin
    Texture "checks" "spectrum" "checkerboard"
        "rgb tex1" [0.8 0.6 0.4] "float uscale" [4]
    Material "matte" "texture Kd" "checks"
    Shape "trianglemesh"
        "integer indices" [0 1 2]
        "point P" [-1 -1 0  1 -1 0  0 1 0]
    LightSource "point" "rgb I" [10 10 10] "point from" [0 0 5]
    WorldEnd
    """
    out = loads_pbrt(text)
    mats = out.scene.materials
    m = int(out.scene.tris.mat[0])
    assert int(mats.tex_type[m]) == 1
    assert float(mats.tex_scale[m]) == 4.0
    np.testing.assert_allclose(np.asarray(mats.kd[m]), [0.8, 0.6, 0.4],
                               rtol=1e-6)


def test_camera_dof_and_pixel_filter_wired():
    """lensradius/focaldistance reach the PerspectiveCamera and PixelFilter
    reaches PbrtScene (both were parsed-and-dropped, VERDICT r4 missing
    #2/#3)."""
    text = """
    LookAt 0 0 0  0 1 0  0 0 1
    Camera "perspective" "float fov" [45]
        "float lensradius" [0.125] "float focaldistance" [3.5]
    PixelFilter "triangle" "float xwidth" [2]
    Film "image" "integer xresolution" [8] "integer yresolution" [8]
    WorldBegin
    Material "matte" "rgb Kd" [0.5 0.5 0.5]
    Shape "sphere" "float radius" [1]
    WorldEnd
    """
    parsed = loads_pbrt(text)
    assert float(parsed.camera.lens_radius) == 0.125
    assert float(parsed.camera.focal_distance) == 3.5
    assert parsed.pixel_filter == "triangle"


def test_reverse_orientation_scoped_by_attribute_blocks():
    """ReverseOrientation inside AttributeBegin/End must not leak out, and
    must flip the shapes it covers (pbrt graphics-state semantics)."""
    text = """
    Film "image" "integer xresolution" [8] "integer yresolution" [8]
    WorldBegin
    Material "matte" "rgb Kd" [0.5 0.5 0.5]
    AttributeBegin
      ReverseOrientation
      Shape "trianglemesh" "point P" [-1 0 -1  1 0 -1  1 0 1]
        "integer indices" [0 1 2]
    AttributeEnd
    Shape "trianglemesh" "point P" [-1 2 -1  1 2 -1  1 2 1]
      "integer indices" [0 1 2]
    WorldEnd
    """
    parsed = loads_pbrt(text)
    tris = parsed.scene.tris
    assert tris.count == 2
    n0 = np.asarray(tris.n0)
    # same geometry, opposite winding → opposite geometric normals
    np.testing.assert_allclose(n0[0], -n0[1], atol=1e-6)
