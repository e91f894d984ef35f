"""Image I/O: EXR (the reference's film output format,
photonmappingrenderer.cpp:283) and PFM round trips."""
import numpy as np

from raytrace_tpu.utils import image as img_io


def _hdr_image(h=33, w=47):
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 40, (h, w, 3)).astype(np.float32)
    img[0, 0] = 0.0
    img[1, 2] = [1e-8, 123456.0, 0.25]  # HDR range survives (no 8-bit clip)
    return img


def test_exr_round_trip(tmp_path):
    img = _hdr_image()
    path = str(tmp_path / "t.exr")
    img_io.write_exr(path, img)
    back = img_io.read_exr(path)
    np.testing.assert_array_equal(back, img)  # FLOAT channels: lossless
    with open(path, "rb") as f:
        head = f.read(8)
    assert head[:4] == b"\x76\x2f\x31\x01"  # OpenEXR magic
    assert head[4] == 2  # version 2, scanline


def test_pfm_round_trip(tmp_path):
    img = _hdr_image(17, 29)
    path = str(tmp_path / "t.pfm")
    img_io.write_pfm(path, img)
    np.testing.assert_array_equal(img_io.read_pfm(path), img)
