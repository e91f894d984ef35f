"""Film reconstruction filters (utils/film.splat).

The reference splats through pbrt's Film::AddSample, which applies the
scene's PixelFilter (photonmappingrenderer.cpp:269); splat_box is pbrt's
default box filter and `splat` adds triangle/gaussian.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from raytrace_tpu.utils import film

W = H = 16


def _impulse(px=8, py=8, v=1.0):
    """One bright sample at the center of pixel (px, py), plus a zero sample
    in every pixel so the normalization has full coverage."""
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    xy = np.stack([xx.ravel() + 0.5, yy.ravel() + 0.5], -1).astype(np.float32)
    L = np.zeros((W * H, 3), np.float32)
    L[py * W + px] = v
    return jnp.asarray(xy), jnp.asarray(L)


def test_box_filter_is_splat_box():
    xy, L = _impulse()
    a = film.splat(xy, L, W, H, "box")
    b = film.splat_box(xy, L, W, H)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("ftype", ["triangle", "gaussian"])
def test_filter_spreads_impulse(ftype):
    xy, L = _impulse()
    img = np.asarray(film.splat(xy, L, W, H, ftype))
    box = np.asarray(film.splat_box(xy, L, W, H))
    assert (box.sum(-1) > 0).sum() == 1  # box: exactly the one pixel
    lit = (img.sum(-1) > 1e-6).sum()
    assert lit > 4, lit  # filter support covers neighbors
    # center keeps the peak
    assert img[8, 8, 0] == img.max()
    # radially symmetric
    np.testing.assert_allclose(img[8, 7], img[8, 9], rtol=1e-5)
    np.testing.assert_allclose(img[7, 8], img[9, 8], rtol=1e-5)


@pytest.mark.parametrize("ftype", ["box", "triangle", "gaussian"])
def test_constant_field_is_preserved(ftype):
    """Weight normalization: a uniform radiance field must reconstruct to
    the same constant under ANY filter (pbrt's sum-of-weights division)."""
    xy, _ = _impulse()
    L = jnp.full((W * H, 3), 0.7, jnp.float32)
    img = np.asarray(film.splat(xy, L, W, H, ftype))
    np.testing.assert_allclose(img, 0.7, rtol=1e-5)


def test_triangle_weights_match_definition():
    """One sample at a pixel center with radius 2: the 1-away neighbor's
    weight relative to the center is (2-1)²/(2-0)² = 1/4 of the center's
    BEFORE normalization; with one zero-sample per pixel the normalized
    image divides each tap by its weight sum, so check the raw ratio via a
    sample field with only the impulse."""
    xy = jnp.asarray([[8.5, 8.5]], jnp.float32)
    L = jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32)
    img = np.asarray(film.splat(xy, L, W, H, "triangle"))
    # single sample: normalization divides by the tap's own weight → every
    # covered pixel reconstructs the full radiance
    assert img[8, 8, 0] == pytest.approx(1.0)
    assert img[8, 9, 0] == pytest.approx(1.0)


def test_unknown_filter_raises():
    xy, L = _impulse()
    with pytest.raises(ValueError):
        film.splat(xy, L, W, H, "lanczos")
