"""SampleLayout — the CudaSample request-flattening counterpart
(reference: util/sampler/cudasample.{h,cpp}): offsets, stratification, and
the sharding-invariant draw contract.
"""
import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.core.samples import SampleLayout, strata_2d


def test_offsets_running():
    lay = SampleLayout()
    assert lay.add_2d(4) == 0
    assert lay.add_2d(1) == 4
    assert lay.add_2d(2) == 5
    assert lay.total_2d == 7
    assert lay.add_1d(3) == 0
    assert lay.add_1d(2) == 3
    assert lay.total_1d == 5


def test_strata_grid():
    assert strata_2d(1) == (1, 1)
    assert strata_2d(4) == (2, 2)
    assert strata_2d(8) == (2, 4)
    assert strata_2d(3) == (3, 1)


def test_materialize_shapes_and_ranges():
    lay = SampleLayout()
    lay.add_2d(4)
    lay.add_2d(2)
    ids = jnp.arange(128, dtype=jnp.uint32)
    s2 = lay.materialize_2d(jax.random.PRNGKey(0), ids)
    assert s2.shape == (128, 6, 2)
    a = np.asarray(s2)
    assert (a >= 0.0).all() and (a < 1.0).all()
    # stratification: request 0 uses a 2x2 grid — sample s lives in its cell
    sx, sy = 2, 2
    for s in range(4):
        kx, ky = s % sx, s // sx
        assert (a[:, s, 0] >= kx / sx).all() and (a[:, s, 0] < (kx + 1) / sx).all()
        assert (a[:, s, 1] >= ky / sy).all() and (a[:, s, 1] < (ky + 1) / sy).all()

    lay1 = SampleLayout()
    lay1.add_1d(3)
    s1 = lay1.materialize_1d(jax.random.PRNGKey(0), ids)
    assert s1.shape == (128, 3)
    b = np.asarray(s1)
    for s in range(3):
        assert (b[:, s] >= s / 3).all() and (b[:, s] < (s + 1) / 3).all()


def test_sharding_invariance():
    """Uniforms are a pure function of (key, draw order, GLOBAL id): a shard
    holding ids [64:128] must draw the same numbers as rows 64:128 of the
    full batch."""
    lay_a = SampleLayout()
    lay_a.add_2d(2)
    full = lay_a.materialize_2d(
        jax.random.PRNGKey(7), jnp.arange(128, dtype=jnp.uint32)
    )
    lay_b = SampleLayout()
    lay_b.add_2d(2)
    shard = lay_b.materialize_2d(
        jax.random.PRNGKey(7), jnp.arange(64, 128, dtype=jnp.uint32)
    )
    np.testing.assert_array_equal(np.asarray(full)[64:], np.asarray(shard))


def test_empty_layout():
    lay = SampleLayout()
    ids = jnp.arange(8, dtype=jnp.uint32)
    assert lay.materialize_2d(jax.random.PRNGKey(0), ids).shape == (8, 0, 2)
    assert lay.materialize_1d(jax.random.PRNGKey(0), ids).shape == (8, 0)
