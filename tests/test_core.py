"""Unit tests for core vector math and sampling primitives against numpy
float64 references."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytrace_tpu.core import sampling, spectrum, vec


def rnd(shape, seed=0, lo=-1.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, shape).astype(np.float32)


class TestVec:
    def test_dot_cross(self):
        a, b = rnd((64, 3), 1), rnd((64, 3), 2)
        np.testing.assert_allclose(vec.dot(a, b), np.sum(a * b, -1), rtol=1e-5)
        np.testing.assert_allclose(vec.cross(a, b), np.cross(a, b), rtol=1e-4, atol=1e-6)

    def test_normalize(self):
        v = rnd((64, 3), 3)
        n = np.asarray(vec.normalize(v))
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)

    def test_frame_roundtrip(self):
        ns = np.asarray(vec.normalize(rnd((32, 3), 4)))
        dpdu = rnd((32, 3), 5)
        nn, sn, tn = vec.shading_frame(ns, dpdu)
        v = np.asarray(vec.normalize(rnd((32, 3), 6)))
        local = vec.world_to_local(v, nn, sn, tn)
        # z component is the cosine with the normal
        np.testing.assert_allclose(
            local[..., 2], np.sum(v * np.asarray(nn), -1), rtol=2e-4, atol=1e-6
        )

    def test_transform_point(self):
        m = np.concatenate([np.eye(3), np.array([[1.0], [2.0], [3.0]])], 1).astype(
            np.float32
        )
        p = rnd((8, 3), 7)
        np.testing.assert_allclose(
            vec.transform_point(m, p), p + np.array([1, 2, 3], np.float32), rtol=1e-6
        )


class TestSampling:
    def test_concentric_disk_in_unit_disk(self):
        u = rnd((4096, 2), 8, 0.0, 1.0)
        dx, dy = sampling.concentric_sample_disk(u[:, 0], u[:, 1])
        r2 = np.asarray(dx) ** 2 + np.asarray(dy) ** 2
        assert np.all(r2 <= 1.0 + 1e-5)
        # area-preserving: mean radius² of uniform disk = 1/2
        assert abs(float(np.mean(r2)) - 0.5) < 0.02

    def test_concentric_disk_reference_values(self):
        # hand-computed from the pbrt region logic (util/util.cu.h:23-65)
        dx, dy = sampling.concentric_sample_disk(
            jnp.array([1.0, 0.5, 0.0]), jnp.array([0.5, 0.5, 0.5])
        )
        np.testing.assert_allclose(np.asarray(dx), [1.0, 0.0, -1.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(dy), [0.0, 0.0, 0.0], atol=2e-7)

    def test_cosine_hemisphere(self):
        u = rnd((4096, 2), 9, 0.0, 1.0)
        w = np.asarray(sampling.cosine_sample_hemisphere(u[:, 0], u[:, 1]))
        assert np.all(w[:, 2] >= 0.0)
        np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-4)
        # E[cos θ] for cosine-weighted = 2/3
        assert abs(w[:, 2].mean() - 2.0 / 3.0) < 0.02

    def test_uniform_sphere(self):
        u = rnd((8192, 2), 10, 0.0, 1.0)
        w = np.asarray(sampling.uniform_sample_sphere(u[:, 0], u[:, 1]))
        np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-4)
        assert abs(w.mean(0)).max() < 0.05

    def test_radical_inverse_base2(self):
        ident = jnp.arange(2, dtype=jnp.int32)
        out = sampling.permuted_radical_inverse(
            jnp.array([1, 2, 3, 4], jnp.uint32), 2, ident
        )
        np.testing.assert_allclose(np.asarray(out), [0.5, 0.25, 0.75, 0.125], atol=1e-7)

    def test_radical_inverse_base3_permuted(self):
        perm = jnp.array([1, 2, 0], jnp.int32)  # digit d → perm[d]
        out = sampling.permuted_radical_inverse(jnp.array([1, 3], jnp.uint32), 3, perm)
        # n=1: digits [1] → perm 2 → 2/3 ; n=3: digits [0,1] → 1/3·... :
        #   d0=0→perm 1 → 1/3, d1=1→perm 2 → 2/9 → 1/3+2/9
        np.testing.assert_allclose(np.asarray(out), [2 / 3, 1 / 3 + 2 / 9], atol=1e-6)

    def test_halton_4d_range(self):
        key = jax.random.PRNGKey(0)
        perms = sampling.halton_permutations(key)
        n = jnp.arange(0, 1024, dtype=jnp.uint32)
        s = np.asarray(sampling.halton_sample_4d(n, perms))
        assert s.shape == (1024, 4)
        assert np.all((s >= 0.0) & (s < 1.0))
        # low-discrepancy over consecutive indices: each dim mean ≈ 0.5
        # (loose: the radical-inverse loop drops the perm[0] tail, exactly
        # like the reference device version, photontracing.cu:19-31)
        assert np.all(np.abs(s.mean(0) - 0.5) < 0.1)


class TestSpectrum:
    def test_sanitize(self):
        s = jnp.array([[1.0, 2.0, 3.0], [jnp.nan, 0, 0], [-5.0, 0, 0], [jnp.inf, 0, 0]])
        out = np.asarray(spectrum.sanitize(s))
        np.testing.assert_allclose(out[0], [1, 2, 3])
        assert np.all(out[1:] == 0.0)


def test_oracle_sphere_o2w_guard():
    """osphere_from_o2w accepts translate+uniform-scale and REJECTS rotated /
    non-uniform transforms instead of silently comparing against a wrong
    oracle (the oracle sphere is analytic in world space)."""
    import numpy as np
    import pytest

    from raytrace_tpu.oracle.cpu_reference import osphere_from_o2w

    t = np.eye(4)
    t[:3, 3] = [1.0, 2.0, 3.0]
    t[:3, :3] *= 2.0
    s = osphere_from_o2w(t, radius=0.5, mat=0)
    np.testing.assert_allclose(s.center, [1.0, 2.0, 3.0])
    assert abs(s.radius - 1.0) < 1e-12

    rot = np.eye(4)
    c, si = np.cos(0.3), np.sin(0.3)
    rot[:2, :2] = [[c, -si], [si, c]]
    with pytest.raises(ValueError):
        osphere_from_o2w(rot, radius=0.5, mat=0)
    nonuni = np.diag([1.0, 2.0, 1.0, 1.0])
    with pytest.raises(ValueError):
        osphere_from_o2w(nonuni, radius=0.5, mat=0)
