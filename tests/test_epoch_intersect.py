"""Epoch-subtile intersector (ops/epoch_intersect.py) vs a brute-force
oracle — interpret mode on CPU. Covers: exactness on incoherent ray mixes
(the failure mode the engine exists to fix), tmin/tmax windows, rays
starting inside clusters (epoch-boundary straddlers), miss rays, agreement
with the round-3 cluster engine, and budget-overflow counting."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytrace_tpu.ops import cluster_intersect as ci
from raytrace_tpu.ops import epoch_intersect as ei

BIG = ci.BIG


def _random_tris(n, rng, spread=4.0, size=0.5):
    c = (rng.random((n, 3)) * 2 - 1) * spread
    v0 = c + (rng.random((n, 3)) - 0.5) * size
    v1 = c + (rng.random((n, 3)) - 0.5) * size
    v2 = c + (rng.random((n, 3)) - 0.5) * size
    return (v0.astype(np.float32), v1.astype(np.float32),
            v2.astype(np.float32))


def _brute(v0, v1, v2, o, d, tmin, tmax):
    """Closest-hit oracle (numpy, all pairs)."""
    e1 = v1 - v0
    e2 = v2 - v0
    pv = np.cross(d[:, None, :], e2[None, :, :])
    det = np.sum(e1[None] * pv, -1)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(det != 0, 1.0 / np.where(det == 0, 1.0, det), 0.0)
        tv = o[:, None, :] - v0[None, :, :]
        b = np.sum(tv * pv, -1) * inv
        qv = np.cross(tv, e1[None, :, :])
        g = np.sum(d[:, None, :] * qv, -1) * inv
        t = np.sum(e2[None] * qv, -1) * inv
    ok = ((det != 0) & (b >= 0) & (g >= 0) & (b + g <= 1)
          & (t > tmin[:, None]) & (t < tmax[:, None]))
    t = np.where(ok, t, BIG)
    return t.min(1), t.argmin(1)


def _rays(n, rng, spread=6.0):
    o = ((rng.random((n, 3)) * 2 - 1) * spread).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def _run(clusters, o, d, tmin, tmax, **kw):
    kw.setdefault("interpret", True)
    kw.setdefault("round_size", 256)
    return ei.intersect_epochs(
        clusters, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.asarray(tmax), **kw)


def _check(v0, v1, v2, t, idx, o, d, tmin, tmax, t_ref):
    """t must match the oracle; the winner triangle must reproduce t."""
    t = np.asarray(t)
    np.testing.assert_allclose(t, t_ref, rtol=2e-5, atol=1e-5)
    hit = t_ref < BIG
    if hit.any():
        i = np.asarray(idx)[hit]
        th, _ = _brute(v0[i][:, None].squeeze(1)[None].squeeze(0),
                       v1[i], v2[i], o[hit], d[hit], tmin[hit], tmax[hit])
        # th here is each ray vs ALL winner tris; check its own triangle
        e1 = v1[i] - v0[i]
        e2 = v2[i] - v0[i]
        pv = np.cross(d[hit], e2)
        det = np.sum(e1 * pv, -1)
        tv = o[hit] - v0[i]
        own_t = np.sum(e2 * np.cross(tv, e1), -1) / det
        np.testing.assert_allclose(own_t, t_ref[hit], rtol=2e-4, atol=1e-4)


class TestEpochIntersect:
    def test_matches_oracle_incoherent(self):
        rng = np.random.default_rng(0)
        v0, v1, v2 = _random_tris(700, rng)
        cs = ci.build_clusters(v0, v1, v2, cluster_size=128)
        o, d = _rays(300, rng)
        tmin = np.full(300, 1e-3, np.float32)
        tmax = np.full(300, BIG, np.float32)
        t_ref, _ = _brute(v0, v1, v2, o, d, tmin, tmax)
        t, idx, n_sp, ovf = _run(cs, o, d, tmin, tmax)
        assert int(ovf) == 0
        assert int(n_sp) > 0
        _check(v0, v1, v2, t, idx, o, d, tmin, tmax, t_ref)

    def test_rays_starting_inside_geometry(self):
        """Origins ON surfaces with short hits — epoch-0 window straddlers
        and tnc clamping."""
        rng = np.random.default_rng(1)
        v0, v1, v2 = _random_tris(500, rng, spread=2.0, size=1.5)
        cs = ci.build_clusters(v0, v1, v2, cluster_size=128)
        # origins at triangle centroids (inside cluster AABBs)
        pick = rng.integers(0, 500, size=200)
        o = ((v0[pick] + v1[pick] + v2[pick]) / 3).astype(np.float32)
        d = rng.standard_normal((200, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        tmin = np.full(200, 1e-3, np.float32)
        tmax = np.full(200, BIG, np.float32)
        t_ref, _ = _brute(v0, v1, v2, o, d, tmin, tmax)
        t, idx, _, ovf = _run(cs, o, d, tmin, tmax)
        assert int(ovf) == 0
        _check(v0, v1, v2, t, idx, o, d, tmin, tmax, t_ref)

    def test_tmin_tmax_windows(self):
        rng = np.random.default_rng(2)
        v0, v1, v2 = _random_tris(400, rng)
        cs = ci.build_clusters(v0, v1, v2, cluster_size=128)
        o, d = _rays(200, rng)
        tmin = (0.5 + rng.random(200) * 2).astype(np.float32)
        tmax = tmin + (rng.random(200) * 6).astype(np.float32)
        t_ref, _ = _brute(v0, v1, v2, o, d, tmin, tmax)
        t, idx, _, ovf = _run(cs, o, d, tmin, tmax)
        assert int(ovf) == 0
        _check(v0, v1, v2, t, idx, o, d, tmin, tmax, t_ref)

    def test_epoch_count_invariance(self):
        """Results must be identical at any window count — the epoch
        partition is a pure work-scheduling choice."""
        rng = np.random.default_rng(9)
        v0, v1, v2 = _random_tris(500, rng)
        cs = ci.build_clusters(v0, v1, v2, cluster_size=128)
        o, d = _rays(192, rng)
        tmin = np.full(192, 1e-3, np.float32)
        tmax = np.full(192, BIG, np.float32)
        t2, _, _, _ = _run(cs, o, d, tmin, tmax, n_epochs=2)
        t1, _, _, _ = _run(cs, o, d, tmin, tmax, n_epochs=1)
        t4, _, _, _ = _run(cs, o, d, tmin, tmax, n_epochs=4)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t1),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t4),
                                   rtol=1e-6, atol=1e-6)

    def test_matches_cluster_engine(self):
        rng = np.random.default_rng(3)
        v0, v1, v2 = _random_tris(600, rng)
        cs = ci.build_clusters(v0, v1, v2, cluster_size=128)
        o, d = _rays(256, rng)
        tmin = np.full(256, 1e-3, np.float32)
        tmax = np.full(256, BIG, np.float32)
        t_new, _, _, _ = _run(cs, o, d, tmin, tmax)
        t_old, _, _, ovf_old = ci.intersect_clusters(
            cs, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
            jnp.asarray(tmax), interpret=True, rounds=4)
        assert int(ovf_old) == 0
        np.testing.assert_allclose(np.asarray(t_new), np.asarray(t_old),
                                   rtol=2e-5, atol=1e-5)

    def test_all_miss(self):
        rng = np.random.default_rng(4)
        v0, v1, v2 = _random_tris(300, rng)
        cs = ci.build_clusters(v0, v1, v2, cluster_size=128)
        o = np.full((64, 3), 50.0, np.float32)  # far outside
        d = np.tile(np.array([[1.0, 0, 0]], np.float32), (64, 1))
        tmin = np.full(64, 1e-3, np.float32)
        tmax = np.full(64, BIG, np.float32)
        t, idx, _, ovf = _run(cs, o, d, tmin, tmax)
        assert int(ovf) == 0
        assert (np.asarray(t) >= BIG).all()

    def test_overflow_counted_and_defined(self):
        """A starved budget must COUNT the deficit and still return defined
        (miss-or-correct) results — never garbage."""
        rng = np.random.default_rng(5)
        v0, v1, v2 = _random_tris(800, rng)
        cs = ci.build_clusters(v0, v1, v2, cluster_size=128)
        o, d = _rays(512, rng)
        tmin = np.full(512, 1e-3, np.float32)
        tmax = np.full(512, BIG, np.float32)
        t_full, _, n_sp, ovf0 = _run(cs, o, d, tmin, tmax)
        assert int(ovf0) == 0
        t_cut, idx, _, ovf = _run(cs, o, d, tmin, tmax,
                                  budget_scale=1e-3, round_size=256)
        assert int(ovf) > 0
        tc = np.asarray(t_cut)
        tf = np.asarray(t_full)
        # truncated results are a superset of misses: every reported hit is
        # a real triangle hit at the true distance or farther
        hit = tc < BIG
        assert (tc[hit] >= tf[hit] - 1e-4).all()

    def test_mixed_bounce_population(self):
        """Coherent + incoherent mix at a few thousand rays (multi-tile,
        multi-round) — the shape of a real photon bounce wave."""
        rng = np.random.default_rng(6)
        v0, v1, v2 = _random_tris(1500, rng)
        cs = ci.build_clusters(v0, v1, v2, cluster_size=128)
        n = 1024
        o1, d1 = _rays(n // 2, rng)
        o2 = np.tile(np.array([[0.0, 0, 8.0]], np.float32), (n // 2, 1))
        d2 = rng.standard_normal((n // 2, 3)).astype(np.float32)
        d2[:, 2] = -np.abs(d2[:, 2]) - 0.2
        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
        o = np.concatenate([o1, o2])
        d = np.concatenate([d1, d2])
        tmin = np.full(n, 1e-3, np.float32)
        tmax = np.full(n, BIG, np.float32)
        t_ref, _ = _brute(v0, v1, v2, o, d, tmin, tmax)
        t, idx, _, ovf = _run(cs, o, d, tmin, tmax)
        assert int(ovf) == 0
        _check(v0, v1, v2, t, idx, o, d, tmin, tmax, t_ref)
