"""Hash-grid radius search vs brute-force — must be exact (the reference's
kd-tree gather is exact within r², gathering.cu:40-42; the grid must be too)."""
import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.ops import photon_grid as pg


def make_photons(n, seed=0, box=2.0, n_invalid=0):
    rng = np.random.default_rng(seed)
    p = rng.uniform(-box, box, (n, 3)).astype(np.float32)
    alpha = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    wi = rng.normal(size=(n, 3)).astype(np.float32)
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    valid = np.ones(n, bool)
    if n_invalid:
        valid[rng.choice(n, n_invalid, replace=False)] = False
    return pg.PhotonMap(
        p=jnp.asarray(p), alpha=jnp.asarray(alpha),
        wi=jnp.asarray(wi), valid=jnp.asarray(valid),
    )


def brute_force(photons, q_p, r2, q_ns, q_kd_over_pi):
    p = np.asarray(photons.p, np.float64)
    alpha = np.asarray(photons.alpha, np.float64)
    wi = np.asarray(photons.wi, np.float64)
    valid = np.asarray(photons.valid)
    acc = np.zeros((len(q_p), 3))
    m = np.zeros(len(q_p), np.int64)
    for i, (q, r, ns, kd) in enumerate(zip(q_p, r2, q_ns, q_kd_over_pi)):
        d2 = np.sum((p - q) ** 2, -1)
        sel = valid & (d2 < r)
        m[i] = sel.sum()
        contrib = np.abs(wi[sel] @ ns) [:, None] * kd[None, :] * alpha[sel]
        acc[i] = contrib.sum(0)
    return acc, m


def test_gather_exact_vs_bruteforce():
    photons = make_photons(2000, seed=3, n_invalid=200)
    grid = pg.build_photon_grid(photons, cell_size=0.5)
    assert int(grid.n_valid) == 1800

    rng = np.random.default_rng(7)
    nq = 64
    q_p = rng.uniform(-2, 2, (nq, 3)).astype(np.float32)
    r2 = rng.uniform(0.01, 0.25, nq).astype(np.float32)  # r ≤ cell_size
    q_ns = rng.normal(size=(nq, 3)).astype(np.float32)
    q_ns /= np.linalg.norm(q_ns, axis=-1, keepdims=True)
    q_kd = rng.uniform(0, 1, (nq, 3)).astype(np.float32)

    occ = int(pg.max_cell_occupancy(grid))
    acc, m = pg.gather_radius(
        grid, jnp.asarray(q_p), jnp.asarray(r2), jnp.asarray(q_ns),
        jnp.asarray(-q_ns), jnp.asarray(q_kd), max_per_cell=max(32, occ),
    )
    ref_acc, ref_m = brute_force(photons, q_p, r2, q_ns, q_kd)
    np.testing.assert_array_equal(np.asarray(m), ref_m)
    np.testing.assert_allclose(np.asarray(acc), ref_acc, rtol=1e-4, atol=1e-5)


def test_occupancy_counts_runs():
    # 5 photons in the same cell, 3 elsewhere
    p = np.array([[0.1, 0.1, 0.1]] * 5 + [[3, 3, 3], [5, 5, 5], [7, 7, 7]],
                 np.float32)
    photons = pg.PhotonMap(
        p=jnp.asarray(p), alpha=jnp.zeros((8, 3)), wi=jnp.zeros((8, 3)),
        valid=jnp.ones(8, bool),
    )
    grid = pg.build_photon_grid(photons, cell_size=1.0)
    assert int(pg.max_cell_occupancy(grid)) == 5


def test_all_invalid_photons():
    photons = make_photons(100, seed=1, n_invalid=100)
    grid = pg.build_photon_grid(photons, cell_size=1.0)
    assert int(grid.n_valid) == 0
    assert int(pg.max_cell_occupancy(grid)) == 0
    acc, m = pg.gather_radius(
        grid, jnp.zeros((4, 3)), jnp.ones(4), jnp.zeros((4, 3)),
        jnp.zeros((4, 3)), jnp.ones((4, 3)),
    )
    assert np.all(np.asarray(m) == 0)
    assert np.all(np.asarray(acc) == 0)
