"""Cluster-binned intersector (ops/cluster_intersect.py) vs the BVH and the
dense scan — interpret mode on CPU. Covers closest-hit parity, tmax windows,
pair accounting/overflow, and the empty-tile init path."""
import numpy as np
import jax
import jax.numpy as jnp

from raytrace_tpu.ops import cluster_intersect as ci
from raytrace_tpu.ops import intersect as ii
from raytrace_tpu.scene.builder import SceneBuilder


def field_scene(n_tris=4000, seed=3, use_bvh=True):
    rng = np.random.default_rng(seed)
    g = int(np.ceil(np.sqrt(n_tris / 2)))
    xs = np.linspace(-5, 5, g + 1)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    gz = 0.5 * np.sin(gx) * np.cos(gy)
    verts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    vid = np.arange((g + 1) ** 2).reshape(g + 1, g + 1)
    a, b = vid[:-1, :-1].ravel(), vid[1:, :-1].ravel()
    c, d = vid[1:, 1:].ravel(), vid[:-1, 1:].ravel()
    idx = np.concatenate([np.stack([a, b, c], -1),
                          np.stack([a, c, d], -1)])[:n_tris]
    sb = SceneBuilder()
    sb.triangle_mesh(verts, idx, material=sb.matte((0.5, 0.5, 0.5)))
    sb.point_light((0, 0, 9), (90.0, 90.0, 90.0))
    return sb.build(use_bvh=use_bvh)


def down_rays(n, seed=5, spread=5.0):
    rng = np.random.default_rng(seed)
    o = np.stack([rng.uniform(-spread, spread, n),
                  rng.uniform(-spread, spread, n),
                  np.full(n, 6.0)], -1).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_cluster_matches_bvh_closest_hit():
    scene = field_scene()
    assert scene.clusters is not None
    n = 300  # off the TILE_RAYS boundary
    o, d = down_rays(n)
    tmin = jnp.full((n,), 1e-3)
    tmax = jnp.full((n,), 1e30)
    t_c, i_c, n_pairs, overflow = ci.intersect_clusters(
        scene.clusters, o, d, tmin, tmax, pair_budget=1 << 12,
        interpret=True)
    assert int(overflow) == 0
    assert int(n_pairs) > 0

    from raytrace_tpu.ops import bvh as bvh_ops

    t_b, i_b = bvh_ops._traverse(scene.bvh, scene.tris, o, d, tmin, tmax,
                                 any_hit=False)
    np.testing.assert_allclose(np.asarray(t_c), np.asarray(t_b), rtol=1e-5)
    hit = np.asarray(t_b) < 1e29
    assert hit.any()
    np.testing.assert_array_equal(np.asarray(i_c)[hit], np.asarray(i_b)[hit])


def test_cluster_respects_tmax_window():
    scene = field_scene(seed=7)
    n = 256
    o, d = down_rays(n, seed=8)
    tmin = jnp.full((n,), 1e-3)
    tmax = jnp.full((n,), 4.0)
    t_c, _, _, _ = ci.intersect_clusters(
        scene.clusters, o, d, tmin, tmax, pair_budget=1 << 12,
        interpret=True)
    tc = np.asarray(t_c)
    assert ((tc >= 1e29) | ((tc > 1e-3) & (tc < 4.0))).all()


def test_cluster_all_miss_initializes_outputs():
    """Rays pointing away from every cluster: outputs must still read as
    misses (the seed pair guarantees every tile's block is initialized)."""
    scene = field_scene(seed=9)
    n = 512
    rng = np.random.default_rng(1)
    o = jnp.asarray(np.stack([rng.uniform(-3, 3, n),
                              rng.uniform(-3, 3, n),
                              np.full(n, 8.0)], -1).astype(np.float32))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))  # up
    t_c, _, _, _ = ci.intersect_clusters(
        scene.clusters, o, d, jnp.full((n,), 1e-3), jnp.full((n,), 1e30),
        pair_budget=1 << 12, interpret=True)
    assert (np.asarray(t_c) >= 1e29).all()


def test_pair_overflow_is_reported():
    scene = field_scene(seed=11)
    n = 512
    o, d = down_rays(n, seed=12)
    tmin = jnp.full((n,), 1e-3)
    tmax = jnp.full((n,), 1e30)
    _, _, n_pairs, _ = ci.intersect_clusters(
        scene.clusters, o, d, tmin, tmax, pair_budget=1 << 12,
        interpret=True)
    budget = 4  # absurdly small → must overflow
    _, _, n_pairs2, overflow = ci.intersect_clusters(
        scene.clusters, o, d, tmin, tmax, pair_budget=budget,
        interpret=True)
    assert int(n_pairs2) == int(n_pairs)
    assert int(overflow) == int(n_pairs) - budget


def test_builder_attaches_clusters_and_renders():
    """End-to-end: the TPU dispatch path (forced via env) renders the same
    image as the BVH path."""
    import os

    from raytrace_tpu.core.config import RenderConfig
    from raytrace_tpu.renderers.simple import render_simple
    from raytrace_tpu.scene import presets

    scene, camera = presets.triangle_field(n_triangles=2048, size=32)
    assert scene.clusters is not None
    config = RenderConfig(width=32, height=32, spp=1, scene_epsilon=1e-3)
    img_bvh = render_simple(scene, camera, config, jax.random.PRNGKey(0),
                            jitter=False)
    # force the cluster path in interpret mode by calling intersect directly
    n = 32 * 32
    from raytrace_tpu.scene.camera import generate_rays, pixel_samples

    xy, lens = pixel_samples(jax.random.PRNGKey(0), 32, 32, 1, jitter=False)
    rays = generate_rays(camera, xy, lens, 1)
    t_c, i_c, _, _ = ci.intersect_clusters(
        scene.clusters, rays.o, rays.d,
        jnp.full((n,), 1e-3), jnp.full((n,), 1e30),
        pair_budget=1 << 12, interpret=True)
    from raytrace_tpu.ops import bvh as bvh_ops

    t_b, i_b = bvh_ops._traverse(
        scene.bvh, scene.tris, rays.o, rays.d,
        jnp.full((n,), 1e-3), jnp.full((n,), 1e30), any_hit=False)
    np.testing.assert_allclose(np.asarray(t_c), np.asarray(t_b), rtol=1e-5)
    assert np.isfinite(np.asarray(img_bvh)).all()


def test_cluster_multiround_matches_single_round():
    """rounds × pair_budget capacity: a pair list overflowing one round's
    budget but fitting the total must reproduce the single-big-budget
    result exactly (min-combine across tile-major slices), and capacity
    overflow must yield a DEFINED miss for the truncated tail instead of
    uninitialized output."""
    import jax.numpy as jnp

    from raytrace_tpu.ops import cluster_intersect as ci

    scene = field_scene(n_tris=4000)
    n = 1024
    o, d = down_rays(n, seed=8)
    tmin = jnp.full((n,), 1e-3)
    tmax = jnp.full((n,), 1e30)
    t_ref, i_ref, n_pairs, ovf0 = ci.intersect_clusters(
        scene.clusters, o, d, tmin, tmax, pair_budget=1 << 14,
        interpret=True,
    )
    assert int(ovf0) == 0
    b = max(2, int(n_pairs) // 5)
    rounds = -(-int(n_pairs) // b) + 1
    t_mr, i_mr, _, ovf = ci.intersect_clusters(
        scene.clusters, o, d, tmin, tmax, pair_budget=b, rounds=rounds,
        interpret=True,
    )
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(t_mr), np.asarray(t_ref),
                               rtol=1e-6)
    hit = np.asarray(t_ref) < 1e29
    np.testing.assert_array_equal(np.asarray(i_mr)[hit],
                                  np.asarray(i_ref)[hit])

    # capacity overflow: defined miss for the dropped tail
    t_ov, _, _, ovf2 = ci.intersect_clusters(
        scene.clusters, o, d, tmin, tmax, pair_budget=b, rounds=2,
        interpret=True,
    )
    assert int(ovf2) > 0
    t_ov = np.asarray(t_ov)
    assert np.isfinite(t_ov[t_ov < 1e29]).all()
    # every returned value is either the true hit or a clean miss
    agree = (t_ov == np.asarray(t_ref)) | (t_ov >= 1e29)
    assert agree.all()


def test_cluster_tile_sizes_agree():
    """The adaptive tile-size branches (128-ray tiles below 2M rays, 256 at
    launch scale) must produce identical closest hits — exercised here by
    overriding tile_rays explicitly, since CI ray counts never reach the
    heuristic threshold."""
    import jax.numpy as jnp

    from raytrace_tpu.ops import cluster_intersect as ci

    scene = field_scene(n_tris=4000)
    n = 2048
    o, d = down_rays(n, seed=13)
    tmin = jnp.full((n,), 1e-3)
    tmax = jnp.full((n,), 1e30)
    t_a, i_a, _, ovf_a = ci.intersect_clusters(
        scene.clusters, o, d, tmin, tmax, interpret=True, tile_rays=128)
    t_b, i_b, _, ovf_b = ci.intersect_clusters(
        scene.clusters, o, d, tmin, tmax, interpret=True, tile_rays=256)
    assert int(ovf_a) == 0 and int(ovf_b) == 0
    np.testing.assert_allclose(np.asarray(t_a), np.asarray(t_b), rtol=1e-6)
    hit = np.asarray(t_a) < 1e29
    np.testing.assert_array_equal(np.asarray(i_a)[hit], np.asarray(i_b)[hit])
