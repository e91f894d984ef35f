"""Speed-of-light accounting for the two hot Pallas kernels at the headline
config: measured time vs a bytes/FLOPs roofline (PERF.md source).

Run on TPU: python tools/perf_roofline.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HBM_GBPS = 819.0  # TPU v5e public HBM bandwidth


def bench(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / iters


def gather_stats(size=512, paths=1 << 18):
    """Headline gather: job count, bytes, FLOPs vs measured kernel time."""
    from raytrace_tpu.core.config import RenderConfig
    from raytrace_tpu.ops import pallas_gather as pgx
    from raytrace_tpu.renderers import common
    from raytrace_tpu.renderers import photon as ph
    from raytrace_tpu.scene import presets
    from raytrace_tpu.scene.camera import generate_rays, pixel_samples

    config = RenderConfig(
        width=size, height=size, spp=1, scene_epsilon=1e-3,
        photon_paths=paths, photon_passes=1, max_photon_bounces=8,
        footprint_radius_scale=8.0,
    )
    scene, camera = presets.cornell_box(size=size, ball="glass")
    key = jax.random.PRNGKey(0)
    k_pix, _, k_photon = jax.random.split(key, 3)
    xy, lens = pixel_samples(k_pix, size, size, 1, jitter=True)
    rays = generate_rays(camera, xy, lens, 1)
    rec = jax.jit(lambda sc, o, d, ry: common.camera_pass(
        sc, o, d, config, rays=ry))(scene, rays.o, rays.d, rays)
    photons = jax.jit(lambda sc, k: ph.trace_photons(sc, config, k, 0))(
        scene, k_photon)
    state = ph.ProgressiveState(
        radius2=ph.initial_radius2(rec, config),
        photon_count=jnp.zeros((rays.o.shape[0],), jnp.float32),
        flux=jnp.zeros((rays.o.shape[0], 3), jnp.float32),
    )
    cell = ph.gather_cell_size(rec, state)
    q_r2 = jnp.where(rec.hit, state.radius2, 0.0)
    from raytrace_tpu.shading import material as mat_ops
    from raytrace_tpu.core import vec
    wo = vec.normalize(-rec.direction)
    kd = mat_ops.f(scene.materials, rec.mat, wo, wo)

    # everything enters as a traced ARG — closures would embed MB-scale
    # constants into the HLO and blow the remote compile request limit
    fn = jax.jit(lambda pp, a, pw, pv, qpp, qr, qn, qk:
                 pgx.gather_radius_pallas_rowspan(
                     pp, a, pw, pv, cell, qpp, qr, qn, qk))
    (_, m, ovf), dt = bench(fn, photons.p, photons.alpha, photons.wi,
                            photons.valid, rec.p, q_r2, rec.ns, kd)

    # job count: replicate the coverage computation (host-side numpy)
    chunk = pgx.ROWSPAN_CHUNK
    n = rec.p.shape[0]
    p = photons.p.shape[0]
    n_tiles = -(-n // pgx.TILE_Q)
    n_chunks = -(-p // chunk)
    # count via the kernel's own overflow at budget=n_tiles (min): n_jobs =
    # overflow(bud) + bud for any budget — use the public overflow output
    bud = pgx.TILE_Q  # tiny; overflow + bud = n_jobs
    small = jax.jit(lambda pp, a, pw, pv, qpp, qr, qn, qk:
                    pgx.gather_radius_pallas_rowspan(
                        pp, a, pw, pv, cell, qpp, qr, qn, qk,
                        job_budget=1 << 12))
    _, _, ovf_small = small(photons.p, photons.alpha, photons.wi,
                            photons.valid, rec.p, q_r2, rec.ns, kd)
    n_jobs = int(ovf_small) + (1 << 12)

    flops = n_jobs * pgx.TILE_Q * chunk * 30
    # photon chunk re-reads dominate; query tiles ride along per job
    bytes_ = n_jobs * (pgx._GROWS + pgx._AROWS) * chunk * 4 \
        + n_jobs * 10 * pgx.TILE_Q * 4
    return {
        "gather_ms": dt * 1e3,
        "gather_jobs": n_jobs,
        "gather_gflops": flops / dt / 1e9,
        "gather_gbps": bytes_ / dt / 1e9,
        "gather_sol_ms_hbm": bytes_ / (HBM_GBPS * 1e9) * 1e3,
        "gather_matches": int(jnp.sum(m)),
    }


def vpu_peak_stats(n=1 << 23, k=256):
    """Measured VPU-f32 ceiling on THIS chip: a k-deep FMA chain over an
    f32[n] array inside one jitted fori_loop (XLA keeps the chain in
    vregs/VMEM, so compute dominates). This is the honest denominator for
    the PERF.md speed-of-light table — public spec sheets quote only the
    bf16 MXU peak for v5e."""
    x = jnp.linspace(0.1, 1.1, n, dtype=jnp.float32)

    @jax.jit
    def chain(x):
        def body(_, y):
            return y * jnp.float32(1.000001) + jnp.float32(1e-7)
        import jax.lax as lax
        return lax.fori_loop(0, k, body, x)

    _, dt = bench(chain, x)
    flops = 2.0 * n * k
    return {"vpu_fma_tflops": flops / dt / 1e12, "vpu_fma_ms": dt * 1e3}


def sort_stats(n=1 << 24):
    """Achieved u32 sort throughput vs the HBM roofline — the epoch
    engine's compaction is sort-based, so this bounds that stage."""
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
    fn = jax.jit(jnp.sort)
    _, dt = bench(fn, x)
    # a radix-style sort reads+writes the array O(passes) times; quote the
    # single-pass (copy) bound as the SoL floor
    bytes_floor = 2 * 4 * n
    return {
        "sort_n": n,
        "sort_ms": dt * 1e3,
        "sort_gbps_onepass": bytes_floor / dt / 1e9,
        "sort_sol_ms_hbm_onepass": bytes_floor / (HBM_GBPS * 1e9) * 1e3,
    }


def cluster_stats(n_tris=1 << 20, size=512):
    from raytrace_tpu.core.config import RenderConfig
    from raytrace_tpu.ops import cluster_intersect as ci
    from raytrace_tpu.scene import presets
    from raytrace_tpu.scene.camera import generate_rays, pixel_samples

    scene, camera = presets.triangle_field(n_triangles=n_tris, size=size)
    key = jax.random.PRNGKey(0)
    xy, lens = pixel_samples(key, size, size, 1, jitter=False)
    rays = generate_rays(camera, xy, lens, 1)
    n = rays.o.shape[0]
    fn = jax.jit(lambda cl, o, d: ci.intersect_clusters(
        cl, o, d, jnp.full((n,), 1e-3), jnp.full((n,), 1e30)))
    (t, _, _, ovf), dt = bench(fn, scene.clusters, rays.o, rays.d)
    cl = scene.clusters
    tris_per_cluster = cl.tv.shape[2]
    n_clusters = cl.tv.shape[0]
    return {
        "cluster_ms": dt * 1e3,
        "cluster_rays": n,
        "cluster_n_clusters": n_clusters,
        "cluster_tris_per_cluster": tris_per_cluster,
        "cluster_overflow": int(ovf),
        "cluster_hit_frac": float((t < 1e29).mean()),
    }


if __name__ == "__main__":
    import json

    out = {}
    out.update(vpu_peak_stats())
    out.update(sort_stats())
    out.update(gather_stats())
    out.update(cluster_stats())
    print(json.dumps(out, indent=2))
