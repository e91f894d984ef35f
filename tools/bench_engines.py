"""A/B the epoch-subtile engine vs the round-3 tile engine on real TPU.

Loads: coherent (camera-like) and incoherent (bounce-like) rays over
triangle_field scenes. Verifies agreement and reports per-call latency.

Run: python tools/bench_engines.py [n_tris_log2] [n_rays_log2]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.ops import cluster_intersect as ci
from raytrace_tpu.ops import epoch_intersect as ei
from raytrace_tpu.scene import presets

NT = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
NR = 1 << int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20


def bounce_rays(scene, n, key):
    from tools.exp_subtile import bounce_rays as br

    return br(scene, n, key)


def camera_rays(scene, n, key):
    """Coherent fan from one viewpoint."""
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (n, 2)) - 0.5
    o = jnp.tile(jnp.array([[0.0, -14.0, 9.0]]), (n, 1))
    tgt = jnp.concatenate([u * 18.0, jnp.zeros((n, 1))], axis=1)
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def _fetch(out):
    # axon executes lazily; only a host fetch forces execution
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:2] if leaf.ndim else leaf)


def run(fn, name, *args, iters=3):
    t0 = time.perf_counter()
    out = fn(*args)
    _fetch(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:8.1f} ms/call (compile {compile_s:.1f}s)")
    return out, dt


def main():
    print(jax.devices())
    t0 = time.time()
    scene, _ = presets.triangle_field(n_triangles=NT)
    print(f"scene {NT} tris built in {time.time()-t0:.1f}s; "
          f"clusters {scene.clusters.tv.shape[0]}x{scene.clusters.tv.shape[2]}")
    cs = scene.clusters
    tmin = jnp.full((NR,), 1e-3, jnp.float32)
    tmax = jnp.full((NR,), ci.BIG, jnp.float32)

    for kind, gen in (("coherent", camera_rays), ("incoherent", bounce_rays)):
        o, d = gen(scene, NR, jax.random.PRNGKey(3))
        o = jnp.asarray(o); d = jnp.asarray(d)

        (t_new, i_new, nsp, ovf_new), dt_new = run(
            lambda o, d: ei.intersect_epochs(cs, o, d, tmin, tmax),
            f"{kind}: epoch  ", o, d)
        (t_old, i_old, np_, ovf_old), dt_old = run(
            lambda o, d: ci.intersect_clusters(cs, o, d, tmin, tmax,
                                               rounds=8),
            f"{kind}: cluster", o, d)
        t_new = np.asarray(t_new); t_old = np.asarray(t_old)
        print(f"  subpairs {int(nsp)}  ovf_new {int(ovf_new)} "
              f"ovf_old {int(ovf_old)}")
        hit_new = (t_new < 1e29).sum()
        hit_old = (t_old < 1e29).sum()
        close = np.isclose(t_new, t_old, rtol=1e-4, atol=1e-4)
        print(f"  hits new {hit_new} old {hit_old}  agree {close.mean():.6f}"
              f"  speedup old/new {dt_old/dt_new:.2f}x")


if __name__ == "__main__":
    main()
