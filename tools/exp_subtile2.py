"""Experiment 2: per-group cull-union sizes at FULL config[4] ray density
(4.19M bounce rays) via group subsampling — sort all rays, cull a random
subset of groups. Predicts subpair counts/TFLOP for the subtile redesign.

Run: python tools/exp_subtile2.py [n_tris_log2] [n_rays_log2] [n_sample_groups]
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("RAYTRACE_TPU_NO_COMPILE_CACHE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from raytrace_tpu.scene import presets
from tools.exp_subtile import bounce_rays, cull_counts, make_keys

NT = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22
NR = 1 << int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 22
NG = int(sys.argv[3]) if len(sys.argv) > 3 else 4096


def main():
    t0 = time.time()
    scene, _ = presets.triangle_field(n_triangles=NT)
    cs = scene.clusters
    print(f"scene {NT} tris, clusters={cs.tv.shape[0]}x{cs.tv.shape[2]} "
          f"in {time.time()-t0:.1f}s")
    cmin, cmax = np.asarray(cs.cmin), np.asarray(cs.cmax)
    real = np.isfinite(cmin[:, 0])
    C = int(real.sum())
    cmin, cmax = cmin[:C], cmax[:C]
    S = cs.tv.shape[2]

    o = np.empty((NR, 3), np.float32)
    d = np.empty((NR, 3), np.float32)
    bs = 1 << 20
    for i in range(0, NR, bs):
        oo, dd = bounce_rays(scene, min(bs, NR - i), jax.random.PRNGKey(i))
        o[i:i+bs], d[i:i+bs] = np.asarray(oo), np.asarray(dd)
    smin, smax = cmin.min(0), cmax.max(0)
    keys = make_keys(jnp.asarray(o), jnp.asarray(d), jnp.asarray(smin),
                     jnp.asarray(smax))
    tmin = np.full(NR, 1e-3, np.float32)
    tmax = np.full(NR, 1e30, np.float32)

    rng = np.random.default_rng(0)
    for name in ("cur", "C_dirmajor", "B_interleave"):
        key = np.asarray(keys[name])
        order = np.argsort(key, kind="stable")
        for s in (32, 64, 256):
            ngroups = NR // s
            pick = rng.choice(ngroups, size=min(NG, ngroups), replace=False)
            rays_idx = (pick[:, None] * s + np.arange(s)[None, :]).ravel()
            oo, dd = o[order][rays_idx], d[order][rays_idx]
            tot_union = 0
            ch = 1 << 15
            for i in range(0, len(rays_idx), ch):
                m = np.asarray(cull_counts(
                    jnp.asarray(oo[i:i+ch]), jnp.asarray(dd[i:i+ch]),
                    jnp.asarray(tmin[:len(oo[i:i+ch])]),
                    jnp.asarray(tmax[:len(oo[i:i+ch])]),
                    jnp.asarray(cmin), jnp.asarray(cmax)))
                gm = m.reshape(-1, s, C).any(axis=1)
                tot_union += int(gm.sum())
            avg = tot_union / len(pick)
            pairs = avg * ngroups
            tf = pairs * s * S * 30 / 1e12
            print(f"key={name:12s} s={s:3d}: avg union {avg:7.1f}  "
                  f"→ pairs {pairs/1e6:6.2f}M  tf {tf:6.2f}  "
                  f"rounds@2^17 {pairs/131072:5.0f}")


if __name__ == "__main__":
    main()
