"""Experiment: size the round-4 cluster-intersector redesign.

Measures, on a photon-bounce-like ray population over the triangle_field
scene (BASELINE config[4] proxy):
  - exact per-ray cluster-crossing counts (the lower bound on pair work)
  - per-GROUP cull-union sizes at granularities {32, 64, 128, 256} under
    the current sort key (origin Morton 64^3 + direction octant) and
    candidate 5D keys (origin+direction interleavings)
  - the implied subpair counts / TFLOP / prefetch rounds.

Run: JAX_PLATFORMS=cpu python tools/exp_subtile.py [n_tris_log2] [n_rays_log2]
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

if __name__ == "__main__":  # imported helpers must not hijack the backend
    jax.config.update("jax_platforms", "cpu")

from raytrace_tpu.ops import photon_grid as pg
from raytrace_tpu.scene import presets

NT = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
NR = 1 << int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 19


def bounce_rays(scene, n, key):
    """Cosine-hemisphere rays from random surface points — the incoherent
    photon-bounce population."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    nt = scene.tris.count
    ti = jax.random.randint(k1, (n,), 0, nt)
    u = jax.random.uniform(k2, (n, 2))
    su = jnp.sqrt(u[:, :1])
    b0, b1 = 1.0 - su[:, 0], su[:, 0] * u[:, 1]
    b2 = 1.0 - b0 - b1
    v0, v1, v2 = scene.tris.v0[ti], scene.tris.v1[ti], scene.tris.v2[ti]
    o = b0[:, None] * v0 + b1[:, None] * v1 + b2[:, None] * v2
    ng = jnp.cross(v1 - v0, v2 - v0)
    ng = ng / jnp.linalg.norm(ng, axis=1, keepdims=True)
    ng = jnp.where(ng[:, 2:3] < 0, -ng, ng)  # up-facing
    # cosine hemisphere around ng
    uu = jax.random.uniform(k3, (n, 2))
    r = jnp.sqrt(uu[:, 0])
    phi = 2 * np.pi * uu[:, 1]
    lx, ly = r * jnp.cos(phi), r * jnp.sin(phi)
    lz = jnp.sqrt(jnp.maximum(0.0, 1 - uu[:, 0]))
    # frame
    a = jnp.where(jnp.abs(ng[:, 2:3]) < 0.9,
                  jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0]))
    t1 = jnp.cross(ng, a)
    t1 = t1 / jnp.linalg.norm(t1, axis=1, keepdims=True)
    t2 = jnp.cross(ng, t1)
    d = lx[:, None] * t1 + ly[:, None] * t2 + lz[:, None] * ng
    o = o + 1e-3 * d
    return o, d


@jax.jit
def cull_counts(o, d, tmin, tmax, cmin, cmax):
    """Per-ray cluster-crossing mask [N, C] (bool, chunked by caller)."""
    inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)
    t0 = (cmin[None, :, :] - o[:, None, :]) * inv[:, None, :]
    t1 = (cmax[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tn <= tf) & (tf > tmin[:, None]) & (tn < tmax[:, None])


def dir_oct2d(d):
    """Octahedral map of direction to [0,1)^2 (for quantized dir bits)."""
    ad = jnp.abs(d)
    s = ad.sum(axis=1, keepdims=True)
    p = d[:, :2] / jnp.maximum(s, 1e-20)
    # lower hemisphere fold
    fold = (1.0 - jnp.abs(p[:, ::-1])) * jnp.sign(p)
    p = jnp.where(d[:, 2:3] < 0, fold, p)
    return jnp.clip(p * 0.5 + 0.5, 0.0, 0.999999)


def spread_bits2(v):
    v = v & 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def make_keys(o, d, smin, smax):
    ext = jnp.maximum(smax - smin, 1e-6) / 64.0
    oc = jnp.clip(((o - smin) / ext).astype(jnp.int32), 0, 63)
    octant = ((d[:, 0] > 0).astype(jnp.uint32) * 4
              + (d[:, 1] > 0).astype(jnp.uint32) * 2
              + (d[:, 2] > 0).astype(jnp.uint32))
    cur = (pg.morton3(oc) << 3) | octant

    p2 = dir_oct2d(d)
    d8 = (p2 * 16).astype(jnp.uint32)  # 4 bits per axis
    dm = (spread_bits2(d8[:, 0]) << 1) | spread_bits2(d8[:, 1])  # 8 bits
    om = pg.morton3(oc)  # 18 bits

    # key A: origin-major with 8 fine dir bits at the bottom
    kA = (om << 8) | dm
    # key B: interleave coarse origin(9) : dir(4) : mid origin(6) : dir(4) : fine(3)
    kB = (((om >> 9) & 0x1FF) << 17) | (((dm >> 4) & 0xF) << 13) | \
         (((om >> 3) & 0x3F) << 7) | ((dm & 0xF) << 3) | (om & 0x7)
    # key C: dir-major coarse: dir(4) : origin(18) : dir(4)
    kC = (((dm >> 4) & 0xF) << 22) | (om << 4) | (dm & 0xF)
    return {"cur": cur, "A_om_dir8": kA, "B_interleave": kB, "C_dirmajor": kC}


def main():
    t0 = time.time()
    scene, _ = presets.triangle_field(n_triangles=NT)
    print(f"scene {NT} tris, clusters={scene.clusters.tv.shape[0]} "
          f"x {scene.clusters.tv.shape[2]} built in {time.time()-t0:.1f}s")
    cs = scene.clusters
    cmin, cmax = np.asarray(cs.cmin), np.asarray(cs.cmax)
    real = np.isfinite(cmin[:, 0])
    C = int(real.sum())
    cmin, cmax = cmin[:C], cmax[:C]

    o, d = bounce_rays(scene, NR, jax.random.PRNGKey(7))
    o, d = np.asarray(o), np.asarray(d)
    smin, smax = cmin.min(0), cmax.max(0)
    keys = make_keys(jnp.asarray(o), jnp.asarray(d), jnp.asarray(smin),
                     jnp.asarray(smax))

    tmin = np.full(NR, 1e-3, np.float32)
    tmax = np.full(NR, 1e30, np.float32)

    chunk = 1 << 15
    for name, key in keys.items():
        order = np.argsort(np.asarray(key), kind="stable")
        oo, dd = o[order], d[order]
        per_ray = np.zeros(NR, np.int64)
        unions = {s: 0 for s in (32, 64, 128, 256)}
        for i in range(0, NR, chunk):
            m = np.asarray(cull_counts(
                jnp.asarray(oo[i:i+chunk]), jnp.asarray(dd[i:i+chunk]),
                jnp.asarray(tmin[i:i+chunk]), jnp.asarray(tmax[i:i+chunk]),
                jnp.asarray(cmin), jnp.asarray(cmax)))
            per_ray[i:i+chunk] = m.sum(1)
            for s in unions:
                gm = m.reshape(-1, s, C).any(axis=1)
                unions[s] += int(gm.sum())
        if name == "cur":
            print(f"per-ray crossings: mean {per_ray.mean():.1f} "
                  f"p50 {np.percentile(per_ray,50):.0f} "
                  f"p99 {np.percentile(per_ray,99):.0f} "
                  f"max {per_ray.max()}  total {per_ray.sum()}")
        line = [f"key={name:12s}"]
        S = cs.tv.shape[2]
        for s, tot in unions.items():
            pairs = tot
            tf = pairs * s * S * 30 / 1e12
            line.append(f"s={s}: pairs {pairs/1e6:.2f}M "
                        f"avg {tot/(NR//s):.0f} tf {tf:.2f}")
        print("  ".join(line))


if __name__ == "__main__":
    main()
