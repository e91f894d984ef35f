"""Experiment 3: epoch-segmented culling (wavefront early-termination).

Rays are culled in t-windows [0,L], [L,4L], [4L,16L], [16L,inf); a ray
whose true closest hit lies within the window boundary drops out of later
epochs — the wavefront analogue of front-to-back BVH traversal with early
exit. Measures per-epoch group unions (pairs/TFLOP) on the config[4]
bounce-ray population.

Run: python tools/exp_epochs.py [n_tris_log2] [n_rays_log2] [groups] [s]
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
from tools.exp_subtile import bounce_rays, make_keys

NT = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22
NR = 1 << int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 22
NG = int(sys.argv[3]) if len(sys.argv) > 3 else 512


@jax.jit
def cull_window(o, d, w0, w1, cmin, cmax):
    """Cluster mask [N, C] for ray segment [w0, w1] (per-ray windows)."""
    inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)
    t0 = (cmin[None, :, :] - o[:, None, :]) * inv[:, None, :]
    t1 = (cmax[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tn <= tf) & (tf > w0[:, None]) & (tn < w1[:, None])


@jax.jit
def mt_t(o, d, v0, v1, v2, tmin):
    """Closest MT hit t of rays [N,3] vs tris [M,3]."""
    e1, e2 = v1 - v0, v2 - v0
    pv = jnp.cross(d[:, None, :], e2[None, :, :])
    det = jnp.sum(e1[None] * pv, -1)
    inv = jnp.where(det != 0, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tv = o[:, None, :] - v0[None, :, :]
    b = jnp.sum(tv * pv, -1) * inv
    qv = jnp.cross(tv, e1[None, :, :])
    g = jnp.sum(d[:, None, :] * qv, -1) * inv
    t = jnp.sum(e2[None] * qv, -1) * inv
    ok = (det != 0) & (b >= 0) & (g >= 0) & (b + g <= 1) & (t > tmin[:, None])
    return jnp.min(jnp.where(ok, t, 1e30), axis=1)


def main():
    scene, _ = presets.triangle_field(n_triangles=NT)
    cs = scene.clusters
    cmin, cmax = np.asarray(cs.cmin), np.asarray(cs.cmax)
    real = np.isfinite(cmin[:, 0])
    C = int(real.sum())
    cmin, cmax = cmin[:C], cmax[:C]
    S = cs.tv.shape[2]
    tvc = np.asarray(cs.tv)  # [C, 9, S]
    ext = (cmax - cmin)
    medext = float(np.median(ext.max(1)))
    print(f"{NT} tris, {C} clusters x{S}, median cluster extent {medext:.3f}")

    o = np.empty((NR, 3), np.float32)
    d = np.empty((NR, 3), np.float32)
    bs = 1 << 20
    for i in range(0, NR, bs):
        oo, dd = bounce_rays(scene, min(bs, NR - i), jax.random.PRNGKey(i))
        o[i:i+bs], d[i:i+bs] = np.asarray(oo), np.asarray(dd)
    smin, smax = cmin.min(0), cmax.max(0)
    keys = make_keys(jnp.asarray(o), jnp.asarray(d), jnp.asarray(smin),
                     jnp.asarray(smax))

    rng = np.random.default_rng(0)
    for name in ("B_interleave", "cur"):
        order = np.argsort(np.asarray(keys[name]), kind="stable")
        for s in (32, 256):
            ngroups = NR // s
            pick = rng.choice(ngroups, size=min(NG, ngroups), replace=False)
            rays_idx = (pick[:, None] * s + np.arange(s)[None, :]).ravel()
            oo, dd = o[order][rays_idx], d[order][rays_idx]
            n = len(rays_idx)
            tmin = np.full(n, 1e-3, np.float32)

            # true closest hit per ray (via its own candidate clusters);
            # candidates padded to a fixed bucket so jit compiles once
            thit = np.full(n, 1e30, np.float32)
            CAND = 128  # clusters per mt chunk
            for gi in range(len(pick)):
                sl = slice(gi * s, (gi + 1) * s)
                m = np.asarray(cull_window(
                    jnp.asarray(oo[sl]), jnp.asarray(dd[sl]),
                    jnp.asarray(tmin[sl]),
                    jnp.asarray(np.full(s, 1e30, np.float32)),
                    jnp.asarray(cmin), jnp.asarray(cmax)))
                cand = np.nonzero(m.any(0))[0]
                if len(cand) == 0:
                    continue
                best = np.full(s, 1e30, np.float32)
                for c0 in range(0, len(cand), CAND):
                    cc = cand[c0:c0 + CAND]
                    if len(cc) < CAND:
                        cc = np.pad(cc, (0, CAND - len(cc)))
                        pad_from = len(cand) - c0
                    else:
                        pad_from = CAND
                    tv = tvc[cc].transpose(0, 2, 1).reshape(-1, 9).copy()
                    tv[pad_from * S:] = 0.0  # degenerate pad → no hit
                    best = np.minimum(best, np.asarray(mt_t(
                        jnp.asarray(oo[sl]), jnp.asarray(dd[sl]),
                        jnp.asarray(tv[:, 0:3]), jnp.asarray(tv[:, 3:6]),
                        jnp.asarray(tv[:, 6:9]), jnp.asarray(tmin[sl]))))
                thit[sl] = best

            hitfrac = float((thit < 1e30).mean())
            # epoch windows
            for L0 in (2 * medext, 4 * medext):
                bounds = [1e-3, L0, 4 * L0, 16 * L0, 1e30]
                tot = 0
                parts = []
                for e in range(4):
                    w0b, w1b = bounds[e], bounds[e + 1]
                    active = thit > w0b  # unresolved before this epoch
                    w0 = np.where(active, w0b, 0.0).astype(np.float32)
                    w1 = np.where(active, w1b, 0.0).astype(np.float32)
                    m = np.asarray(cull_window(
                        jnp.asarray(oo), jnp.asarray(dd), jnp.asarray(w0),
                        jnp.asarray(w1), jnp.asarray(cmin),
                        jnp.asarray(cmax)))
                    gm = m.reshape(-1, s, C).any(1)
                    u = int(gm.sum())
                    tot += u
                    parts.append(u / len(pick))
                pairs = tot / len(pick) * ngroups
                tf = pairs * s * S * 30 / 1e12
                print(f"key={name:12s} s={s:3d} L0={L0:5.2f}: "
                      f"per-epoch avg {['%.0f' % p for p in parts]} "
                      f"pairs {pairs/1e6:6.2f}M tf {tf:5.2f} "
                      f"rounds {pairs/131072:4.0f} hitfrac {hitfrac:.2f}")


if __name__ == "__main__":
    main()
