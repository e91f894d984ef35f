"""Child for tests/test_tpu_compiled.py: the COMPILED epoch-subtile engine
(dense cull → pair/subpair compaction → Möller–Trumbore rounds) on random
incoherent rays vs a numpy brute-force oracle — the r2-class bug surface
(output-block accumulation, prefetch block indexing, fill-job handling)
lives only in compiled mode, and the round-4/5 engine had no compiled test
(VERDICT r4 #8). Also checks the two compaction schemes (full-mask sort vs
word-packed run-expansion, ops/epoch_intersect.py) agree bit-for-bit
compiled."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.ops import epoch_intersect as ei  # noqa: E402
from raytrace_tpu.scene import presets  # noqa: E402

assert jax.devices()[0].platform != "cpu", jax.devices()

NT = 1 << 14
NR = 1 << 17
scene, _ = presets.triangle_field(n_triangles=NT, size=64)
assert scene.clusters is not None

rng = np.random.default_rng(3)
# incoherent rays: random origins above the terrain, random directions
o = np.stack([
    rng.uniform(-9, 9, NR), rng.uniform(-9, 9, NR), rng.uniform(0.5, 4, NR)
], axis=1).astype(np.float32)
d = rng.normal(size=(NR, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
oj, dj = jnp.asarray(o), jnp.asarray(d)
tmin = jnp.full((NR,), 1e-3, jnp.float32)
tmax = jnp.full((NR,), 1e30, jnp.float32)

os.environ["RAYTRACE_TPU_COMPACT"] = "sort"
t_sort, idx_sort, nsp_s, ovf_s = jax.block_until_ready(
    ei.intersect_epochs(scene.clusters, oj, dj, tmin, tmax))
os.environ["RAYTRACE_TPU_COMPACT"] = "word"
# budget_scale nudged: same budgets after clamping, fresh jit cache entry
# (the env var is read at trace time and is not part of the cache key)
t_word, idx_word, nsp_w, ovf_w = jax.block_until_ready(
    ei.intersect_epochs(scene.clusters, oj, dj, tmin, tmax,
                        budget_scale=1.000001))
assert int(ovf_s) == 0 and int(ovf_w) == 0, (int(ovf_s), int(ovf_w))
assert int(nsp_s) == int(nsp_w), (int(nsp_s), int(nsp_w))
np.testing.assert_array_equal(np.asarray(t_sort), np.asarray(t_word))
np.testing.assert_array_equal(np.asarray(idx_sort), np.asarray(idx_word))

# brute-force oracle on a random ray subset (numpy Möller–Trumbore over
# ALL triangles — no acceleration structure in the reference path)
sub = rng.choice(NR, 2000, replace=False)
v0 = np.asarray(scene.tris.v0, np.float64)
v1 = np.asarray(scene.tris.v1, np.float64)
v2 = np.asarray(scene.tris.v2, np.float64)
e1 = v1 - v0
e2 = v2 - v0
os_, ds_ = o[sub].astype(np.float64), d[sub].astype(np.float64)
pvec = np.cross(ds_[:, None, :], e2[None, :, :])
det = np.einsum("tk,rtk->rt", e1, pvec)
inv = np.where(det != 0.0, 1.0 / np.where(det == 0.0, 1.0, det), 0.0)
tv = os_[:, None, :] - v0[None, :, :]
beta = np.einsum("rtk,rtk->rt", tv, pvec) * inv
qvec = np.cross(tv, e1[None, :, :])
gamma = np.einsum("rk,rtk->rt", ds_, qvec) * inv
tt = np.einsum("tk,rtk->rt", e2, qvec) * inv
ok = (det != 0.0) & (beta >= -1e-9) & (gamma >= -1e-9) \
    & (beta + gamma <= 1.0 + 1e-9) & (tt > 1e-3)
t_ref = np.where(ok, tt, 1e30).min(axis=1)

t_eng = np.asarray(t_sort)[sub].astype(np.float64)
hit_ref = t_ref < 1e29
hit_eng = t_eng < 1e29
# f32 vs f64 can flip edge-grazing hits; demand ≥ 99.8% agreement and
# tight t agreement where both hit
agree = hit_ref == hit_eng
assert agree.mean() > 0.998, agree.mean()
both = hit_ref & hit_eng
rel = np.abs(t_eng[both] - t_ref[both]) / np.maximum(t_ref[both], 1e-6)
assert np.quantile(rel, 0.999) < 1e-3, np.quantile(rel, 0.999)
assert hit_ref.mean() > 0.3  # the terrain really is hit a lot

print("TPU epoch child OK", flush=True)
