"""Child for tests/test_tpu_compiled.py: COMPILED (non-interpret) rowspan
gather + custom VJP vs the dense oracle on the real TPU, including the
budget-overflow path — the behaviors interpret mode cannot exercise
(out_ref accumulation across same-block grid steps, new-tile zero-init
ordering, unvisited-block masking)."""
import sys

import jax
import numpy as np
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from raytrace_tpu.ops import pallas_gather as pgx  # noqa: E402
from raytrace_tpu.ops import photon_grid as pg  # noqa: E402

assert jax.devices()[0].platform != "cpu", jax.devices()

rng = np.random.default_rng(1)
P, N = 50_000, 5_000
pp = jnp.asarray(rng.uniform(0, 10, (P, 3)), jnp.float32)
pa = jnp.asarray(rng.uniform(0, 1, (P, 3)), jnp.float32)
pw = rng.normal(size=(P, 3))
pw /= np.linalg.norm(pw, axis=1, keepdims=True)
pw = jnp.asarray(pw, jnp.float32)
pv = jnp.asarray(rng.uniform(size=P) < 0.8)
qp = jnp.asarray(rng.uniform(0, 10, (N, 3)), jnp.float32)
r2 = jnp.asarray(rng.uniform(0.005, 0.05, (N,)), jnp.float32)
qns = rng.normal(size=(N, 3))
qns /= np.linalg.norm(qns, axis=1, keepdims=True)
qns = jnp.asarray(qns, jnp.float32)
qkd = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
cell = float(jnp.sqrt(r2.max()))
pm = pg.PhotonMap(p=pp, alpha=pa, wi=pw, valid=pv)
cot = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)


def f_rs(alpha, kd, budget=1 << 17):
    return pgx.gather_radius_pallas_rowspan(
        pp, alpha, pw, pv, cell, qp, r2, qns, kd, job_budget=budget)


L1, m1, ovf = jax.block_until_ready(f_rs(pa, qkd))
L2, m2 = jax.block_until_ready(pg.gather_radius_dense(pm, qp, r2, qns, qkd))
assert int(ovf) == 0
assert (np.asarray(m1) == np.asarray(m2)).all()
rel = np.abs(np.asarray(L1) - np.asarray(L2)) / (np.abs(np.asarray(L2)) + 1e-6)
assert rel.max() < 5e-3, rel.max()

g1 = jax.jit(jax.grad(
    lambda a, k: jnp.sum(f_rs(a, k)[0] * cot), argnums=(0, 1)))(pa, qkd)
g2 = jax.grad(
    lambda a, k: jnp.sum(pg.gather_radius_dense(
        pm.replace(alpha=a), qp, r2, qns, k)[0] * cot),
    argnums=(0, 1))(pa, qkd)
for a, b in zip(g1, g2):
    rel = np.abs(np.asarray(a) - np.asarray(b)) / (np.abs(np.asarray(b)) + 1e-6)
    assert rel.max() < 5e-3, rel.max()

# compiled overflow: defined output, covered tiles exact, tail exactly zero
L3, m3, ovf3 = jax.block_until_ready(f_rs(pa, qkd, budget=64))
assert int(ovf3) > 0
assert np.isfinite(np.asarray(L3)).all()
cover = np.asarray(m3 > 0)
assert np.allclose(np.asarray(L3)[cover], np.asarray(L2)[cover],
                   rtol=1e-3, atol=1e-5)
assert float(np.abs(np.asarray(L3)[~cover]).max()) == 0.0

print("TPU gather child OK", flush=True)
