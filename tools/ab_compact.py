"""A/B the epoch engine's compaction scheme on real TPU.

RAYTRACE_TPU_COMPACT=sort (round-4 full-mask sorts) vs the round-5
word-packed run-expansion compaction. Run:
    python tools/ab_compact.py [n_tris_log2] [n_rays_log2]
spawns one subprocess per mode so each traces its own graph.
"""
import os
import subprocess
import sys

NTL = sys.argv[1] if len(sys.argv) > 1 else "20"
NRL = sys.argv[2] if len(sys.argv) > 2 else "20"

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(root)r)
import jax, jax.numpy as jnp, numpy as np
from raytrace_tpu.ops import epoch_intersect as ei
from raytrace_tpu.scene import presets
from tools.exp_subtile import bounce_rays

NT = 1 << %(ntl)s
NR = 1 << %(nrl)s
scene, _ = presets.triangle_field(n_triangles=NT, size=64)
o, d = bounce_rays(scene, NR, jax.random.PRNGKey(5))
tmin = jnp.full((NR,), 1e-3); tmax = jnp.full((NR,), 1e30)

def fetch(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:2])

t0 = time.perf_counter()
out = ei.intersect_epochs(scene.clusters, o, d, tmin, tmax)
fetch(out)
compile_s = time.perf_counter() - t0
times = []
for _ in range(5):
    t0 = time.perf_counter()
    out = ei.intersect_epochs(scene.clusters, o, d, tmin, tmax)
    fetch(out)
    times.append(time.perf_counter() - t0)
t, idx, nsp, ovf = out
hits = int(jnp.sum(t < 1e29))
print(f"MODE={os.environ.get('RAYTRACE_TPU_COMPACT','auto')} "
      f"median {float(np.median(times))*1e3:.1f} ms  compile {compile_s:.1f}s "
      f"hits {hits} nsp {int(nsp)} ovf {int(ovf)}")
"""

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
code = CHILD % dict(root=root, ntl=NTL, nrl=NRL)
for mode in ("word", "sort"):
    env = dict(os.environ)
    env["RAYTRACE_TPU_COMPACT"] = mode
    subprocess.run([sys.executable, "-c", code], env=env, check=False)
