"""Multi-host structure on the virtual CPU mesh: hierarchical mesh shape,
distributed-init gating, and the scaling report's plumbing."""
import jax
import numpy as np

from raytrace_tpu.core.config import RenderConfig
from raytrace_tpu.parallel import multihost
from raytrace_tpu.scene import presets

KEY = jax.random.PRNGKey(2)


def test_initialize_distributed_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert multihost.initialize_distributed() is False


def test_hierarchical_mesh_single_host():
    mesh = multihost.make_hierarchical_mesh()
    assert mesh.axis_names == ("hosts", "chips")
    assert mesh.devices.shape == (1, len(jax.devices()))


def test_scaling_report_structure():
    size = 16
    scene, camera = presets.cornell_box(size=size)
    config = RenderConfig(
        width=size, height=size, spp=8, scene_epsilon=1e-3,
        photon_paths=1 << 9, photon_passes=1, max_photon_bounces=4,
    )
    rep = multihost.scaling_report(
        scene, camera, config, KEY, device_counts=(1, 8), n_iters=1)
    assert set(rep) == {1, 8, "efficiency"}
    assert rep[1] > 0 and rep[8] > 0
    assert np.isfinite(rep["efficiency"])
