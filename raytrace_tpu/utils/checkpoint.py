"""Checkpoint/resume for progressive photon mapping (SURVEY.md §5.4).

The per-pixel PPM statistics (radius², α-weighted photon count, flux —
ProgressiveState) are the full inter-wave state of the renderer: the
reference keeps them inside RayTracingRecord and updates them in place
across passes (photonmapping.h:16-19, gathering.cu:116-122) but never
serializes them and hard-codes passes=1. Here a wave boundary is a clean
checkpoint: state + next pass index + the render key. Photon waves are pure
functions of (key, pass index), so a resumed render is bit-identical to an
uninterrupted one (tested in tests/test_checkpoint.py).

Plain .npz is used rather than orbax — the state is three arrays, and zero
extra dependencies keeps the loader trivially portable.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

_FORMAT_VERSION = 1


def save_progressive(path: str, state, next_pass: int, key,
                     emitted_photons: float = 0.0) -> None:
    """Write a PPM wave checkpoint atomically (tmp + rename)."""
    tmp = path + ".tmp"
    extra = {}
    if getattr(state, "emitted", None) is not None:
        extra["emitted"] = np.asarray(state.emitted)
    np.savez(
        tmp,
        version=np.int32(_FORMAT_VERSION),
        radius2=np.asarray(state.radius2),
        photon_count=np.asarray(state.photon_count),
        flux=np.asarray(state.flux),
        next_pass=np.int32(next_pass),
        key=np.asarray(key),
        emitted_photons=np.float64(emitted_photons),
        **extra,
    )
    # np.savez appends .npz to the filename it's given
    os.replace(tmp + ".npz", path)


def load_progressive(path: str):
    """Read a checkpoint → (ProgressiveState, next_pass, key_data,
    emitted_photons). key_data is the raw saved key array — callers compare
    it against their own key to catch resuming with mismatched RNG."""
    from raytrace_tpu.renderers.photon import ProgressiveState

    with np.load(path) as z:
        if int(z["version"]) != _FORMAT_VERSION:
            raise ValueError(f"unknown checkpoint version {int(z['version'])}")
        state = ProgressiveState(
            radius2=jnp.asarray(z["radius2"]),
            photon_count=jnp.asarray(z["photon_count"]),
            flux=jnp.asarray(z["flux"]),
            emitted=(jnp.asarray(z["emitted"])
                     if "emitted" in z.files else None),
        )
        return (state, int(z["next_pass"]), np.array(z["key"]),
                float(z["emitted_photons"]))
