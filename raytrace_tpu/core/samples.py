"""Unified sample-request layout — the reference's CudaSample flattening
(util/sampler/cudasample.{h,cpp}) rebuilt for batched tensors.

pbrt integrators request per-pixel-sample stratified arrays up front
(`Add1D`/`Add2D` return running offsets); the reference mirrors those
requests into linear offsets so the GPU can index flat `bRandom1D/2D`
buffers (pbrtcamera.cpp:78-109, cudalight.cu.h:34-35). Here the same
contract produces device tensors:

    layout = SampleLayout()
    off = layout.add_2d(n)           # e.g. per-light illumination samples
    s = layout.materialize_2d(key, sample_ids)   # [N, total_2d, 2]
    u = s[:, off + j]                # j-th sample of that request, stratified

Each request's block is stratified over its own (sx, sy) grid (pbrt
StratifiedSample2D), and every uniform is a pure function of
(key, request-draw order, GLOBAL sample id) — the same sharding-invariance
contract as the photon walk, so N-chip renders draw identical numbers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def strata_2d(n: int) -> tuple[int, int]:
    """Factor n into the squarest (sx, sy) power-of-two-ish grid (pbrt's
    RoundUpPow2-style split used for stratified light samples)."""
    sx, sy = n, 1
    while sx > sy and (sx & 1) == 0:
        sx //= 2
        sy *= 2
    return sx, sy


class SampleLayout:
    """Accumulates 1D/2D sample requests into linear offsets
    (reference: CudaSample::Add1D/Add2D, util/sampler/cudasample.cpp:2-25)."""

    def __init__(self):
        self._n1d: list[int] = []
        self._n2d: list[int] = []

    def add_1d(self, n: int) -> int:
        off = sum(self._n1d)
        self._n1d.append(int(n))
        return off

    def add_2d(self, n: int) -> int:
        off = sum(self._n2d)
        self._n2d.append(int(n))
        return off

    @property
    def total_1d(self) -> int:
        return sum(self._n1d)

    @property
    def total_2d(self) -> int:
        return sum(self._n2d)

    def materialize_2d(self, key: Array, sample_ids: Array) -> Array:
        """Stratified 2D arrays for every request → [N, total_2d, 2].

        Draw order matches the renderers' historical stream: one key split
        per (request, stratum), uniforms folded with the GLOBAL sample id —
        reproducible at any sharding."""
        n = sample_ids.shape[0]
        cols = []
        for req_n in self._n2d:
            sx, sy = strata_2d(req_n)
            for s in range(req_n):
                key, sub = jax.random.split(key)
                u = jax.vmap(
                    lambda g: jax.random.uniform(
                        jax.random.fold_in(sub, g), (2,), dtype=jnp.float32
                    )
                )(sample_ids)
                kx, ky = s % sx, s // sx
                u = (u + jnp.array([kx, ky], jnp.float32)) / jnp.array(
                    [sx, sy], jnp.float32
                )
                cols.append(u)
        if not cols:
            return jnp.zeros((n, 0, 2), jnp.float32)
        return jnp.stack(cols, axis=1)

    def materialize_1d(self, key: Array, sample_ids: Array) -> Array:
        """Stratified 1D arrays for every request → [N, total_1d]."""
        n = sample_ids.shape[0]
        cols = []
        for req_n in self._n1d:
            for s in range(req_n):
                key, sub = jax.random.split(key)
                u = jax.vmap(
                    lambda g: jax.random.uniform(
                        jax.random.fold_in(sub, g), (), dtype=jnp.float32
                    )
                )(sample_ids)
                cols.append((u + s) / req_n)
        if not cols:
            return jnp.zeros((n, 0), jnp.float32)
        return jnp.stack(cols, axis=1)
