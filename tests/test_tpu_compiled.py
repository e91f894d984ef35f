"""Compiled-TPU kernel tests (opt-in: RT_TPU_TESTS=1).

The CI suite runs Pallas kernels in interpret mode on the virtual CPU mesh
(conftest), which cannot exercise compiled-only behaviors: output-block
accumulation across same-index grid steps, new-tile zero-init ordering, and
uninitialized unvisited output blocks. This test spawns a subprocess WITHOUT
the conftest CPU override so it lands on the real TPU and runs the rowspan
gather fwd+bwd + overflow path compiled, against the dense oracle.

Skipped by default: the shared TPU is reserved for bench runs, and first
compile takes ~1 min. Run: RT_TPU_TESTS=1 pytest tests/test_tpu_compiled.py
"""
import os
import pathlib
import subprocess
import sys

import pytest


@pytest.mark.skipif(
    os.environ.get("RT_TPU_TESTS") != "1",
    reason="TPU compiled tests are opt-in (RT_TPU_TESTS=1)",
)
def test_rowspan_gather_compiled_on_tpu():
    repo = str(pathlib.Path(__file__).resolve().parents[1])
    child = str(pathlib.Path(__file__).with_name("_tpu_gather_child.py"))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
    # drop the virtual-CPU-mesh flag the conftest may have injected
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    out = subprocess.run(
        [sys.executable, child], env=env, cwd=repo,
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "TPU gather child OK" in out.stdout


@pytest.mark.skipif(
    os.environ.get("RT_TPU_TESTS") != "1",
    reason="TPU compiled tests are opt-in (RT_TPU_TESTS=1)",
)
def test_epoch_engine_compiled_on_tpu():
    """COMPILED cull/compact/MT epoch engine on incoherent rays vs a numpy
    brute-force oracle, plus sort-vs-word compaction equality (VERDICT r4
    #8 — the round-4 centerpiece had no compiled test)."""
    repo = str(pathlib.Path(__file__).resolve().parents[1])
    child = str(pathlib.Path(__file__).with_name("_tpu_epoch_child.py"))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    out = subprocess.run(
        [sys.executable, child], env=env, cwd=repo,
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "TPU epoch child OK" in out.stdout
