"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Mirrors the reference's operational QA strategy upgrade plan (SURVEY.md §4):
multi-device tests run on CPU via --xla_force_host_platform_device_count,
the standard way to exercise pjit/shard_map sharding without a TPU pod.

Must run before any `import jax` — pytest imports conftest first.

Exception: GARMENTNETS_HW_TESTS=1 keeps the process on the real accelerator
so the opt-in on-chip suite (tests/test_hw_chip.py) exercises the actual
TPU kernels; everything else in tests/ is skipped in that mode via the
collection hook below (CPU-mesh tests assume 8 virtual devices).
"""
import os
import sys
import pathlib

HW_MODE = os.environ.get("GARMENTNETS_HW_TESTS") == "1"

if not HW_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# repo root on sys.path so `import garmentnets_tpu` works without install
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

if not HW_MODE:
    # The sandbox pins the 'axon' TPU platform regardless of JAX_PLATFORMS;
    # the config knob is authoritative, so force CPU here too.
    jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    """In HW mode run ONLY the on-chip suite; otherwise skip it (it requires
    a real accelerator and must not run on the forced-CPU platform)."""
    import pytest
    if HW_MODE:
        skip = pytest.mark.skip(
            reason="GARMENTNETS_HW_TESTS=1 runs only tests/test_hw_chip.py "
                   "(CPU-mesh suites assume the virtual 8-device platform)")
        for item in items:
            if "test_hw_chip" not in item.nodeid:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="on-chip suite: set GARMENTNETS_HW_TESTS=1 on a host "
                   "with a real TPU/accelerator")
        for item in items:
            if "test_hw_chip" in item.nodeid:
                item.add_marker(skip)
