"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Mirrors the reference's operational QA strategy upgrade plan (SURVEY.md §4):
multi-device tests run on CPU via --xla_force_host_platform_device_count,
the standard way to exercise pjit/shard_map sharding without a TPU pod.

Must run before any `import jax` — pytest imports conftest first.
"""
import os
import sys
import pathlib

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# repo root on sys.path so `import garmentnets_tpu` works without install
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# The sandbox pins the 'axon' TPU platform regardless of JAX_PLATFORMS; the
# config knob is authoritative, so force CPU here too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
