"""Process-wide JAX configuration for this framework.

- persistent compilation cache: compiles over the remote-TPU tunnel are
  extremely slow (minutes observed); the on-disk cache makes every
  subsequent process start fast. Call setup() before building any jitted
  program (bench, harness CLIs, graft entry all do).
"""
from __future__ import annotations

import os
import pathlib

_DONE = False


def setup(cache_dir: str | None = None):
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "GARMENTNETS_TPU_XLA_CACHE",
            str(pathlib.Path.home() / ".cache/garmentnets_tpu/xla"))
    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these knobs
