"""Shared link-health canary: one tiny jitted op, cold then warm.

The device tunnel on this host oscillates healthy<->degraded on ~minute
timescales (docs/PERF.md round-5 A/B methodology: warm 1-elem dispatch
0.03 s healthy vs 0.45 s degraded; cold canaries of 8-513 s in one
afternoon). Every benchmark entry point prints this first so a bad
session is attributable instead of a silent null capture (VERDICT r4
weak #3). Single source of truth for the verdict thresholds."""
from __future__ import annotations

import sys
import time


def run_link_canary(quiet: bool = False):
    """Returns (cold_s, warm_s, verdict_str); prints one line to stderr
    unless quiet. Initializes the default jax backend as a side effect."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((1,), jnp.float32)
    f = jax.jit(lambda a: a + 1)
    t0 = time.time()
    float(f(x)[0])
    cold = time.time() - t0
    t0 = time.time()
    float(f(x)[0])
    warm = time.time() - t0
    verdict = ("healthy" if warm < 0.1 else
               "DEGRADED" if warm < 2.0 else "SEVERELY DEGRADED")
    if not quiet:
        print(f"link canary: cold {cold:.1f}s, warm {warm:.3f}s -> "
              f"{verdict} (healthy warm < 0.05s)", file=sys.stderr,
              flush=True)
    return cold, warm, verdict
