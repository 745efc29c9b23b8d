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


# verdict tiers (single source of truth; healthy hosts measure ~0.03 s)
HEALTHY_BELOW_S = 0.1
DEGRADED_BELOW_S = 2.0


def canary_line(cold: float, warm: float, verdict: str) -> str:
    return (f"link canary: cold {cold:.1f}s, warm {warm:.3f}s -> "
            f"{verdict} (healthy warm < {HEALTHY_BELOW_S:g}s)")


def run_link_canary(quiet: bool = False, printer=None):
    """Returns (cold_s, warm_s, verdict_str). Prints canary_line() to
    stderr unless quiet; `printer` overrides the output channel (e.g.
    bench.py's timestamped logger). Initializes the default jax backend
    as a side effect."""
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
    verdict = ("healthy" if warm < HEALTHY_BELOW_S else
               "DEGRADED" if warm < DEGRADED_BELOW_S
               else "SEVERELY DEGRADED")
    if not quiet:
        line = canary_line(cold, warm, verdict)
        if printer is not None:
            printer(line)
        else:
            print(line, file=sys.stderr, flush=True)
    return cold, warm, verdict
