"""Microbench: neighbor-feature gather strategies at SA-module shapes.

The stage-1 breakdown (docs/PERF.md) lumps "conv MLPs/FP" at ~36 ms; the
MLP math itself is ~0.1 TFLOP (≈2 ms at realistic MXU rates), so most of
that time is suspected to be the [B, M, K] neighbor GATHERS feeding
PointConv (models/pointnet2.py SAModule). This tool times the candidate
formulations in isolation so the suspicion is measurable:

  two3     two take_along_axis gathers of 3-wide rows (current SAModule)
  one6     one gather of the pre-concatenated 6-wide rows
  one8     one gather of 8-padded rows (sublane-aligned)
  one128   one gather at SA2 shape (128-wide rows + 3-wide pos)

Run on the real chip: python tools/bench_gather.py [--n 20]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, n=20, warmup=2):
    """Deferred-fetch timing (mirrors tools/bench_encode.timeit): queue n
    launches, sync through ONE tiny scalar fetch after the loop — a
    per-iteration float() would add a full tunnel round trip to every rep
    and compress exactly the ms-scale differences this microbench exists
    to resolve."""
    import jax
    import jax.numpy as jnp

    def scalarized(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    jfn = jax.jit(scalarized)
    for _ in range(warmup):
        out = jfn(*args)
    float(out)
    t0 = time.time()
    for _ in range(n):
        out = jfn(*args)
    float(out)
    dt = (time.time() - t0) / n * 1000
    return f"{dt:7.2f} ms"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    import jax
    from garmentnets_tpu.core import jaxcfg
    jaxcfg.setup()
    import jax.numpy as jnp

    B, N, M, K = 8, 6000, 3000, 64
    rs = np.random.RandomState(0)
    x3 = jnp.asarray(rs.rand(B, N, 3).astype(np.float32))
    p3 = jnp.asarray(rs.rand(B, N, 3).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, N, size=(B, M, K)).astype(np.int32))
    res = {}

    def two3(xa, pa, i):
        nx = jnp.take_along_axis(xa[:, None], i[..., None], axis=2)
        np_ = jnp.take_along_axis(pa[:, None], i[..., None], axis=2)
        return nx, np_

    res["SA1 two3 (current)"] = timeit(two3, x3, p3, idx, n=args.n)

    x6 = jnp.concatenate([x3, p3], axis=-1)

    def one6(xa, i):
        return jnp.take_along_axis(xa[:, None], i[..., None], axis=2)

    res["SA1 one6"] = timeit(one6, x6, idx, n=args.n)

    x8 = jnp.concatenate(
        [x3, p3, jnp.zeros((B, N, 2), jnp.float32)], axis=-1)
    res["SA1 one8 (padded)"] = timeit(one6, x8, idx, n=args.n)

    # SA2 shape: 750 centers, 128-wide features + 3-wide positions
    M2 = 750
    f128 = jnp.asarray(rs.rand(B, M, 128).astype(np.float32))
    pa2 = jnp.asarray(rs.rand(B, M, 3).astype(np.float32))
    idx2 = jnp.asarray(rs.randint(0, M, size=(B, M2, K)).astype(np.int32))
    res["SA2 two gathers (128+3)"] = timeit(two3, f128, pa2, idx2, n=args.n)
    f131 = jnp.concatenate([f128, pa2], axis=-1)
    res["SA2 one gather (131)"] = timeit(one6, f131, idx2, n=args.n)

    for k, v in res.items():
        print(f"{k:28s} {v}", file=sys.stderr)
    print(res)


if __name__ == "__main__":
    main()
