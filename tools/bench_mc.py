"""Standalone host marching-cubes benchmark on the production brick format.

Isolates the `mc` row of tools/profile_bench_loop.py's host-attribution
table (the 159/309 ms-per-batch stage that dominates the pipelined bench
loop on 1-core hosts) so C++ kernel changes can be A/B-measured without
chip time. Feeds the SAME wire format the predict engine hands the kernel:
int8 4^3 bricks from ops/isosurface.extract_active_bricks over the bench's
analytic cloth WNF, with values+normals requested (the engine's call at
harness/predict_engine.py).

Replaces the reference's reliance on skimage's pre-built Cython timing
(reference predict.py:172-177) with a measurable local kernel.

Usage: python tools/bench_mc.py [--volume 128] [--heavy] [--reps 20]
Prints one JSON line per load.
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np  # noqa: E402


def _brick_load(vol: int, heavy: bool):
    import jax.numpy as jnp
    from bench import _cloth_like_wnf
    from garmentnets_tpu.ops.isosurface import extract_active_bricks

    cloth = _cloth_like_wnf(vol, heavy=heavy)
    cap = 32768 if vol >= 256 else 8192
    base, vals, counts = extract_active_bricks(
        jnp.asarray(cloth[None]), 0.5, cap)
    k = int(np.asarray(counts)[0])
    assert 0 < k <= cap, (k, cap)
    bi = np.asarray(base[0, :k])
    bv = np.asarray(vals[0, :k])
    return bi, bv


def run(vol: int, heavy: bool, reps: int, method: str) -> dict:
    from garmentnets_tpu.ops.marching_cubes import marching_cubes_bricks

    bi, bv = _brick_load(vol, heavy)
    spacing = (1.0 / (vol - 1),) * 3
    kw = dict(gradient_direction="ascent", return_values=True,
              return_normals=True, method=method)
    # warm-up: builds/loads the .so, faults in the pages
    v, f, vals, norms = marching_cubes_bricks(
        bi, bv, (vol, vol, vol), 0.5, spacing, **kw)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        marching_cubes_bricks(bi, bv, (vol, vol, vol), 0.5, spacing, **kw)
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return {
        "metric": "mc_ms_per_garment",
        "volume": vol,
        "heavy": heavy,
        "method": method,
        "bricks": int(len(bi)),
        "verts": int(len(v)),
        "faces": int(len(f)),
        "ms_median": round(times[len(times) // 2], 2),
        "ms_min": round(times[0], 2),
        "reps": reps,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--volume", type=int, default=0,
                    help="single volume size; 0 = the standard 3-load sweep")
    ap.add_argument("--heavy", action="store_true")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--method", default="cubes")
    args = ap.parse_args()
    if args.volume:
        loads = [(args.volume, args.heavy)]
    else:
        loads = [(128, False), (128, True), (256, False)]
    for vol, heavy in loads:
        print(json.dumps(run(vol, heavy, args.reps, args.method)))


if __name__ == "__main__":
    main()
