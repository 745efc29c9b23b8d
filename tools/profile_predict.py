"""Per-stage predict-engine latency report (serial, unpipelined).

Breaks one batch into dispatch / extract (waits on the encode program +
page transfer + host MC) / warp dispatch / warp collect / host fetches, so
regressions land on a stage instead of a single end-to-end number. This is
the tool-ified version of the probe that caught the weights-reupload bug
(docs/PERF.md "Serving": numpy weight trees passed into the jitted
programs cost ~570 ms/batch of silent h2d).

Serial latency is NOT the throughput headline — bench.py pipelines
device/host stages; use this for attribution, bench.py for the number.

Usage:
  python tools/profile_predict.py CKPT ZARR [--batch 8] [--volume 128]
                                  [--reps 3] [--points 6000]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("zarr")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--volume", type=int, default=128)
    ap.add_argument("--points", type=int, default=6000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from garmentnets_tpu.core import jaxcfg
    jaxcfg.setup()
    from garmentnets_tpu.harness.predict import load_pipeline_checkpoint
    from garmentnets_tpu.harness.predict_engine import PredictEngine
    from tools.bench_serve import load_clouds

    x, pos = load_clouds(args.zarr, args.batch, args.points)
    cfg, variables = load_pipeline_checkpoint(args.ckpt)
    eng = PredictEngine(cfg, variables, volume_size=args.volume)

    t0 = time.time()
    enc = eng.encode(x, pos)
    eng.prefetch(enc)
    meshes = eng.extract_meshes(enc)
    eng.warp_batch(enc, meshes)
    print(f"warm (compile/cache-load): {time.time() - t0:.1f}s",
          file=sys.stderr)
    counts = np.asarray(enc["active_counts"])
    nv = [0 if m is None else len(m[0]) for m in meshes]
    print(f"bricks/garment: {counts.tolist()}  mc verts: {nv}",
          file=sys.stderr)

    extra = ("pred_nocs", "pred_nocs_confidence")
    for rep in range(args.reps):
        t0 = time.time()
        enc = eng.encode(x, pos)
        eng.prefetch(enc, extra_keys=extra)
        t1 = time.time()
        meshes = eng.extract_meshes(enc)   # waits on encode + pages, + MC
        t2 = time.time()
        handle = eng.warp_dispatch(enc, meshes)
        t3 = time.time()
        eng.warp_collect(handle)
        t4 = time.time()
        for k in extra:
            np.asarray(enc[k])
        t5 = time.time()
        print(f"rep{rep}: dispatch {t1-t0:.3f}s  "
              f"extract(enc wait+pages+MC) {t2-t1:.3f}s  "
              f"warp_dispatch {t3-t2:.3f}s  warp_collect {t4-t3:.3f}s  "
              f"host_fetch {t5-t4:.3f}s  TOTAL {t5-t0:.3f}s")


if __name__ == "__main__":
    main()
