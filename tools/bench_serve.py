"""Serving-throughput benchmark: concurrent clients against PredictService.

Measures the resident inference server (harness/serve.py) end to end —
request batching, device/host pipelining, depth-2 warp collection — with
REAL garment clouds, because feeding a trained model random inputs
produces garbage WNFs that overflow the brick cap into the slow
full-volume fallback (see docs/PERF.md "Serving").

Usage:
  python tools/bench_serve.py CKPT ZARR [--clients 4] [--rounds 8]
                              [--batch 8] [--volume 128]

Prints one JSON line {"metric", "value", "unit"} like bench.py.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_clouds(zarr_path: str, batch: int, num_points: int):
    from garmentnets_tpu.data.dataset import ConvImplicitWNFDataset
    ds = ConvImplicitWNFDataset(
        zarr_path=zarr_path, metadata_cache_dir=None,
        num_pc_sample=num_points, num_volume_sample=0, num_surface_sample=0,
        num_mc_surface_sample=0, surface_sample_ratio=0,
        surface_sample_std=0.05, surface_normal_noise_ratio=0,
        surface_normal_std=0.01, enable_augumentation=False,
        random_rot_range=[-180, 180], num_views=4, pc_noise_std=0,
        volume_size=128, volume_group="nocs_winding_number_field",
        tsdf_clip_value=None, volume_absolute_value=False,
        include_volume=False, static_epoch_seed=True)
    samples = [ds[i % len(ds)] for i in range(batch)]
    return (np.stack([s["x"] for s in samples]),
            np.stack([s["pos"] for s in samples]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("zarr")
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--volume", type=int, default=128)
    ap.add_argument("--points", type=int, default=6000)
    args = ap.parse_args()

    from garmentnets_tpu.core import jaxcfg
    jaxcfg.setup()
    # link canary (the tunnel oscillates healthy<->degraded on ~minute
    # timescales — docs/PERF.md round-5 A/B methodology): print it so a
    # bad session is attributable
    from garmentnets_tpu.harness.linkcanary import run_link_canary
    run_link_canary()
    from garmentnets_tpu.harness.serve import PredictService

    x, pos = load_clouds(args.zarr, args.batch, args.points)
    svc = PredictService(args.ckpt, batch_size=args.batch,
                         num_points=args.points, volume_size=args.volume,
                         batch_window_ms=10.0)
    t0 = time.time()
    # generous warm timeout: a cold encode+warp compile through the axon
    # tunnel can exceed submit()'s 300 s default (observed ~160-400 s)
    res = svc.submit(x, pos, timeout=1500.0)
    print(f"warm: {time.time() - t0:.1f}s; ok="
          f"{[int(r['ok']) for r in res]}", file=sys.stderr)

    lat_lock = threading.Lock()
    latencies = []

    def client(_):
        for _ in range(args.rounds):
            t = time.time()
            svc.submit(x, pos)
            with lat_lock:
                latencies.append(time.time() - t)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    total = args.clients * args.rounds * args.batch
    gps = total / dt
    lat = np.asarray(sorted(latencies))
    p50, p95, pmax = (float(np.percentile(lat, 50)),
                      float(np.percentile(lat, 95)), float(lat[-1]))
    print(f"{total} garments in {dt:.2f}s over {svc.stats['batches']} "
          f"device batches; request latency p50 {p50*1000:.0f} ms / "
          f"p95 {p95*1000:.0f} ms / max {pmax*1000:.0f} ms", file=sys.stderr)
    print(json.dumps({
        "metric": f"serving throughput ({args.clients} clients, B="
                  f"{args.batch}, {args.volume}^3 WNF)",
        "value": round(gps, 3), "unit": "garments/sec",
        "latency_ms": {"p50": round(p50 * 1000), "p95": round(p95 * 1000),
                       "max": round(pmax * 1000)}}))
    svc.close()


if __name__ == "__main__":
    main()
