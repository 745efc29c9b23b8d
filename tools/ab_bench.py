"""Paired A/B for predict-path knobs under an OSCILLATING device tunnel.

The tunnel on this host flips between healthy (~27 ms transfer floor,
0.03 s warm dispatch) and degraded (0.45 s warm dispatch; cold canaries of
50-500 s) on a timescale of minutes, so two SEPARATE bench invocations of
config A and config B mostly measure tunnel state, not the knob
(VERDICT r4 weak #4/#6). This tool interleaves A and B timed runs in ONE
process (A B B A A B ... pairs share tunnel state to within seconds) and
reports per-pair ratios plus medians; a knob's effect is credible only if
the per-pair ratios agree in direction.

Knobs:
  --knob concat   page-prefix coalescing on/off (engine.page_concat_enabled)
  --knob bucket   warp result bucket 4096 (A) vs 8192 (B)
  --knob masks    per-brick straddle masks on/off (wire-format flip)
  --knob normals  device-side MC normals vs host kernel normals

Usage: python tools/ab_bench.py --knob concat [--heavy] [--pairs 5]
       [--volume 128] [--batch 8] [--batches 10]

Round-5 verdicts from this tool are tabled in docs/PERF.md ("Round-5 A/B
campaign").
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--knob",
                    choices=("concat", "bucket", "masks", "normals"),
                    required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--volume", type=int, default=128)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--heavy", action="store_true")
    args = ap.parse_args()

    from garmentnets_tpu.core import jaxcfg
    jaxcfg.setup()
    import jax
    import jax.numpy as jnp
    from garmentnets_tpu.models.pipeline import (
        ConvImplicitWNFPipeline, PipelineConfig)
    from garmentnets_tpu.models.pointnet2_nocs import PointNet2NOCSConfig
    from garmentnets_tpu.harness.predict_engine import PredictEngine
    from garmentnets_tpu.ops.isosurface import (
        extract_active_bricks, pack_brick_pages)
    from bench import _cloth_like_wnf, run_pipeline

    # link canary first (attributes a bad session)
    from garmentnets_tpu.harness.linkcanary import run_link_canary
    run_link_canary()

    B, N, VOL = args.batch, 6000, args.volume
    cfg = PipelineConfig(pointnet2=PointNet2NOCSConfig())
    model = ConvImplicitWNFPipeline(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "x": rng.rand(B, N, 3).astype(np.float32),
        "pos": (rng.rand(B, N, 3) - 0.5).astype(np.float32),
        "volume_query_points": rng.rand(B, 64, 3).astype(np.float32),
        "surf_query_points": rng.rand(B, 64, 3).astype(np.float32),
    }
    variables = jax.jit(
        lambda r: model.init(r, batch, train=False))(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)
    engine = PredictEngine(cfg, variables, volume_size=VOL,
                           gradient_sigma=0.5)
    # the 'normals' knob flips between two ENGINES (the warp/encode
    # programs differ); weights are shared on device
    engine_dn = (PredictEngine(cfg, variables, volume_size=VOL,
                               gradient_sigma=0.5, device_normals=True)
                 if args.knob == "normals" else None)
    cur = [engine]

    cloth = _cloth_like_wnf(VOL, heavy=args.heavy)
    # two substituted page sets (with and without straddle masks) so the
    # 'masks' knob flips the actual wire format per side
    page_sets = {}
    zero_counts = None
    for wm in ((False, True) if args.knob == "masks" else
               (engine.cube_masks,)):
        base, vals, counts = extract_active_bricks(
            jnp.asarray(np.broadcast_to(cloth, (B,) + cloth.shape)),
            0.5, engine.brick_cap, with_masks=wm)
        pages = jax.jit(
            lambda b, v, c: pack_brick_pages(b, v, engine.brick_page,
                                             counts=c))(base, vals, counts)
        zero_pages = jax.device_put(
            tuple(np.zeros(p.shape, p.dtype) for p in pages))
        zero_counts = jax.device_put(np.zeros(counts.shape, counts.dtype))
        page_sets[wm] = (pages, zero_pages, counts)
    _refresh = jax.jit(
        lambda ps, zps, c, zc: (tuple(p + z for p, z in zip(ps, zps)),
                                c + zc))
    active_set = [next(iter(page_sets))]

    def fresh_sub():
        pages, zero_pages, counts = page_sets[active_set[0]]
        ps, cs = _refresh(pages, zero_pages, counts, zero_counts)
        return {"active_pages": ps, "active_counts": cs}

    def timed_run(n_batches):
        # the SHARED production pipeline loop (bench.run_pipeline): A/B
        # verdicts are only valid if both sides run the exact bench shape
        done, elapsed = run_pipeline(cur[0], batch, fresh_sub, n_batches)
        return done / elapsed

    def set_knob(side):      # side: 'A' or 'B'
        if args.knob == "concat":
            engine.page_concat_enabled = side == "A"
        elif args.knob == "bucket":
            engine.warp_bucket = 4096 if side == "A" else 8192
        elif args.knob == "masks":
            active_set[0] = side == "A"
        elif args.knob == "normals":
            cur[0] = engine_dn if side == "A" else engine

    labels = {"concat": ("prefix-concat ON", "prefix-concat OFF"),
              "bucket": ("warp bucket 4096", "warp bucket 8192"),
              "masks": ("straddle masks ON", "straddle masks OFF"),
              "normals": ("device normals", "host normals")}
    la, lb = labels[args.knob]

    # warm both configs (compiles + speculation state)
    for side in ("A", "B"):
        set_knob(side)
        timed_run(3)

    ratios = []
    a_all, b_all = [], []
    for k in range(args.pairs):
        # alternate order within pairs to cancel drift: A B | B A | A B ...
        order = ("A", "B") if k % 2 == 0 else ("B", "A")
        res = {}
        for side in order:
            set_knob(side)
            res[side] = timed_run(args.batches)
        a, b = res["A"], res["B"]
        a_all.append(a)
        b_all.append(b)
        ratios.append(a / b)
        print(f"pair {k}: {la} {a:6.2f} g/s | {lb} {b:6.2f} g/s | "
              f"A/B {a / b:.3f}", flush=True)
    print(f"\nmedian {la}: {np.median(a_all):.2f} g/s | "
          f"median {lb}: {np.median(b_all):.2f} g/s | "
          f"median A/B ratio {np.median(ratios):.3f} "
          f"(pairs {' '.join(f'{r:.3f}' for r in ratios)})")


if __name__ == "__main__":
    main()
