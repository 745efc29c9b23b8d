"""Headline benchmark: garments/sec end-to-end predict on TPU.

Measures the full GarmentNets inference path at production scale
(BASELINE.md: 6000-point clouds, 32^3 feature grid, 128-ch 3D U-Net, dense
128^3 WNF decode, gaussian gradient magnitude, host marching cubes, warp-field
query at MC vertices) with device/host pipelining, batched multi-garment
inference (B=8; the reference is locked to batch 1, predict.py:62).

Weights are random-initialized (no released checkpoints are redistributable
here); a random net's WNF is iso-level noise, which would hand marching cubes
a pathological surface, so the MC + warp stage runs on a fixed realistic
sphere WNF while the device program still executes the full predicted-WNF
path. All FLOPs and transfers are therefore production-shaped.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6).
Baseline proxy = 1.0 garments/sec on the reference's RTX 2080Ti (412 GFLOP
dense decode + ~100-200 ms host Lewiner MC + batch-1 python loop; see
BASELINE.md) — the ">=10x garments/sec" target therefore maps to
vs_baseline >= 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    from garmentnets_tpu.core import jaxcfg
    jaxcfg.setup()
    from garmentnets_tpu.models.pipeline import PipelineConfig
    from garmentnets_tpu.models.pointnet2_nocs import PointNet2NOCSConfig
    from garmentnets_tpu.models.pipeline import ConvImplicitWNFPipeline
    from garmentnets_tpu.harness.predict_engine import PredictEngine
    from garmentnets_tpu.ops.isosurface import extract_active_cubes
    import jax.numpy as jnp

    B = int(os.environ.get("BENCH_BATCH", "8"))
    N = 6000
    VOL = int(os.environ.get("BENCH_VOLUME", "128"))
    N_BATCHES = int(os.environ.get("BENCH_BATCHES", "6"))

    # Pallas FPS autodetects in ops/pointcloud (GARMENTNETS_FPS overrides)
    from garmentnets_tpu.ops.pointcloud import _pallas_fps_available
    if _pallas_fps_available():
        print("using pallas FPS", file=sys.stderr)

    cfg = PipelineConfig(pointnet2=PointNet2NOCSConfig())
    model = ConvImplicitWNFPipeline(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "x": rng.rand(B, N, 3).astype(np.float32),
        "pos": (rng.rand(B, N, 3) - 0.5).astype(np.float32),
        "volume_query_points": rng.rand(B, 64, 3).astype(np.float32),
        "surf_query_points": rng.rand(B, 64, 3).astype(np.float32),
    }
    t0 = time.time()
    variables = jax.jit(
        lambda r: model.init(r, batch, train=False))(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)
    print(f"init: {time.time()-t0:.1f}s", file=sys.stderr)

    engine = PredictEngine(cfg, variables, volume_size=VOL,
                           gradient_sigma=0.5)

    # a random net's WNF is iso-level noise (see docstring); substitute the
    # active-cube fields of a realistic garment-sized surface so the host MC
    # + warp stage sees production-shaped work
    ax = np.linspace(0, 1, VOL, dtype=np.float32)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    sphere_wnf = 0.5 + (0.3 - np.sqrt(
        (gx - .5) ** 2 + (gy - .5) ** 2 + (gz - .5) ** 2)).astype(np.float32)
    base, vals, counts = extract_active_cubes(
        jnp.asarray(np.broadcast_to(sphere_wnf, (B,) + sphere_wnf.shape)),
        0.5, engine.active_cap)
    sub = {"active_base": base, "active_vals": vals, "active_counts": counts}

    # warmup / compile
    t0 = time.time()
    enc = dict(engine.encode(batch["x"], batch["pos"]), **sub)
    engine.prefetch(enc)
    meshes = engine.extract_meshes(enc)
    print(f"encode+MC compile: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    warps = engine.warp_collect(engine.warp_dispatch(enc, meshes))
    nv = len(meshes[0][0]) if meshes[0] else 0
    print(f"warp compile ({nv} verts): {time.time()-t0:.1f}s",
          file=sys.stderr)

    # timed loop: 3-stage software pipeline — device encode(i+1) runs while
    # the host does MC for i and collects warp results for i-1; all
    # device->host copies are prefetched asynchronously.
    t_start = time.time()
    done = 0
    enc = dict(engine.encode(batch["x"], batch["pos"]), **sub)
    engine.prefetch(enc)
    warp_handle = None
    for i in range(N_BATCHES):
        if i + 1 < N_BATCHES:
            nxt = dict(engine.encode(batch["x"], batch["pos"]), **sub)
            engine.prefetch(nxt)
        else:
            nxt = None
        meshes = engine.extract_meshes(enc)
        if warp_handle is not None:
            engine.warp_collect(warp_handle)
        warp_handle = engine.warp_dispatch(enc, meshes)
        done += len(meshes)
        enc = nxt
    engine.warp_collect(warp_handle)
    elapsed = time.time() - t_start
    gps = done / elapsed

    print(f"{done} garments in {elapsed:.2f}s", file=sys.stderr)
    baseline_gps = 1.0  # estimated reference RTX 2080Ti (see docstring)
    print(json.dumps({
        "metric": "end-to-end predict throughput "
                  f"(B={B}, {VOL}^3 WNF, 6000-pt clouds)",
        "value": round(gps, 3),
        "unit": "garments/sec",
        "vs_baseline": round(gps / baseline_gps, 2),
    }))


if __name__ == "__main__":
    main()
