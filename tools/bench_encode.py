"""Component-level timing of the predict encode program on the real chip.

Times each encode stage in isolation (separately jitted) plus the fused
encode, at production shapes (B=8, 6000 pts, 128^3). Guides kernel tuning;
not the headline bench (see bench.py).

Usage: python tools/bench_encode.py [--volume 128] [--batch 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=2):
    """Times fn via a scalar-fetch sync: on this platform block_until_ready
    does not actually block (PERF.md), so the only reliable sync is a host
    fetch — which must be TINY or the ~30 MB/s tunnel dominates. We jit a
    wrapper whose output is one scalar summing every output leaf (all the
    real work still executes; reductions cannot be DCE'd)."""
    import jax
    import jax.numpy as jnp

    def scalarized(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in leaves)

    wrapped = jax.jit(scalarized)
    for _ in range(warmup):
        out = wrapped(*args)
    float(out)
    t0 = time.time()
    for _ in range(n):
        out = wrapped(*args)
    float(out)
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--volume", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from garmentnets_tpu.core import jaxcfg
    jaxcfg.setup()
    from garmentnets_tpu.models.pipeline import (
        ConvImplicitWNFPipeline, PipelineConfig)
    from garmentnets_tpu.models.pointnet2_nocs import PointNet2NOCSConfig
    from garmentnets_tpu.harness.predict_engine import PredictEngine
    from garmentnets_tpu.ops import pointcloud as pc
    from garmentnets_tpu.ops.dense_decode import dense_decode
    from garmentnets_tpu.ops.gaussian import gaussian_gradient_magnitude
    from garmentnets_tpu.ops.isosurface import (
        extract_active_bricks, pack_brick_pages)

    B, N, VOL = args.batch, 6000, args.volume
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    pos = jnp.asarray((rng.rand(B, N, 3) - 0.5).astype(np.float32))

    cfg = PipelineConfig(pointnet2=PointNet2NOCSConfig())
    model = ConvImplicitWNFPipeline(cfg)
    batch = {"x": np.asarray(x), "pos": np.asarray(pos),
             "volume_query_points": rng.rand(B, 64, 3).astype(np.float32),
             "surf_query_points": rng.rand(B, 64, 3).astype(np.float32)}
    variables = jax.jit(
        lambda r: model.init(r, batch, train=False))(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    class _PrintingDict(dict):
        # a crash mid-run must not lose earlier measurements (a Mosaic
        # NotImplementedError at one precision ate a full chip session's
        # numbers once) -- print each row the moment it lands
        def __setitem__(self, k, v):
            if isinstance(v, float) and "err" not in k:
                print(f"{k:<42s} {v*1e3:8.2f} ms", flush=True)
            else:
                print(f"{k:<42s} {v}", flush=True)
            super().__setitem__(k, v)

    res = _PrintingDict()

    # --- fps ---
    fps_fn = jax.jit(lambda p: pc.furthest_point_sampling(p, 3000))
    res["fps 6000->3000"] = timeit(fps_fn, pos, n=args.n)

    # --- ball query (SA1 and SA2 shapes) ---
    centers1 = jnp.asarray(rng.rand(B, 3000, 3).astype(np.float32) - 0.5)
    centers2 = jnp.asarray(rng.rand(B, 750, 3).astype(np.float32) - 0.5)
    pts2 = jnp.asarray(rng.rand(B, 3000, 3).astype(np.float32) - 0.5)
    bq1 = jax.jit(lambda p, c: pc.ball_query(p, c, 0.05, k=64))
    bq2 = jax.jit(lambda p, c: pc.ball_query(p, c, 0.1, k=64))
    res["ball_query SA1 (6000x3000)"] = timeit(bq1, pos, centers1, n=args.n)
    res["ball_query SA2 (3000x750)"] = timeit(bq2, pts2, centers2, n=args.n)

    # --- full stage-1 (A/B: the fused Pallas SA kernel vs the XLA SA
    # path; backend resolves at TRACE time, so each variant is compiled
    # inside its backend_override) ---
    from garmentnets_tpu.kernels.sa_pallas import backend_override
    s1 = jax.jit(lambda v, xx, pp: model.apply(
        v, xx, pp, method="pointnet2_forward"))
    res["stage-1 full"] = timeit(s1, variables, x, pos, n=args.n)
    s1x = jax.jit(lambda v, xx, pp: model.apply(
        v, xx, pp, method="pointnet2_forward"))
    with backend_override("xla"):
        jax.block_until_ready(s1x(variables, x, pos))
    res["stage-1 full (xla SA)"] = timeit(s1x, variables, x, pos, n=args.n)

    # --- unet ---
    p2 = s1(variables, x, pos)
    nocs_data = jax.tree_util.tree_map(jnp.asarray, p2["nocs_data"])
    unet = jax.jit(lambda v, nd: model.apply(
        v, nd, train=False, method="unet3d_forward"))
    res["unet3d"] = timeit(unet, variables, nocs_data, n=args.n)

    # --- dense decode at each precision ---
    fv = unet(variables, nocs_data)
    engine = PredictEngine(cfg, variables, volume_size=VOL)
    fvt = jnp.swapaxes(fv, 1, 3)
    for name, prec in [("HIGHEST", jax.lax.Precision.HIGHEST),
                       ("HIGH", jax.lax.Precision.HIGH),
                       ("DEFAULT", jax.lax.Precision.DEFAULT)]:
        # pin backend='xla': dense_decode's default is 'auto', which
        # would silently time the fused kernel in the baseline rows too
        dd = jax.jit(lambda f, p=prec: dense_decode(
            f, engine._vd_layers, VOL, slab=engine._slab, precision=p,
            backend="xla"))
        res[f"dense_decode {name}"] = timeit(dd, fvt, n=args.n)
        if name == "HIGHEST":
            wnf_ref = np.asarray(dd(fvt))
        else:
            err = float(np.max(np.abs(np.asarray(dd(fvt)) - wnf_ref)))
            res[f"dense_decode {name} max|err|"] = err

    # --- fused Pallas decode (ops/dense_decode_pallas) at each precision ---
    from garmentnets_tpu.ops.dense_decode_pallas import (
        dense_decode_fused, fused_decode_available)
    ok, why = fused_decode_available()
    if not ok:
        res["dense_decode fused"] = f"unavailable: {why}"
    else:
        for name, prec in [("HIGHEST", jax.lax.Precision.HIGHEST),
                           ("HIGH", jax.lax.Precision.HIGH),
                           ("DEFAULT", jax.lax.Precision.DEFAULT)]:
            ddf = jax.jit(lambda f, p=prec: dense_decode_fused(
                f, engine._vd_layers, VOL, precision=p))
            res[f"dense_decode fused {name}"] = timeit(ddf, fvt, n=args.n)
            err = float(np.max(np.abs(np.asarray(ddf(fvt)) - wnf_ref)))
            res[f"dense_decode fused {name} max|err|"] = err

    dd_high = jax.jit(lambda f: dense_decode(
        f, engine._vd_layers, VOL, slab=engine._slab,
        precision=jax.lax.Precision.HIGH))
    wnf = dd_high(fvt)

    # --- ggm / extraction ---
    # backend='xla' pinned for the same reason as the decode baseline
    ggm_fn = jax.jit(lambda w: gaussian_gradient_magnitude(
        w, 0.5, backend="xla"))
    res["gaussian_gradient_magnitude"] = timeit(ggm_fn, wnf, n=args.n)
    try:
        from garmentnets_tpu.ops.gaussian_pallas import ggm_pallas
        ggm_p = jax.jit(lambda w: ggm_pallas(w, 0.5))
        res["ggm fused (pallas)"] = timeit(ggm_p, wnf, n=args.n)
        res["ggm fused max|err|"] = float(np.max(np.abs(
            np.asarray(ggm_p(wnf)) - np.asarray(ggm_fn(wnf)))))
    except Exception as e:  # noqa: BLE001 — kernel may not compile here
        res["ggm fused (pallas)"] = f"unavailable: {e!r}"
    ext = jax.jit(lambda w: extract_active_bricks(w, 0.5, engine.brick_cap))
    res["extract_active_bricks"] = timeit(ext, wnf, n=args.n)
    base, vals, counts = ext(wnf)
    pk = jax.jit(lambda b, v: pack_brick_pages(b, v, engine.brick_page))
    res["pack_brick_pages"] = timeit(pk, base, vals, n=args.n)

    # --- fused encode ---
    # pass variables/x/pos as ARGUMENTS: a no-arg closure would bake the
    # model weights into the HLO as constants (constant-foldable — not the
    # program the predict loop runs; see geometry._winding_number_jax)
    res["FUSED encode"] = timeit(engine._encode, variables, x, pos, n=args.n)

    print(f"-- {len(res)} rows measured --")


if __name__ == "__main__":
    main()
