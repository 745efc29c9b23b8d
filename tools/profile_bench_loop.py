"""Host-time attribution for the PIPELINED bench loop (bench.py shape).

profile_predict.py times a serial, unpipelined batch; this tool instead
instruments the steady-state 5-stage pipelined loop the headline bench
runs, attributing each HOST-thread millisecond to a stage:

  dispatch   engine.encode() + fresh page substitution + prefetch issue
  counts     np.asarray(active_counts) wait inside extract_meshes
  pages      page fetch + unpack (the d2h the host must wait on)
  mc         the C++ marching-cubes calls
  wcollect   np.asarray of the depth-2 warp result buffer
  wdispatch  query-buffer build + h2d upload + warp program dispatch

On a 1-core host the loop's wall time ~= the sum of these (device work
hides underneath); on multi-core hosts the gap between sum and wall is
the overlap the OS found. Run on the real chip:

  python tools/profile_bench_loop.py [--batches 10] [--volume 128]
"""
from __future__ import annotations

import argparse
import collections
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--volume", type=int, default=128)
    ap.add_argument("--batches", type=int, default=10)
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
        extract_active_bricks, pack_brick_pages, unpack_brick_pages,
        read_page_counts)
    from garmentnets_tpu.ops.marching_cubes import marching_cubes_bricks
    from bench import _cloth_like_wnf

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

    cloth = _cloth_like_wnf(VOL, heavy=args.heavy)
    base, vals, counts = extract_active_bricks(
        jnp.asarray(np.broadcast_to(cloth, (B,) + cloth.shape)),
        0.5, engine.brick_cap, with_masks=engine.cube_masks)
    pages = jax.jit(
        lambda b, v, c: pack_brick_pages(b, v, engine.brick_page,
                                         counts=c))(base, vals, counts)
    zero_pages = jax.device_put(
        tuple(np.zeros(p.shape, p.dtype) for p in pages))
    zero_counts = jax.device_put(np.zeros(counts.shape, counts.dtype))
    _refresh = jax.jit(
        lambda ps, zps, c, zc: (tuple(p + z for p, z in zip(ps, zps)),
                                c + zc))

    def fresh_sub():
        ps, cs = _refresh(pages, zero_pages, counts, zero_counts)
        return {"active_pages": ps, "active_counts": cs}

    t = collections.defaultdict(float)

    def clock(key, fn, *a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        t[key] += time.perf_counter() - t0
        return out

    # instrumented extract_meshes (same logic, staged timers). counts ride
    # page 0's header row, and prefetch() coalesces the speculative prefix
    # into one device buffer — the 'pages' stage times the prefix fetch
    # (ONE transfer on a speculation hit), 'counts' the header decode.
    def extract_meshes_traced(enc):
        pages_d = enc["active_pages"]
        prefix = enc.get("_page_prefix")
        if prefix is not None:
            p0 = clock("pages", lambda: np.asarray(prefix[1]))
        else:
            p0 = clock("pages", lambda: np.asarray(pages_d[0]))
        counts_h = clock("counts", lambda: read_page_counts(p0))
        kmax = int(counts_h.max())
        S = engine.volume_size
        spacing = (1.0 / (S - 1),) * 3
        n_pages = max(1, -(-kmax // engine.brick_page))
        engine._spec_pages = n_pages

        def fetch():
            if prefix is not None and prefix[0] >= n_pages:
                return unpack_brick_pages([p0], header=True)
            srcs = ([p0] + list(pages_d[prefix[0]:n_pages])
                    if prefix is not None else list(pages_d[:n_pages]))
            for p in srcs:
                if hasattr(p, "copy_to_host_async"):
                    p.copy_to_host_async()
            return unpack_brick_pages(srcs, header=True)

        brick_idx, brick_vals = clock("pages", fetch)
        from garmentnets_tpu.ops.isosurface import split_brick_payload
        brick_vals, masks = split_brick_payload(brick_vals)
        results = [None] * len(counts_h)
        t0 = time.perf_counter()
        for b in range(len(counts_h)):
            n = int(counts_h[b])
            if n == 0:
                continue
            try:
                v, f, vv, norms = marching_cubes_bricks(
                    brick_idx[b, :n], brick_vals[b, :n], (S, S, S),
                    engine.iso_level, spacing,
                    gradient_direction=engine.gradient_direction,
                    return_values=True, return_normals=True,
                    cube_masks=None if masks is None else masks[b, :n])
                results[b] = (v, f, vv, norms)
            except ValueError:
                pass
        t["mc"] += time.perf_counter() - t0
        return results

    # warmup / compile
    enc = dict(engine.encode(batch["x"], batch["pos"]), **fresh_sub())
    engine.prefetch(enc)
    meshes = engine.extract_meshes(enc)
    engine.warp_collect(engine.warp_dispatch(enc, meshes))

    encs = collections.deque()
    warp_handles = collections.deque()
    done = 0

    def pump(e):
        nonlocal done
        meshes = extract_meshes_traced(e)
        while len(warp_handles) >= 2:
            clock("wcollect", engine.warp_collect, warp_handles.popleft())
        warp_handles.append(
            clock("wdispatch", engine.warp_dispatch, e, meshes))
        done += len(meshes)

    t_start = time.time()
    for i in range(args.batches):
        def dispatch():
            e = dict(engine.encode(batch["x"], batch["pos"]), **fresh_sub())
            engine.prefetch(e)
            return e
        encs.append(clock("dispatch", dispatch))
        if len(encs) > 2:
            pump(encs.popleft())
    while encs:
        pump(encs.popleft())
    while warp_handles:
        clock("wcollect", engine.warp_collect, warp_handles.popleft())
    wall = time.time() - t_start

    per = {k: 1000 * v / args.batches for k, v in sorted(t.items())}
    acct = sum(per.values())
    print(f"\n{done} garments in {wall:.2f}s "
          f"({done / wall:.2f} g/s), {1000 * wall / args.batches:.1f} "
          "ms/batch host wall")
    for k, v in sorted(per.items(), key=lambda kv: -kv[1]):
        print(f"  {k:10s} {v:7.1f} ms/batch")
    print(f"  {'SUM':10s} {acct:7.1f} ms/batch "
          f"(gap to wall = {1000 * wall / args.batches - acct:.1f} ms "
          "= un-instrumented host time / device waits)")


if __name__ == "__main__":
    main()
