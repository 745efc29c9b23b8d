"""Training-step throughput at production shapes on the real chip.

Measures the jitted stage-1 (B=8, 6000 pts) and stage-2 (B=24) train and
eval steps — forward-only vs full train step isolates the backward cost.
Reproduces the numbers quoted in docs/PERF.md.

Usage: python tools/bench_train.py [--stage 1|2|both] [--n 20]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit_state(fn, state, *args, n=20):
    """Times a (state, batch, ...) -> (state, metrics) step with donated
    state: chains the returned state and syncs through a scalar fetch."""
    import jax
    out = None
    for _ in range(2):
        state, out = fn(state, *args)
    float(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        state, out = fn(state, *args)
    float(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / n, state


def timeit_plain(fn, *args, n=20):
    import jax
    for _ in range(2):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / n


def bench_stage1(n):
    import jax
    from garmentnets_tpu.models.pointnet2_nocs import (
        PointNet2NOCS, PointNet2NOCSConfig, get_metrics)
    from garmentnets_tpu.harness.training import make_train_fns

    B, N = 8, 6000
    rng = np.random.RandomState(0)
    batch = {
        "x": rng.rand(B, N, 3).astype(np.float32),
        "pos": (rng.rand(B, N, 3) - 0.5).astype(np.float32),
        "y": rng.rand(B, N, 3).astype(np.float32),
        "nocs_grip_point": rng.rand(B, 3).astype(np.float32),
        "_valid_mask": np.ones((B,), np.float32),
    }
    cfg = PointNet2NOCSConfig()
    model = PointNet2NOCS(cfg)

    def init_fn(rng_, b):
        return model.init(rng_, b["x"], b["pos"], train=False)

    def apply_fn(variables, b, train, mutable, rngs):
        return model.apply(variables, b["x"], b["pos"], train=train,
                           mutable=mutable, rngs=rngs)

    def loss_fn(out, b):
        metrics, _ = get_metrics(cfg, out, b)
        return metrics
    init_state, train_step, eval_step = make_train_fns(
        init_fn, apply_fn, loss_fn, learning_rate=1e-4)
    state = init_state(jax.random.PRNGKey(0), batch)
    srng = jax.random.PRNGKey(1)

    t_eval = timeit_plain(lambda b: eval_step(state, b), batch, n=n)
    t_train, state = timeit_state(
        lambda s, b: train_step(s, b, srng), state, batch, n=n)
    print(f"stage-1 eval step (B={B}):  {t_eval*1e3:7.1f} ms "
          f"({B/t_eval:6.1f} samples/s)")
    print(f"stage-1 train step (B={B}): {t_train*1e3:7.1f} ms "
          f"({B/t_train:6.1f} samples/s)")


def bench_stage2(n):
    import jax
    from garmentnets_tpu.models.pipeline import (
        ConvImplicitWNFPipeline, PipelineConfig, pipeline_loss)
    from garmentnets_tpu.models.pointnet2_nocs import PointNet2NOCSConfig
    from garmentnets_tpu.harness.training import make_train_fns

    B, N, Q = 24, 6000, 6000
    rng = np.random.RandomState(0)
    batch = {
        "x": rng.rand(B, N, 3).astype(np.float32),
        "pos": (rng.rand(B, N, 3) - 0.5).astype(np.float32),
        "volume_query_points": rng.rand(B, Q, 3).astype(np.float32),
        "gt_volume_value": rng.rand(B, Q).astype(np.float32),
        "surf_query_points": rng.rand(B, Q, 3).astype(np.float32),
        "gt_sim_points": rng.rand(B, Q, 3).astype(np.float32),
        "_valid_mask": np.ones((B,), np.float32),
    }
    cfg = PipelineConfig(pointnet2=PointNet2NOCSConfig())
    model = ConvImplicitWNFPipeline(cfg)

    def init_fn(rng_, b):
        return model.init(rng_, b, train=False)

    def apply_fn(variables, b, train, mutable, rngs):
        return model.apply(variables, b, train=train, mutable=mutable,
                           rngs=rngs)

    def loss_fn(out, b):
        return pipeline_loss(cfg, out, b)
    init_state, train_step, eval_step = make_train_fns(
        init_fn, apply_fn, loss_fn, learning_rate=1e-4)
    state = init_state(jax.random.PRNGKey(0), batch)
    srng = jax.random.PRNGKey(1)

    t_eval = timeit_plain(lambda b: eval_step(state, b), batch, n=n)
    t_train, state = timeit_state(
        lambda s, b: train_step(s, b, srng), state, batch, n=n)
    print(f"stage-2 eval step (B={B}):  {t_eval*1e3:7.1f} ms "
          f"({B/t_eval:6.1f} samples/s)")
    print(f"stage-2 train step (B={B}): {t_train*1e3:7.1f} ms "
          f"({B/t_train:6.1f} samples/s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="both", choices=["1", "2", "both"])
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()
    from garmentnets_tpu.core import jaxcfg
    jaxcfg.setup()
    if args.stage in ("1", "both"):
        bench_stage1(args.n)
    if args.stage in ("2", "both"):
        bench_stage2(args.n)


if __name__ == "__main__":
    main()
