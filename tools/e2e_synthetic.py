"""Production-scale end-to-end exercise on synthetic data.

Trains BOTH stages at production shapes (6000 pts, 32^3 grid, 128-ch U-Net,
B=8/B=24) on a synthetic category until the stage-2 WNF forms a clean
surface, then runs the REAL predict and eval CLIs against the trained
checkpoint — the full reference workflow (train_pointnet2 -> train_pipeline
-> predict -> eval, SURVEY.md §3) at real sizes, something the tiny-config
e2e tests cannot cover. Reports the predict CLI's measured garments/sec
(the engine-loop bench substitutes a synthetic surface; this path exercises
the WHOLE harness with a model whose WNF is actually meshable).

Usage:
  python tools/e2e_synthetic.py [--out DIR] [--instances 4] [--steps1 400]
                                [--steps2 400]
Artifacts land under --out (default: a temp dir): dataset zarr, both
checkpoints, prediction.zarr + summary.json, eval CSVs/summary.
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train_stage(model_kind, zarr_path, out_ckpt, steps, batch_size,
                dataset_kwargs, lr):
    import jax
    from garmentnets_tpu.data.dataset import ConvImplicitWNFDataset, Loader
    from garmentnets_tpu.harness.training import make_train_fns
    from garmentnets_tpu.core.checkpoint import save_checkpoint

    ds = ConvImplicitWNFDataset(zarr_path=zarr_path, metadata_cache_dir=None,
                                **dataset_kwargs)
    idxs = np.arange(len(ds))
    reps = max(1, (steps * batch_size) // max(len(ds), 1) + 1)
    loader = Loader(ds, np.concatenate([idxs] * reps), batch_size,
                    shuffle=True, num_workers=2, drop_last=True)

    if model_kind == "pointnet2":
        from garmentnets_tpu.models.pointnet2_nocs import (
            PointNet2NOCS, PointNet2NOCSConfig, get_metrics)
        from garmentnets_tpu.core.builders import pointnet2_hparams
        cfg = PointNet2NOCSConfig(learning_rate=lr)
        model = PointNet2NOCS(cfg)
        hparams = pointnet2_hparams(cfg)

        def init_fn(rng, b):
            return model.init(rng, b["x"], b["pos"], train=False)

        def apply_fn(v, b, train, mutable, rngs):
            return model.apply(v, b["x"], b["pos"], train=train,
                               mutable=mutable, rngs=rngs)

        def loss_fn(out, b):
            return get_metrics(cfg, out, b)[0]
    else:
        from garmentnets_tpu.models.pipeline import (
            ConvImplicitWNFPipeline, PipelineConfig, pipeline_loss)
        from garmentnets_tpu.models.pointnet2_nocs import PointNet2NOCSConfig
        from garmentnets_tpu.core.builders import pipeline_hparams
        from garmentnets_tpu.core.checkpoint import load_checkpoint
        s1_state, s1_hp = load_checkpoint(model_kind)   # path to stage-1
        cfg = PipelineConfig(pointnet2=PointNet2NOCSConfig(),
                             learning_rate=lr)
        model = ConvImplicitWNFPipeline(cfg)
        hparams = pipeline_hparams(cfg)

        def init_fn(rng, b):
            variables = model.init(rng, b, train=False)
            params = dict(variables["params"])
            params["pointnet2_nocs"] = s1_state["params"]
            stats = dict(variables.get("batch_stats", {}))
            stats["pointnet2_nocs"] = s1_state["batch_stats"]
            return {"params": params, "batch_stats": stats}

        def apply_fn(v, b, train, mutable, rngs):
            return model.apply(v, b, train=train, mutable=mutable, rngs=rngs)

        def loss_fn(out, b):
            return pipeline_loss(cfg, out, b)

    init_state, train_step, eval_step = make_train_fns(
        init_fn, apply_fn, loss_fn, lr)
    it = iter(loader)
    first = next(it)
    rng = jax.random.PRNGKey(0)
    state = init_state(rng, first)
    t0 = time.time()
    losses = []
    n = 0
    for batch in [first] + list(it):
        if n >= steps:
            break
        rng, k = jax.random.split(rng)
        state, m = train_step(state, batch, k)
        losses.append(m["loss"])
        n += 1
        if n % 100 == 0:
            print(f"  step {n}: loss {float(losses[-1]):.4f} "
                  f"({n / (time.time() - t0):.1f} steps/s)", flush=True)
    host_state = jax.tree_util.tree_map(np.asarray, state)
    save_checkpoint(out_ckpt, {"params": host_state["params"],
                               "batch_stats": host_state["batch_stats"]},
                    hparams)
    print(f"  trained {n} steps in {time.time()-t0:.0f}s, "
          f"loss {float(losses[0]):.4f} -> {float(losses[-1]):.4f}")
    return float(losses[0]), float(losses[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--instances", type=int, default=4)
    ap.add_argument("--steps1", type=int, default=400)
    ap.add_argument("--steps2", type=int, default=400)
    args = ap.parse_args()

    from garmentnets_tpu.core import jaxcfg
    jaxcfg.setup()
    out = pathlib.Path(args.out or tempfile.mkdtemp(prefix="e2e_synth_"))
    out.mkdir(parents=True, exist_ok=True)
    zp = str(out / "dataset.zarr")

    if not pathlib.Path(zp).exists():
        from garmentnets_tpu.data.synthetic import generate_dataset
        print(f"generating {args.instances}x3 production-size samples...",
              flush=True)
        t0 = time.time()
        generate_dataset(zp, num_instances=args.instances,
                         grips_per_instance=3, volume_size=128, mesh_res=24,
                         pts_per_view=3000, include_task_space=False)
        print(f"  dataset in {time.time()-t0:.0f}s")

    common = dict(num_pc_sample=6000, num_views=4, pc_noise_std=0,
                  enable_augumentation=True, random_rot_range=[-180, 180],
                  static_epoch_seed=False)
    print("stage-1 training (B=8)...", flush=True)
    train_stage("pointnet2", zp, str(out / "s1.ckpt"), args.steps1, 8,
                dict(common, volume_size=None), 1e-3)
    print("stage-2 training (B=8, frozen stage-1)...", flush=True)
    l0, l1 = train_stage(str(out / "s1.ckpt"), zp, str(out / "s2.ckpt"),
                         args.steps2, 8,
                         dict(common, num_volume_sample=6000,
                              num_surface_sample=6000, volume_size=128,
                              volume_group="nocs_winding_number_field"),
                         1e-3)

    from garmentnets_tpu.core import config as config_mod
    from garmentnets_tpu.harness import predict as predict_mod
    from garmentnets_tpu.harness import eval as eval_mod
    print("predict CLI (B=8)...", flush=True)
    cfg = config_mod.load_config("predict_default", [
        f"main.checkpoint_path={out / 's2.ckpt'}",
        f"datamodule.zarr_path={zp}",
        "datamodule.metadata_cache_dir=null",
        "datamodule.batch_size=8",
        "datamodule.num_workers=2",
        "prediction.subset=train",
    ])
    run_dir = predict_mod.main(cfg, run_dir=str(out / "predict_run"))
    summ = json.load(open(pathlib.Path(run_dir) / "summary.json"))
    print(f"  predict: {summ}")

    print("eval CLI...", flush=True)
    ecfg = config_mod.load_config("eval_default", [
        f"main.prediction_output_dir={run_dir}",
    ])
    eval_dir = eval_mod.main(ecfg, run_dir=str(out / "eval_run"))
    esumm = json.load(open(pathlib.Path(eval_dir) / "summary.json"))
    keep = {k: v for k, v in esumm.items()
            if "chamfer" in k or "nocs_pc_error_dist" in k}
    print(f"  eval summary (chamfer/nocs): {keep}")
    print(f"artifacts: {out}")


if __name__ == "__main__":
    main()
