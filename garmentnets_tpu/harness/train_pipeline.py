"""Stage-2 training CLI (reference `train_pipeline.py`).

Loads the frozen stage-1 checkpoint, injects its hparams + weights into the
pipeline (reference train_pipeline.py:26-34), trains volume+surface decoders
with the weighted implicit-WNF loss.
"""
from __future__ import annotations

import pathlib
import sys


from garmentnets_tpu.core import config as config_mod
from garmentnets_tpu.core.builders import (
    build_pointnet2_config, build_pipeline_config, pipeline_hparams)
from garmentnets_tpu.core.checkpoint import load_checkpoint
from garmentnets_tpu.data.dataset import ConvImplicitWNFDataModule
from garmentnets_tpu.harness.training import Trainer, make_train_fns
from garmentnets_tpu.models.pipeline import (
    ConvImplicitWNFPipeline, pipeline_loss)


def main(cfg, run_dir=None):
    run_dir = config_mod.make_run_dir(run_dir=run_dir)
    (pathlib.Path(run_dir) / "checkpoints").mkdir(exist_ok=True)

    # frozen stage-1 checkpoint (weights + hparams)
    s1_path = pathlib.Path(
        cfg["pointnet2_model"]["checkpoint_path"]).expanduser()
    s1_state, s1_hparams = load_checkpoint(s1_path)
    assert s1_hparams is not None, "stage-1 checkpoint missing hparams"
    pn2_cfg = build_pointnet2_config(s1_hparams)
    pipe_cfg = build_pipeline_config(cfg["conv_implicit_model"], pn2_cfg)
    model = ConvImplicitWNFPipeline(pipe_cfg)
    hparams = pipeline_hparams(pipe_cfg)

    datamodule = ConvImplicitWNFDataModule(**cfg["datamodule"])
    datamodule.prepare_data()
    config_mod.dump_config(cfg, run_dir)

    def init_fn(rng, batch):
        variables = model.init(rng, batch, train=False)
        # swap in the frozen stage-1 weights (reference :34 submodule swap)
        params = dict(variables["params"])
        params["pointnet2_nocs"] = s1_state["params"]
        batch_stats = dict(variables.get("batch_stats", {}))
        batch_stats["pointnet2_nocs"] = s1_state["batch_stats"]
        return {"params": params, "batch_stats": batch_stats}

    def apply_fn(variables, batch, train, mutable, rngs):
        return model.apply(variables, batch, train=train, mutable=mutable,
                           rngs=rngs)

    def loss_fn(out, batch):
        return pipeline_loss(pipe_cfg, out, batch)

    trainer_cfg = cfg["trainer"]
    trainer = Trainer(
        max_epochs=trainer_cfg["max_epochs"], run_dir=run_dir,
        checkpoint_top_k=trainer_cfg.get("checkpoint_top_k", 20),
        num_devices=trainer_cfg.get("num_devices", -1),
        limit_train_batches=trainer_cfg.get("limit_train_batches"),
        limit_val_batches=trainer_cfg.get("limit_val_batches"),
        profile_epochs=trainer_cfg.get("profile_epochs", 0),
        logger_cfg=cfg.get("logger"))

    init_state, train_step, eval_step = make_train_fns(
        init_fn, apply_fn, loss_fn, pipe_cfg.learning_rate, trainer.mesh)

    resume = trainer_cfg.get("resume_from_checkpoint")
    if resume:
        loaded, _ = load_checkpoint(resume)
        _orig_init_state = init_state

        def init_state(rng, batch):
            # restore into the freshly-built state template so optax state
            # regains its proper pytree structure from the msgpack dict
            from flax import serialization
            template = _orig_init_state(rng, batch)
            return serialization.from_state_dict(template, loaded)

    # per-epoch image logging (reference conv_implicit_wnf.py:345-403)
    epoch_vis_fn = None
    vis_per_items = cfg["conv_implicit_model"].get("vis_per_items", 0)
    val_loader = datamodule.val_dataloader()
    if vis_per_items > 0 and len(val_loader) > 0:
        from garmentnets_tpu.harness.vis_hooks import vis_stage2
        vis_batch = next(iter(val_loader))
        max_vis = cfg["conv_implicit_model"].get("max_vis_per_epoch_val", 10)
        bsz = cfg["datamodule"]["batch_size"]

        def epoch_vis_fn(state, epoch, step):
            out = model.apply(
                {"params": state["params"],
                 "batch_stats": state["batch_stats"]},
                vis_batch, train=False)
            vis_stage2(trainer.logger, vis_batch, out, 0, bsz,
                       vis_per_items, max_vis, is_train=False, step=step)

    trainer.fit(init_state, train_step, eval_step,
                datamodule.train_dataloader(), val_loader,
                hparams, epoch_vis_fn=epoch_vis_fn)
    return run_dir


def cli():
    overrides = config_mod.parse_cli(sys.argv[1:])
    cfg = config_mod.load_config("train_pipeline_default", overrides)
    print(main(cfg))


if __name__ == "__main__":
    cli()
