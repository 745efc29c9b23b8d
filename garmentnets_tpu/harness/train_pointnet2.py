"""Stage-1 training CLI (reference `train_pointnet2.py`).

Builds the datamodule + PointNet2NOCS, trains with Adam + CE binning loss,
checkpoints top-k by val_loss (+ last) with embedded hparams, logs metrics to
the run dir. Data parallel over the local device mesh.
"""
from __future__ import annotations

import pathlib
import sys


from garmentnets_tpu.core import config as config_mod
from garmentnets_tpu.core.builders import (
    build_pointnet2_config, pointnet2_hparams)
from garmentnets_tpu.core.checkpoint import load_checkpoint
from garmentnets_tpu.data.dataset import ConvImplicitWNFDataModule
from garmentnets_tpu.harness.training import Trainer, make_train_fns
from garmentnets_tpu.models.pointnet2_nocs import PointNet2NOCS, get_metrics


def main(cfg, run_dir=None):
    run_dir = config_mod.make_run_dir(run_dir=run_dir)
    (pathlib.Path(run_dir) / "checkpoints").mkdir(exist_ok=True)

    datamodule = ConvImplicitWNFDataModule(**cfg["datamodule"])
    datamodule.prepare_data()

    model_cfg = build_pointnet2_config(cfg["model"])
    model = PointNet2NOCS(model_cfg)
    hparams = pointnet2_hparams(model_cfg)

    config_mod.dump_config(cfg, run_dir)

    def init_fn(rng, batch):
        return model.init(rng, batch["x"], batch["pos"], train=False)

    def apply_fn(variables, batch, train, mutable, rngs):
        return model.apply(variables, batch["x"], batch["pos"], train=train,
                           mutable=mutable, rngs=rngs)

    def loss_fn(out, batch):
        metrics, _ = get_metrics(model_cfg, out, batch)
        return metrics

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
        init_fn, apply_fn, loss_fn, model_cfg.learning_rate, trainer.mesh)

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

    # per-epoch image logging (reference wandb vis_batch,
    # networks/pointnet2_nocs.py:203-255)
    epoch_vis_fn = None
    vis_per_items = cfg["model"].get("vis_per_items", 0)
    val_loader = datamodule.val_dataloader()
    if vis_per_items > 0 and len(val_loader) > 0:
        from garmentnets_tpu.harness.vis_hooks import vis_stage1
        vis_batch = next(iter(val_loader))
        max_vis = cfg["model"].get("max_vis_per_epoch_val", 10)
        bsz = cfg["datamodule"]["batch_size"]

        def epoch_vis_fn(state, epoch, step):
            out = model.apply(
                {"params": state["params"],
                 "batch_stats": state["batch_stats"]},
                vis_batch["x"], vis_batch["pos"], train=False)
            _, nocs_data = get_metrics(model_cfg, out, vis_batch)
            vis_stage1(trainer.logger, vis_batch, nocs_data, 0, bsz,
                       vis_per_items, max_vis, is_train=False, step=step)

    trainer.fit(init_state, train_step, eval_step,
                datamodule.train_dataloader(), val_loader,
                hparams, epoch_vis_fn=epoch_vis_fn)
    return run_dir


def cli():
    overrides = config_mod.parse_cli(sys.argv[1:])
    cfg = config_mod.load_config("train_pointnet2_default", overrides)
    print(main(cfg))


if __name__ == "__main__":
    cli()
