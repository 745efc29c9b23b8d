"""Task-space variant end-to-end: volume_group=sim_nocs_winding_number_field
with volume_task_space=True (reference apply_volume_task_space,
conv_implicit_wnf.py:279-310). The WNF is predicted in AABB-normalized SIM
space instead of canonical space; the predict engine must apply the same
substitution the training forward does."""
import json
import pathlib

import numpy as np
import pytest

from garmentnets_tpu.data.synthetic import generate_dataset
from test_e2e import COMMON_DM, SMALL_CONV, SMALL_MODEL

TS_DM = dict(COMMON_DM, volume_group="sim_nocs_winding_number_field")


@pytest.fixture(scope="module")
def synth_zarr(tmp_path_factory):
    path = tmp_path_factory.mktemp("e2e_ts") / "synth.zarr"
    generate_dataset(str(path), num_instances=3, grips_per_instance=2,
                     volume_size=16, mesh_res=8, pts_per_view=400)
    return str(path)


def test_synthetic_has_sim_volume_group(synth_zarr):
    from garmentnets_tpu.data import zarrlite
    root = zarrlite.open(synth_zarr, "r")
    key = next(k for k, _ in root["samples"].groups())
    g = root[f"samples/{key}/volume"]
    assert "sim_nocs_winding_number_field" in g
    wnf = g["sim_nocs_winding_number_field/16"][:]
    assert wnf.shape == (16, 16, 16)
    # a real surface crosses 0.5 inside the normalized unit cube
    assert wnf.min() < 0.5 < wnf.max()


@pytest.fixture(scope="module")
def runs(synth_zarr, tmp_path_factory):
    from garmentnets_tpu.harness import train_pointnet2, train_pipeline
    from garmentnets_tpu.harness import predict

    s1 = train_pointnet2.main({
        "model": dict(SMALL_MODEL, vis_per_items=0, max_vis_per_epoch_val=0),
        "trainer": {"max_epochs": 1, "num_devices": 2,
                    "checkpoint_top_k": 1, "resume_from_checkpoint": None,
                    "limit_train_batches": 1, "limit_val_batches": 1},
        "logger": {},
        "datamodule": dict(TS_DM, zarr_path=synth_zarr),
    }, run_dir=str(tmp_path_factory.mktemp("s1ts")))

    conv = dict(SMALL_CONV, volume_task_space=True)
    s2 = train_pipeline.main({
        "pointnet2_model": {
            "checkpoint_path": str(pathlib.Path(s1) / "checkpoints/last.ckpt")},
        "conv_implicit_model": conv,
        "trainer": {"max_epochs": 1, "num_devices": 2,
                    "checkpoint_top_k": 1, "resume_from_checkpoint": None,
                    "limit_train_batches": 2, "limit_val_batches": 1},
        "logger": {},
        "datamodule": dict(TS_DM, zarr_path=synth_zarr,
                           num_volume_sample=64, num_surface_sample=64),
    }, run_dir=str(tmp_path_factory.mktemp("s2ts")))

    pred = predict.main({
        "main": {"checkpoint_path":
                 str(pathlib.Path(s2) / "checkpoints/last.ckpt")},
        "prediction": {"subset": "test", "volume_size": 16,
                       "gradient_sigma": 0.5, "iso_surface_level": 0.5,
                       "gradient_direction": "ascent",
                       "use_hole_prediction": False},
        "logger": {},
        "datamodule": dict(TS_DM, zarr_path=synth_zarr, batch_size=1),
    }, run_dir=str(tmp_path_factory.mktemp("predts")))
    return pathlib.Path(s2), pathlib.Path(pred)


def test_task_space_training_losses_finite(runs):
    s2, _ = runs
    recs = [json.loads(x) for x in
            (s2 / "metrics.jsonl").read_text().strip().splitlines()]
    losses = [r["train_loss"] for r in recs if "train_loss" in r]
    assert losses and all(np.isfinite(v) for v in losses)


def test_task_space_predict_outputs(runs):
    from garmentnets_tpu.data import zarrlite
    _, pred = runs
    root = zarrlite.open(str(pred / "prediction.zarr"), "r")
    keys = [k for k, _ in root["samples"].groups()]
    assert len(keys) == 2
    for k in keys:
        mc = root[f"samples/{k}/marching_cubes_mesh"]
        assert "verts" in mc and "warp_field" in mc


def test_task_space_eval(runs, tmp_path_factory):
    from garmentnets_tpu.harness import eval as eval_mod
    _, pred = runs
    out = eval_mod.main({
        "main": {"prediction_output_dir": str(pred), "num_workers": 1},
        "override_all": {
            "value_threshold": 0.0,
            "value_key": "marching_cubes_mesh/volume_gradient_magnitude",
            "predict_holes": False, "volume_task_space": True},
        "eval": {
            "compute_optimal_gradient_treshold": {"enabled": False},
            "compute_pc_metrics": {"enabled": True},
            "compute_grip_point_metrics": {"enabled": False},
            "compute_chamfer": {"enabled": True, "num_points": 200,
                                "seed": 0},
            "compute_hybrid_chamfer": {"enabled": False},
            "compute_geodesic": {"enabled": False},
            "compute_hausdorff": {"enabled": False},
        },
        "vis": {"samples_per_instance": 0, "num_best": 0, "num_worst": 0,
                "num_normal": 0,
                "rank_metric": "chamfer_symmetrical_nocs_no_hole"},
        "logger": {},
    }, run_dir=str(tmp_path_factory.mktemp("evalts")))
    assert (pathlib.Path(out) / "summary.json").exists()
