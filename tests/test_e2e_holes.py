"""Hole-prediction end-to-end (VERDICT round-1 item 5): train stage-2 with
the mc-surface decoder on (reference conv_implicit_wnf.py:253-277), predict
with use_hole_prediction=True (reference predict.py:202-209), and evaluate
with the value_key=is_on_surface_logits branch (reference
config/eval_default.yaml:8)."""
import json
import pathlib

import numpy as np
import pytest

from garmentnets_tpu.data.synthetic import generate_dataset
from test_e2e import COMMON_DM, SMALL_CONV, SMALL_MODEL


@pytest.fixture(scope="module")
def synth_zarr(tmp_path_factory):
    path = tmp_path_factory.mktemp("e2e_holes") / "synth.zarr"
    generate_dataset(str(path), num_instances=3, grips_per_instance=2,
                     volume_size=16, mesh_res=8, pts_per_view=400)
    return str(path)


@pytest.fixture(scope="module")
def runs(synth_zarr, tmp_path_factory):
    from garmentnets_tpu.harness import train_pointnet2, train_pipeline
    from garmentnets_tpu.harness import predict

    s1_dir = tmp_path_factory.mktemp("s1h")
    s1 = train_pointnet2.main({
        "model": dict(SMALL_MODEL, vis_per_items=0, max_vis_per_epoch_val=0),
        "trainer": {"max_epochs": 1, "num_devices": 2,
                    "checkpoint_top_k": 1, "resume_from_checkpoint": None,
                    "limit_train_batches": 1, "limit_val_batches": 1},
        "logger": {},
        "datamodule": dict(COMMON_DM, zarr_path=synth_zarr),
    }, run_dir=str(s1_dir))

    conv = dict(SMALL_CONV, mc_surface_loss_weight=0.5)
    s2_dir = tmp_path_factory.mktemp("s2h")
    s2 = train_pipeline.main({
        "pointnet2_model": {
            "checkpoint_path": str(pathlib.Path(s1) / "checkpoints/last.ckpt")},
        "conv_implicit_model": conv,
        "trainer": {"max_epochs": 1, "num_devices": 2,
                    "checkpoint_top_k": 1, "resume_from_checkpoint": None,
                    "limit_train_batches": 2, "limit_val_batches": 1},
        "logger": {},
        "datamodule": dict(COMMON_DM, zarr_path=synth_zarr,
                           num_volume_sample=64, num_surface_sample=64,
                           num_mc_surface_sample=64),
    }, run_dir=str(s2_dir))

    # Training augmentation is OS-entropy seeded (reference parity), so a
    # 1-epoch model's WNF range varies run to run; sweep iso levels until a
    # surface crosses (the hole path needs >=1 non-sentinel mesh).
    from garmentnets_tpu.data import zarrlite

    def has_surface(run_dir):
        root = zarrlite.open(str(pathlib.Path(run_dir) / "prediction.zarr"),
                             "r")
        return any(root[f"samples/{k}/marching_cubes_mesh/verts"].shape[0] > 1
                   for k, _ in root["samples"].groups())

    pred = None
    for iso in (0.5, 0.4, 0.6, 0.3, 0.7):
        pred_dir = tmp_path_factory.mktemp(f"predh_{iso}")
        pred = predict.main({
            "main": {"checkpoint_path":
                     str(pathlib.Path(s2) / "checkpoints/last.ckpt")},
            "prediction": {"subset": "test", "volume_size": 16,
                           "gradient_sigma": 0.5, "iso_surface_level": iso,
                           "gradient_direction": "ascent",
                           "use_hole_prediction": True},
            "logger": {},
            "datamodule": dict(COMMON_DM, zarr_path=synth_zarr,
                               batch_size=1),
        }, run_dir=str(pred_dir))
        if has_surface(pred):
            break
    return pathlib.Path(s2), pathlib.Path(pred)


def test_mc_surface_loss_trained(runs):
    s2, _ = runs
    recs = [json.loads(x) for x in
            (s2 / "metrics.jsonl").read_text().strip().splitlines()]
    mc_losses = [r["train_mc_surface_loss"] for r in recs
                 if "train_mc_surface_loss" in r]
    assert mc_losses and all(np.isfinite(v) for v in mc_losses)


def test_prediction_zarr_has_hole_outputs(runs):
    from garmentnets_tpu.data import zarrlite
    _, pred = runs
    root = zarrlite.open(str(pred / "prediction.zarr"), "r")
    keys = [k for k, _ in root["samples"].groups()]
    found_surface = False
    for k in keys:
        mc = root[f"samples/{k}/marching_cubes_mesh"]
        nverts = mc["verts"].shape[0]
        if nverts <= 1 and np.isnan(mc["verts"][:]).any():
            continue  # NaN sentinel (MC failure) — no hole outputs expected
        found_surface = True
        assert "is_on_surface" in mc
        assert "is_on_surface_logits" in mc
        assert mc["is_on_surface"].shape == (nverts,)
        logits = mc["is_on_surface_logits"][:]
        assert np.isfinite(logits).all()
        np.testing.assert_array_equal(mc["is_on_surface"][:], logits > 0)
    assert found_surface, "every test sample hit the MC NaN sentinel"


def test_eval_hole_logits_value_key(runs, tmp_path_factory):
    """Eval's value-indirection branch with the hole head's logits as the
    on-surface criterion (threshold 0 == logit decision boundary)."""
    from garmentnets_tpu.harness import eval as eval_mod
    _, pred = runs
    run_dir = tmp_path_factory.mktemp("evalh")
    out = eval_mod.main({
        "main": {"prediction_output_dir": str(pred), "num_workers": 1},
        "override_all": {
            "value_threshold": 0.0,
            "value_key": "marching_cubes_mesh/is_on_surface_logits",
            "predict_holes": True, "volume_task_space": False},
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
    }, run_dir=str(run_dir))
    out = pathlib.Path(out)
    summary = json.loads((out / "summary.json").read_text())
    chamfer_keys = [k for k in summary if "chamfer" in k]
    assert chamfer_keys, summary
    assert any(np.isfinite(summary[k]) for k in chamfer_keys)
