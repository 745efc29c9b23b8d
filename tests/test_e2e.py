"""End-to-end smoke tests: train -> checkpoint -> predict -> eval on a tiny
synthetic dataset (the reference's Tshirt-sample workflow, SURVEY.md §7 step
4, shrunk to CI size)."""
import json
import pathlib

import numpy as np
import pytest

from garmentnets_tpu.core import config as config_mod
from garmentnets_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def synth_zarr(tmp_path_factory):
    path = tmp_path_factory.mktemp("e2e") / "synth.zarr"
    generate_dataset(str(path), num_instances=3, grips_per_instance=2,
                     volume_size=16, mesh_res=8, pts_per_view=400)
    return str(path)


COMMON_DM = dict(
    metadata_cache_dir=None, batch_size=2, num_workers=0,
    num_pc_sample=256, num_volume_sample=0, num_surface_sample=0,
    num_mc_surface_sample=0, surface_sample_ratio=0, surface_sample_std=0.05,
    surface_normal_noise_ratio=0, surface_normal_std=0.01,
    enable_augumentation=True, random_rot_range=[-180, 180], num_views=4,
    pc_noise_std=0, volume_size=16,
    volume_group="nocs_winding_number_field", tsdf_clip_value=None,
    volume_absolute_value=False, include_volume=False,
    static_epoch_seed=False, dataset_split=[1, 1, 1], split_seed=0)

SMALL_MODEL = dict(feature_dim=32, batch_norm=True, dropout=True,
                   sa1_ratio=0.5, sa1_r=0.1, sa2_ratio=0.25, sa2_r=0.2,
                   fp3_k=1, fp2_k=3, fp1_k=3, symmetry_axis=None,
                   nocs_bins=8, learning_rate=1e-3, nocs_loss_weight=1,
                   grip_point_loss_weight=1)

SMALL_CONV = {
    "volume_agg_params": {
        "nn_channels": [41, 41, 32], "batch_norm": True,
        "grid_shape": [8, 8, 8], "reduce_method": "max",
        "include_point_feature": True, "include_confidence_feature": True},
    "unet3d_params": {"in_channels": 32, "out_channels": 32, "f_maps": 8,
                      "layer_order": "gcr", "num_groups": 4,
                      "num_levels": 2},
    "volume_decoder_params": {"nn_channels": [32, 32, 1],
                              "batch_norm": True},
    "surface_decoder_params": {"nn_channels": [32, 32, 3],
                               "batch_norm": True},
    "mc_surface_decoder_params": {"nn_channels": [32, 32, 1],
                                  "batch_norm": True},
    "volume_loss_weight": 1.0, "surface_loss_weight": 1.0,
    "mc_surface_loss_weight": 0, "volume_classification": False,
    "volume_task_space": False, "learning_rate": 1e-3, "loss_type": "l2",
}


@pytest.fixture(scope="module")
def stage1_run(synth_zarr, tmp_path_factory):
    from garmentnets_tpu.harness import train_pointnet2
    run_dir = tmp_path_factory.mktemp("s1")
    cfg = {
        "model": dict(SMALL_MODEL, vis_per_items=1,
                      max_vis_per_epoch_val=2),
        "trainer": {"max_epochs": 2, "num_devices": 2,
                    "checkpoint_top_k": 2, "resume_from_checkpoint": None,
                    "limit_train_batches": 2, "limit_val_batches": 1},
        "logger": {},
        "datamodule": dict(COMMON_DM, zarr_path=synth_zarr),
    }
    out = train_pointnet2.main(cfg, run_dir=str(run_dir))
    return pathlib.Path(out)


def test_stage1_training(stage1_run):
    ckpts = list((stage1_run / "checkpoints").glob("epoch=*.ckpt"))
    assert len(ckpts) == 2
    assert (stage1_run / "checkpoints/last.ckpt").exists()
    # per-epoch vis images were written
    assert list((stage1_run / "media").glob("val_*.png"))
    lines = (stage1_run / "metrics.jsonl").read_text().strip().splitlines()
    recs = [json.loads(x) for x in lines]
    train_losses = [r["train_loss"] for r in recs if "train_loss" in r]
    # 4-instance train split -> 1 batch/epoch (drop_last) x 2 epochs
    assert len(train_losses) == 2
    assert all(np.isfinite(v) for v in train_losses)
    # the model learns: loss decreases across steps
    assert train_losses[-1] < train_losses[0]


@pytest.fixture(scope="module")
def stage2_run(synth_zarr, stage1_run, tmp_path_factory):
    from garmentnets_tpu.harness import train_pipeline
    run_dir = tmp_path_factory.mktemp("s2")
    cfg = {
        "pointnet2_model": {
            "checkpoint_path": str(stage1_run / "checkpoints/last.ckpt")},
        "conv_implicit_model": dict(SMALL_CONV),
        "trainer": {"max_epochs": 1, "num_devices": 2,
                    "checkpoint_top_k": 2, "resume_from_checkpoint": None,
                    "limit_train_batches": 2, "limit_val_batches": 1},
        "logger": {},
        "datamodule": dict(COMMON_DM, zarr_path=synth_zarr,
                           num_volume_sample=64, num_surface_sample=64),
    }
    out = train_pipeline.main(cfg, run_dir=str(run_dir))
    return pathlib.Path(out)


def test_stage2_training(stage2_run):
    assert (stage2_run / "checkpoints/last.ckpt").exists()


@pytest.fixture(scope="module")
def predict_run(synth_zarr, stage2_run, tmp_path_factory):
    from garmentnets_tpu.harness import predict
    run_dir = tmp_path_factory.mktemp("pred")
    cfg = {
        "main": {"checkpoint_path":
                 str(stage2_run / "checkpoints/last.ckpt")},
        "prediction": {"subset": "test", "volume_size": 16,
                       "gradient_sigma": 0.5, "iso_surface_level": 0.5,
                       "gradient_direction": "ascent",
                       "use_hole_prediction": False, "query_chunk": 8},
        "logger": {},
        "datamodule": dict(COMMON_DM, zarr_path=synth_zarr, batch_size=1),
    }
    out = predict.main(cfg, run_dir=str(run_dir))
    return pathlib.Path(out)


def test_predict_outputs(predict_run):
    from garmentnets_tpu.data import zarrlite
    root = zarrlite.open(str(predict_run / "prediction.zarr"), "r")
    keys = [k for k, _ in root["samples"].groups()]
    assert len(keys) == 2  # one test instance x 2 grips
    g = root[f"samples/{keys[0]}"]
    for sub in ("marching_cubes_mesh", "point_cloud",
                "gt_marching_cubes_mesh", "gt_mesh", "misc"):
        assert sub in g, sub
    mc = g["marching_cubes_mesh"]
    for arr in ("verts", "faces", "normals", "volume_value",
                "volume_gradient_magnitude", "warp_field"):
        assert arr in mc, arr
    # volume_value is the TRUE per-vertex WNF gather (skimage `values`
    # semantics — max over the crossing edge's endpoints, so >= iso level),
    # not a constant fill (reference stores skimage's output,
    # predict.py:195-197)
    vv = mc["volume_value"][:]
    nverts = len(mc["verts"][:])
    if nverts > 1:  # non-null sample
        # Invariants guaranteed for ANY valid mesh from ANY trained model
        # (the e2e training here is nondeterministic — the dataset's
        # static_epoch_seed=False train path seeds RandomState from OS
        # entropy — so statistical assertions like vv.std()>0 are flaky by
        # construction on a barely-trained 16^3 field; the per-vertex value
        # SEMANTICS are pinned deterministically by the MC unit tests:
        # test_marching_cubes native/python value-map equality and the
        # brick return_values oracle):
        #  1. one value per vertex (the CLI wires the kernel's mc_values
        #     through, not a scalar or wrong-length fill)
        #  2. all finite (no NaN sentinel leaked into a non-null sample)
        #  3. value = max of the crossing edge's endpoints >= iso level,
        #     up to f16 rounding of the downloaded field
        assert vv.shape == (nverts,)
        assert np.all(np.isfinite(vv))
        assert np.all(vv >= 0.5 - 5e-3), vv.min()
    pc = g["point_cloud"]
    assert pc["pred_nocs"].shape == (256, 3)
    assert pc["input_rgb"].dtype == np.uint8
    assert g["misc/global_feature"].shape == (1024,)
    # reference quirk preserved: the global grip point maps argmax bins
    # through a VirtualGrid of the PREDICTION volume (reference
    # predict.py:145,262) — bin/(volume_size-1), so with 8 bins on a 16^3
    # prediction grid every coordinate is <= 7/15
    grip = g["misc/pred_global_nocs_grip_point"][:]
    assert grip.shape == (3,)
    assert (grip <= 7 / 15 + 1e-6).all() and (grip >= 0).all()
    assert np.allclose(grip * 15, np.round(grip * 15), atol=1e-5)
    # config snapshot written for eval consumption
    assert (predict_run / "config.yaml").exists()


def test_batched_predict_matches_bs1(synth_zarr, stage2_run, predict_run,
                                     tmp_path_factory):
    """Batched predict (bs=2, lifted from the reference's bs==1 assert)
    must produce the same per-sample outputs as bs=1."""
    from garmentnets_tpu.harness import predict
    from garmentnets_tpu.data import zarrlite
    run_dir = tmp_path_factory.mktemp("pred_b2")
    cfg = {
        "main": {"checkpoint_path":
                 str(stage2_run / "checkpoints/last.ckpt")},
        "prediction": {"subset": "test", "volume_size": 16,
                       "gradient_sigma": 0.5, "iso_surface_level": 0.5,
                       "gradient_direction": "ascent",
                       "use_hole_prediction": False},
        "logger": {},
        "datamodule": dict(COMMON_DM, zarr_path=synth_zarr, batch_size=2,
                           static_epoch_seed=True),
    }
    out2 = pathlib.Path(predict.main(cfg, run_dir=str(run_dir)))
    r1 = zarrlite.open(str(predict_run / "prediction.zarr"), "r")
    r2 = zarrlite.open(str(out2 / "prediction.zarr"), "r")
    keys = [k for k, _ in r2["samples"].groups()]
    assert len(keys) == 2
    for k in keys:
        a = r1[f"samples/{k}/point_cloud/pred_nocs"][:]
        b = r2[f"samples/{k}/point_cloud/pred_nocs"][:]
        # val/test datasets are static-seeded, so inputs match; outputs
        # must agree to fp tolerance
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)
        va = r1[f"samples/{k}/marching_cubes_mesh/verts"][:]
        vb = r2[f"samples/{k}/marching_cubes_mesh/verts"][:]
        assert (len(va) == 1) == (len(vb) == 1)  # same null/non-null status


def test_predict_no_logits_flag(synth_zarr, stage2_run, tmp_path_factory):
    """prediction.store_pred_nocs_logits=False (throughput mode) must skip
    ONLY point_cloud/pred_nocs_logits — every other schema array stays
    (default True keeps exact reference-schema parity; VERDICT r3 #6)."""
    from garmentnets_tpu.harness import predict
    from garmentnets_tpu.data import zarrlite
    run_dir = tmp_path_factory.mktemp("pred_nl")
    cfg = {
        "main": {"checkpoint_path":
                 str(stage2_run / "checkpoints/last.ckpt")},
        "prediction": {"subset": "test", "volume_size": 16,
                       "gradient_sigma": 0.5, "iso_surface_level": 0.5,
                       "gradient_direction": "ascent",
                       "use_hole_prediction": False,
                       "store_pred_nocs_logits": False},
        "logger": {},
        "datamodule": dict(COMMON_DM, zarr_path=synth_zarr, batch_size=1),
    }
    out = pathlib.Path(predict.main(cfg, run_dir=str(run_dir)))
    root = zarrlite.open(str(out / "prediction.zarr"), "r")
    keys = [k for k, _ in root["samples"].groups()]
    assert len(keys) == 2
    for k in keys:
        pc = root[f"samples/{k}/point_cloud"]
        names = {name for name, _ in pc.arrays()}
        assert "pred_nocs_logits" not in names
        assert {"pred_nocs", "pred_nocs_confidence", "input_points",
                "input_rgb", "gt_nocs"} <= names
        # the rest of the schema is untouched
        g = root[f"samples/{k}"]
        for sub in ("marching_cubes_mesh", "gt_marching_cubes_mesh",
                    "gt_mesh", "misc"):
            assert sub in g, sub


def test_eval_pipeline(predict_run, tmp_path_factory):
    from garmentnets_tpu.harness import eval as eval_mod
    run_dir = tmp_path_factory.mktemp("eval")
    cfg = {
        "main": {"prediction_output_dir": str(predict_run),
                 "num_workers": 1},
        "override_all": {
            "value_threshold":
                "summary/metrics/aggregate/optimal_wnf_gradient_threshold",
            "value_key": "marching_cubes_mesh/volume_gradient_magnitude",
            "predict_holes": True, "volume_task_space": False},
        "eval": {
            "compute_optimal_gradient_treshold":
                {"enabled": True, "precision_weight": 0.75},
            "compute_pc_metrics": {"enabled": True},
            "compute_grip_point_metrics": {"enabled": True},
            "compute_chamfer": {"enabled": True, "num_points": 500,
                                "seed": 0},
            "compute_hybrid_chamfer": {"enabled": True, "num_points": 500,
                                       "seed": 0},
            "compute_geodesic": {"enabled": True, "num_points": 8,
                                 "seed": 0},
            "compute_hausdorff": {"enabled": True},
        },
        "vis": {"samples_per_instance": 1, "num_best": 1, "num_worst": 1,
                "num_normal": 1,
                "rank_metric": "chamfer_symmetrical_nocs_no_hole"},
        "logger": {},
    }
    out = eval_mod.main(cfg, run_dir=str(run_dir))
    out = pathlib.Path(out)
    assert (out / "all_metrics.csv").exists()
    assert (out / "all_metrics_agg.csv").exists()
    summary = json.loads((out / "summary.json").read_text())
    # chamfer metrics present and finite (random-ish net, but mesh exists
    # or samples are null-filtered; require at least the pc metrics)
    assert "nocs_pc_error_distance" in summary
    assert np.isfinite(summary["nocs_pc_error_distance"])
    assert "null_percentage" in summary
    # column COMPLETENESS (VERDICT r2 #9): with every metric function
    # enabled and predict_holes=True, the aggregate must carry the full
    # reference key set — including the reference's 'distanc' spellings
    # (eval.py:146-182) — even when a column aggregates to NaN (all-null
    # samples write NaN, never drop the column)
    expected = {
        "nocs_pc_error_distance", "nocs_pc_mirror_error_distance",
        "nocs_pc_min_agg_error_distance", "nocs_pc_agg_min_error_distance",
        *(f"nocs_pc_diff_std_{a}" for a in "xyz"),
        *(f"nocs_pc_error_{a}" for a in "xyz"),
        *(f"grip_point_{m}_{k}" for k in ("pc", "global")
          for m in ("error_distance", "mirror_error_distanc",
                    "min_error_distanc")),
        *(f"chamfer_symmetrical_{k}" for k in
          ("nocs", "sim", "nocs_no_hole", "sim_no_hole", "nocs_mc")),
        *(f"hybrid_chamfer_{m}_{cat}_{aug}"
          for m in ("forward", "backward", "symmetrical")
          for cat in ("regular", "no_hole")
          for aug in ("pred", "mirror", "min")),
        *(f"hausdorff_{k}" for k in
          ("nocs", "sim", "nocs_no_hole", "sim_no_hole", "nocs_mc")),
        *(f"geodesic_rms_{k}" for k in
          ("sim", "nocs", "sim_no_hole", "nocs_no_hole", "nocs_mc")),
        "null_percentage",
    }
    missing = expected - set(summary)
    assert not missing, f"eval summary missing columns: {sorted(missing)}"
    # best/worst PLY visualizations written (non-null samples exist)
    if summary["null_percentage"] < 1.0:
        assert list((out / "vis").glob("*.ply"))

def test_predict_device_normals(synth_zarr, stage2_run, tmp_path_factory):
    """prediction.device_normals=true routes MC normals through the warp
    program's octahedral lane (ops/normals); the CLI must still write a
    full-schema marching_cubes_mesh whose normals are finite unit vectors
    wherever MC succeeded."""
    import numpy as np
    from garmentnets_tpu.harness import predict
    from garmentnets_tpu.data import zarrlite
    run_dir = tmp_path_factory.mktemp("pred_dn")
    cfg = {
        "main": {"checkpoint_path":
                 str(stage2_run / "checkpoints/last.ckpt")},
        "prediction": {"subset": "test", "volume_size": 16,
                       "gradient_sigma": 0.5, "iso_surface_level": 0.5,
                       "gradient_direction": "ascent",
                       "use_hole_prediction": False,
                       "store_pred_nocs_logits": False,
                       "device_normals": True},
        "logger": {},
        "datamodule": dict(COMMON_DM, zarr_path=synth_zarr, batch_size=1),
    }
    out = pathlib.Path(predict.main(cfg, run_dir=str(run_dir)))
    root = zarrlite.open(str(out / "prediction.zarr"), "r")
    keys = [k for k, _ in root["samples"].groups()]
    assert len(keys) == 2
    saw_mesh = False
    for k in keys:
        mc = root[f"samples/{k}/marching_cubes_mesh"]
        normals = mc["normals"][:]
        verts = mc["verts"][:]
        assert normals.shape == verts.shape
        if np.isfinite(verts).all():     # NaN-sentinel batches excluded
            saw_mesh = True
            assert np.isfinite(normals).all()
            np.testing.assert_allclose(
                np.linalg.norm(normals, axis=1), 1.0, atol=1e-2)
    assert saw_mesh, "no batch produced a mesh — test exercised nothing"
