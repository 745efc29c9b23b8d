"""Converter main() file round-trip: a Lightning-layout torch .ckpt
(state_dict + hyper_parameters in the reference's nested schema,
networks/conv_implicit_wnf.py:152-177) converts to our checkpoint format,
loads through the predict CLI's loader, and reproduces the torch twin's
forward — validating key mapping, hparams translation, and the checkpoint
file format in one pass."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import sys, pathlib  # noqa: E402
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
import convert_checkpoint as cc  # noqa: E402
import torch_twin as tw  # noqa: E402

from garmentnets_tpu.models.pipeline import ConvImplicitWNFPipeline  # noqa: E402
from test_golden_pipeline import (  # noqa: E402
    B, N, NV, BINS, FEAT, SA1_R, SA2_R, _randomize_stats)


def test_converter_main_file_roundtrip(tmp_path):
    torch.manual_seed(1)
    twin = tw.TwinPipeline(
        pn2_kwargs=dict(feature_dim=FEAT, nocs_bins=BINS,
                        sa1_r=SA1_R, sa2_r=SA2_R),
        agg_channels=[FEAT + 9, 64, 32], grid_shape=(16, 16, 16),
        unet_kwargs=dict(in_channels=32, out_channels=32, f_maps=8,
                         num_levels=2, num_groups=4),
        volume_decoder_channels=[32, 16, 1],
        surface_decoder_channels=[32, 16, 3])
    _randomize_stats(twin)
    twin.eval()

    # Lightning-style checkpoint with the reference's hparams schema
    hparams = {
        "pointnet2_params": dict(
            feature_dim=FEAT, batch_norm=True, dropout=True,
            sa1_ratio=0.5, sa1_r=SA1_R, sa2_ratio=0.25, sa2_r=SA2_R,
            fp3_k=1, fp2_k=3, fp1_k=3, symmetry_axis=None, nocs_bins=BINS,
            vis_per_items=0, max_vis_per_epoch_train=0,
            max_vis_per_epoch_val=0, batch_size=8),
        "volume_agg_params": {
            "nn_channels": [FEAT + 9, 64, 32], "batch_norm": True,
            "grid_shape": [16, 16, 16], "reduce_method": "max",
            "include_point_feature": True,
            "include_confidence_feature": True},
        "unet3d_params": {"in_channels": 32, "out_channels": 32,
                          "f_maps": 8, "layer_order": "gcr",
                          "num_groups": 4, "num_levels": 2},
        "volume_decoder_params": {"nn_channels": [32, 16, 1],
                                  "batch_norm": True},
        "surface_decoder_params": {"nn_channels": [32, 16, 3],
                                   "batch_norm": True},
        "learning_rate": 1e-4, "loss_type": "l2",
        "volume_loss_weight": 1.0, "surface_loss_weight": 1.0,
        "mc_surface_loss_weight": 0, "volume_classification": False,
        "volume_task_space": False, "batch_size": 24,
        "vis_per_items": 0, "max_vis_per_epoch_train": 0,
        "max_vis_per_epoch_val": 0,
    }
    src = tmp_path / "Synth_pipeline.ckpt"
    torch.save({"state_dict": twin.state_dict(),
                "hyper_parameters": hparams}, src)

    dst = tmp_path / "converted.ckpt"
    cc.main(str(src), str(dst))

    from garmentnets_tpu.harness.predict import load_pipeline_checkpoint
    cfg, variables = load_pipeline_checkpoint(dst)
    assert cfg.pointnet2.nocs_bins == BINS
    assert cfg.grid_shape == (16, 16, 16)
    assert not cfg.has_mc_surface_decoder

    rng = np.random.RandomState(11)
    x = rng.rand(B, N, 3).astype(np.float32)
    pos = rng.rand(B, N, 3).astype(np.float32) - 0.5
    vq = rng.rand(B, NV, 3).astype(np.float32)

    model = ConvImplicitWNFPipeline(cfg)
    batch = {"x": jnp.asarray(x), "pos": jnp.asarray(pos),
             "volume_query_points": jnp.asarray(vq),
             "surf_query_points": jnp.asarray(vq)}
    ours = model.apply(variables, batch, train=False)
    with torch.no_grad():
        theirs = twin(torch.from_numpy(x), torch.from_numpy(pos),
                      torch.from_numpy(vq), torch.from_numpy(vq))
    np.testing.assert_allclose(
        np.asarray(ours["pred_volume_value"]),
        theirs["pred_volume_value"].numpy(), rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(ours["pred_sim_points"]),
        theirs["pred_sim_points"].numpy(), rtol=1e-3, atol=5e-4)
