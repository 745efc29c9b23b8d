"""End-to-end golden test: reference-layout torch checkpoint -> converter ->
our JAX pipeline == torch twin forward (VERDICT round-1 item 3).

The twin (tests/torch_twin.py) re-implements the reference forward semantics
(networks/pointnet2_nocs.py:134-166, conv_implicit_wnf.py:213-338) with the
reference's state_dict key layout and the same deterministic fps/ball-query
conventions as our kernels, so stage-1 logits, NOCS bins, volume WNF values
and warp-field outputs must agree to float tolerance. This test fails if any
converter key mapping, BN/GroupNorm convention, PointConv message layout,
VirtualGrid binning, scatter-reduce fill, UNet channel plumbing, or the
grid_sample axis-order quirk drifts.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import sys, pathlib  # noqa: E402
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
import convert_checkpoint as cc  # noqa: E402
import torch_twin as tw  # noqa: E402

from garmentnets_tpu.models.pointnet2_nocs import PointNet2NOCSConfig  # noqa: E402
from garmentnets_tpu.models.pipeline import (  # noqa: E402
    ConvImplicitWNFPipeline, PipelineConfig)
from garmentnets_tpu.ops.pointcloud import furthest_point_sampling  # noqa: E402

B, N, NV, NS = 2, 256, 33, 17
BINS, FEAT = 8, 128
SA1_R, SA2_R = 0.2, 0.4


def _randomize_stats(module):
    gen = torch.Generator().manual_seed(7)
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm3d)):
            m.running_mean.data = 0.2 * torch.randn(
                m.running_mean.shape, generator=gen)
            m.running_var.data = 0.5 + torch.rand(
                m.running_var.shape, generator=gen)


@pytest.fixture(scope="module")
def twin():
    torch.manual_seed(0)
    m = tw.TwinPipeline(
        pn2_kwargs=dict(feature_dim=FEAT, nocs_bins=BINS,
                        sa1_r=SA1_R, sa2_r=SA2_R),
        agg_channels=[FEAT + 9, 64, 32], grid_shape=(16, 16, 16),
        unet_kwargs=dict(in_channels=32, out_channels=32, f_maps=8,
                         num_levels=2, num_groups=4),
        volume_decoder_channels=[32, 16, 1],
        surface_decoder_channels=[32, 16, 3],
        mc_surface_decoder_channels=[32, 16, 1])
    _randomize_stats(m)
    m.eval()
    return m


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(42)
    return {
        "x": rng.rand(B, N, 3).astype(np.float32),
        "pos": (rng.rand(B, N, 3).astype(np.float32) - 0.5),
        "vq": rng.rand(B, NV, 3).astype(np.float32),
        "sq": rng.rand(B, NS, 3).astype(np.float32),
    }


@pytest.fixture(scope="module")
def ours(twin, inputs):
    """Converted variables + our model + forward outputs."""
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params, stats = cc.convert_pipeline(sd)
    cfg = PipelineConfig(
        pointnet2=PointNet2NOCSConfig(
            feature_dim=FEAT, nocs_bins=BINS, sa1_r=SA1_R, sa2_r=SA2_R),
        volume_agg_nn_channels=(FEAT + 9, 64, 32), grid_shape=(16, 16, 16),
        unet_in_channels=32, unet_out_channels=32, unet_f_maps=8,
        unet_num_levels=2, unet_num_groups=4,
        volume_decoder_channels=(32, 16, 1),
        surface_decoder_channels=(32, 16, 3),
        mc_surface_decoder_channels=(32, 16, 1),
        mc_surface_loss_weight=1.0)  # instantiates the mc decoder
    model = ConvImplicitWNFPipeline(cfg)
    batch = {
        "x": jnp.asarray(inputs["x"]), "pos": jnp.asarray(inputs["pos"]),
        "volume_query_points": jnp.asarray(inputs["vq"]),
        "surf_query_points": jnp.asarray(inputs["sq"]),
        "mc_surf_query_points": jnp.asarray(inputs["sq"]),
    }
    variables = {"params": params, "batch_stats": stats}
    out = model.apply(variables, batch, train=False)
    return out


@pytest.fixture(scope="module")
def theirs(twin, inputs):
    with torch.no_grad():
        return twin(torch.from_numpy(inputs["x"]),
                    torch.from_numpy(inputs["pos"]),
                    torch.from_numpy(inputs["vq"]),
                    torch.from_numpy(inputs["sq"]),
                    torch.from_numpy(inputs["sq"]))


def test_fps_conventions_match(inputs):
    """Pre-condition: both sides sample identical point subsets."""
    ours_idx = np.asarray(furthest_point_sampling(
        jnp.asarray(inputs["pos"]), N // 2))
    theirs_idx = tw.fps(torch.from_numpy(inputs["pos"]), N // 2).numpy()
    np.testing.assert_array_equal(ours_idx, theirs_idx)


def test_stage1_logits_match(ours, theirs):
    p2o = ours["pointnet2_result"]
    p2t = theirs["pointnet2_result"]
    np.testing.assert_allclose(
        np.asarray(p2o["per_point_logits"]),
        p2t["per_point_logits"].numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(p2o["global_logits"]),
        p2t["global_logits"].numpy(), rtol=1e-3, atol=2e-4)


def test_stage1_nocs_and_confidence_match(ours, theirs):
    ndo, ndt = (ours["pointnet2_result"]["nocs_data"],
                theirs["pointnet2_result"]["nocs_data"])
    # argmax bins must be IDENTICAL (discrete), not just close
    np.testing.assert_array_equal(
        np.asarray(ndo["pos"]), ndt["pos"].numpy())
    np.testing.assert_allclose(
        np.asarray(ndo["pred_confidence"]),
        ndt["pred_confidence"].numpy(), rtol=1e-3, atol=2e-4)


def test_wnf_and_warp_match(ours, theirs):
    np.testing.assert_allclose(
        np.asarray(ours["pred_volume_value"]),
        theirs["pred_volume_value"].numpy(), rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(ours["pred_sim_points"]),
        theirs["pred_sim_points"].numpy(), rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(ours["pred_mc_surface_logits"])[..., 0],  # ours: [B,M,1]
        theirs["pred_mc_surface_logits"].numpy(), rtol=1e-3, atol=5e-4)


def test_predict_engine_dense_wnf_matches_twin(twin, inputs):
    """The engine's separable-matmul dense decode (which bypasses the
    ImplicitWNFDecoder module) must reproduce the twin's grid_sample+MLP
    decode at the full lattice with converted weights — covering the
    axis-order quirk on the fused path."""
    from garmentnets_tpu.harness.predict_engine import PredictEngine
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params, stats = cc.convert_pipeline(sd)
    cfg = PipelineConfig(
        pointnet2=PointNet2NOCSConfig(
            feature_dim=FEAT, nocs_bins=BINS, sa1_r=SA1_R, sa2_r=SA2_R),
        volume_agg_nn_channels=(FEAT + 9, 64, 32), grid_shape=(16, 16, 16),
        unet_in_channels=32, unet_out_channels=32, unet_f_maps=8,
        unet_num_levels=2, unet_num_groups=4,
        volume_decoder_channels=(32, 16, 1),
        surface_decoder_channels=(32, 16, 3),
        mc_surface_decoder_channels=(32, 16, 1),
        mc_surface_loss_weight=1.0)
    VOL = 16
    engine = PredictEngine(cfg, {"params": params, "batch_stats": stats},
                           volume_size=VOL, gradient_sigma=0.5,
                           return_volume=True,
                           precision=jax.lax.Precision.HIGHEST)
    enc = engine.encode(inputs["x"], inputs["pos"])
    wnf = np.asarray(enc["wnf_volume"])                   # [B,VOL,VOL,VOL]

    ax = np.linspace(0, 1, VOL, dtype=np.float32)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    lattice = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], 1)
    lat_t = torch.from_numpy(np.broadcast_to(
        lattice[None], (B,) + lattice.shape).copy())
    with torch.no_grad():
        p2 = twin.pointnet2_forward(torch.from_numpy(inputs["x"]),
                                    torch.from_numpy(inputs["pos"]))
        vol_t = twin.unet_3d(twin.volume_agg(p2["nocs_data"]))
        ref = twin.volume_decoder(vol_t, lat_t)[..., 0]
    ref = ref.numpy().reshape(B, VOL, VOL, VOL)
    np.testing.assert_allclose(wnf, ref, rtol=1e-3, atol=1e-3)
