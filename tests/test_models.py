import numpy as np
import jax
import jax.numpy as jnp
import pytest

from garmentnets_tpu.models.mlp import PointMLP, MaskedBatchNorm
from garmentnets_tpu.models.unet3d import UNet3D, SingleConv
from garmentnets_tpu.models.pointnet2_nocs import (
    PointNet2NOCS, PointNet2NOCSConfig, get_metrics, logits_to_nocs_bins,
    mirror_nocs_points_by_axis, predict_grip_point_from_pc)
from garmentnets_tpu.models.pipeline import (
    ConvImplicitWNFPipeline, PipelineConfig, VolumeFeatureAggregator,
    ImplicitWNFDecoder, pipeline_loss)


SMALL_PN2 = PointNet2NOCSConfig(nocs_bins=8)


def _small_pipeline_cfg():
    return PipelineConfig(pointnet2=SMALL_PN2, grid_shape=(8, 8, 8),
                          unet_f_maps=8, unet_num_levels=2,
                          unet_in_channels=128, unet_out_channels=16,
                          volume_decoder_channels=(16, 32, 1),
                          surface_decoder_channels=(16, 32, 3))


def _batch(B=2, N=128, nv=16, ns=16, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "x": jnp.asarray(rng.rand(B, N, 3), jnp.float32),
        "pos": jnp.asarray(rng.rand(B, N, 3) - 0.5, jnp.float32),
        "y": jnp.asarray(rng.rand(B, N, 3), jnp.float32),
        "nocs_grip_point": jnp.asarray(rng.rand(B, 3), jnp.float32),
        "volume_query_points": jnp.asarray(rng.rand(B, nv, 3), jnp.float32),
        "gt_volume_value": jnp.asarray(rng.rand(B, nv), jnp.float32),
        "surf_query_points": jnp.asarray(rng.rand(B, ns, 3), jnp.float32),
        "gt_sim_points": jnp.asarray(rng.rand(B, ns, 3), jnp.float32),
    }


def test_masked_batchnorm_matches_torch_bn1d():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = rng.rand(4, 7, 6).astype(np.float32)

    bn = MaskedBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    out, updates = bn.apply(variables, jnp.asarray(x), train=True,
                            mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm1d(6)
    tx = torch.from_numpy(x).reshape(-1, 6)
    tout = tbn(tx).detach().numpy().reshape(4, 7, 6)
    np.testing.assert_allclose(np.asarray(out), tout, rtol=1e-4, atol=1e-5)
    # running stats convention matches torch (unbiased var, momentum 0.1)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["mean"]),
        tbn.running_mean.detach().numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["var"]),
        tbn.running_var.detach().numpy(), rtol=1e-4, atol=1e-6)


def test_masked_batchnorm_ignores_padding():
    rng = np.random.RandomState(1)
    x_valid = rng.rand(2, 5, 4).astype(np.float32)
    pad = np.full((2, 3, 4), 1e6, np.float32)
    x_padded = np.concatenate([x_valid, pad], axis=1)
    mask = np.zeros((2, 8), bool)
    mask[:, :5] = True

    bn = MaskedBatchNorm()
    v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x_padded),
                mask=jnp.asarray(mask), train=True)
    out_m, _ = bn.apply(v, jnp.asarray(x_padded), mask=jnp.asarray(mask),
                        train=True, mutable=["batch_stats"])
    out_ref, _ = bn.apply(v, jnp.asarray(x_valid), train=True,
                          mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_m)[:, :5],
                               np.asarray(out_ref), rtol=1e-3, atol=1e-4)


def test_single_conv_gcr_matches_torch():
    """GroupNorm->Conv3d->ReLU with shared weights vs torch oracle."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    B, D, C_in, C_out = 2, 6, 8, 12
    x = rng.rand(B, D, D, D, C_in).astype(np.float32)

    sc = SingleConv(C_in, C_out, order="gcr", num_groups=4)
    v = sc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    out = np.asarray(sc.apply(v, jnp.asarray(x), train=False))

    tgn = torch.nn.GroupNorm(4, C_in)
    tconv = torch.nn.Conv3d(C_in, C_out, 3, padding=1, bias=False)
    # copy flax weights into torch: flax conv kernel [kd,kh,kw,Cin,Cout]
    k = np.asarray(v["params"]["conv_1"]["kernel"])
    tconv.weight.data = torch.from_numpy(
        np.transpose(k, (4, 3, 0, 1, 2)).copy())
    tgn.weight.data = torch.from_numpy(np.asarray(v["params"]["gn_0"]["scale"]))
    tgn.bias.data = torch.from_numpy(np.asarray(v["params"]["gn_0"]["bias"]))
    tx = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)).copy())
    ref = torch.relu(tconv(tgn(tx))).detach().numpy()
    ref = np.transpose(ref, (0, 2, 3, 4, 1))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_unet3d_shapes_and_channel_ladder():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 16, 16, 16, 32), jnp.float32)
    net = UNet3D(in_channels=32, out_channels=24, f_maps=8, num_levels=3)
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(v, x, train=False)
    assert out.shape == (1, 16, 16, 16, 24)
    # encoder channel clamp rule: first encoder conv1 keeps in_channels when
    # out//2 < in (reference unet3d.py:127-133)
    k = v["params"]["encoder_0"]["conv1"]["conv_1"]["kernel"]
    assert k.shape[-2:] == (32, 32)


def test_pointnet2_nocs_forward_shapes_and_jit():
    cfg = SMALL_PN2
    model = PointNet2NOCS(cfg)
    batch = _batch()
    v = model.init(jax.random.PRNGKey(0), batch["x"], batch["pos"],
                   train=False)
    fwd = jax.jit(lambda vars_, x, p: model.apply(vars_, x, p, train=False))
    out = fwd(v, batch["x"], batch["pos"])
    B, N = batch["x"].shape[:2]
    assert out["per_point_features"].shape == (B, N, 128)
    assert out["per_point_logits"].shape == (B, N, cfg.output_dim)
    assert out["global_logits"].shape == (B, cfg.output_dim)
    assert out["global_feature"].shape == (B, 1024)

    metrics, nocs_data = get_metrics(cfg, out, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert nocs_data["pos"].shape == (B, N, 3)
    assert nocs_data["pred_confidence"].shape == (B, N, 3)
    # confidence is a probability
    conf = np.asarray(nocs_data["pred_confidence"])
    assert conf.min() >= 0 and conf.max() <= 1


def test_logits_to_nocs_bins_centers():
    cfg = PointNet2NOCSConfig(nocs_bins=4)
    logits = np.zeros((1, 2, 12), np.float32)
    logits[0, 0, :] = -10
    # bins layout [bins, 3]: set bin 3 for axis 0, bin 0 for axes 1/2
    lb = logits.reshape(1, 2, 4, 3)
    lb[0, 0, 3, 0] = 10.0
    lb[0, 0, 0, 1] = 10.0
    lb[0, 0, 0, 2] = 10.0
    pred, conf = logits_to_nocs_bins(cfg, jnp.asarray(lb.reshape(1, 2, 12)))
    np.testing.assert_allclose(np.asarray(pred)[0, 0], [1.0, 0.0, 0.0],
                               atol=1e-6)
    assert float(np.asarray(conf)[0, 0, 0]) > 0.99


def test_mirror_and_grip_point_helpers():
    pts = jnp.asarray([[0.2, 0.3, 0.4]])
    m = np.asarray(mirror_nocs_points_by_axis(pts, 0))
    np.testing.assert_allclose(m, [[0.8, 0.3, 0.4]], atol=1e-6)

    pos = jnp.asarray(np.array([[[1, 1, 1], [0.01, 0, 0], [2, 2, 2]]],
                               np.float32))
    nocs = jnp.asarray(np.array([[[0.1] * 3, [0.5] * 3, [0.9] * 3]],
                                np.float32))
    gp = np.asarray(predict_grip_point_from_pc(pos, nocs))
    np.testing.assert_allclose(gp, [[0.5, 0.5, 0.5]])


def test_symmetry_loss_is_min_of_branches():
    cfg = PointNet2NOCSConfig(nocs_bins=8, symmetry_axis=0)
    model = PointNet2NOCS(cfg)
    batch = _batch()
    v = model.init(jax.random.PRNGKey(0), batch["x"], batch["pos"],
                   train=False)
    out = model.apply(v, batch["x"], batch["pos"], train=False)
    m_sym, _ = get_metrics(cfg, out, batch)
    m_norm, _ = get_metrics(dataclasses_replace(cfg, symmetry_axis=None),
                            out, batch)
    assert float(m_sym["loss"]) <= float(m_norm["loss"]) + 1e-6


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


def test_volume_aggregator_scatter():
    agg = VolumeFeatureAggregator(nn_channels=(10, 8), grid_shape=(4, 4, 4))
    rng = np.random.RandomState(5)
    nocs_data = {
        "x": jnp.asarray(rng.rand(2, 20, 1), jnp.float32),
        "pos": jnp.asarray(rng.rand(2, 20, 3), jnp.float32),
        "sim_points": jnp.asarray(rng.rand(2, 20, 3), jnp.float32),
        "pred_confidence": jnp.asarray(rng.rand(2, 20, 3), jnp.float32),
    }
    v = agg.init(jax.random.PRNGKey(0), nocs_data, train=False)
    vol = agg.apply(v, nocs_data, train=False)
    assert vol.shape == (2, 4, 4, 4, 8)


def test_pipeline_forward_and_loss():
    cfg = _small_pipeline_cfg()
    model = ConvImplicitWNFPipeline(cfg)
    batch = _batch()
    v = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(v, batch, train=False)
    assert out["pred_volume_value"].shape == (2, 16)
    assert out["pred_sim_points"].shape == (2, 16, 3)
    assert out["feature_volume"].shape == (2, 8, 8, 8, 16)
    metrics = pipeline_loss(cfg, out, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_pipeline_stage1_is_frozen():
    """Gradients w.r.t. stage-1 params must be exactly zero."""
    cfg = _small_pipeline_cfg()
    model = ConvImplicitWNFPipeline(cfg)
    batch = _batch()
    v = model.init(jax.random.PRNGKey(0), batch, train=False)

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            batch, train=False)
        return pipeline_loss(cfg, out, batch)["loss"]

    grads = jax.grad(loss_fn)(v["params"])
    g_stage1 = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        grads["pointnet2_nocs"], 0.0)
    g_rest = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        grads["unet_3d"], 0.0)
    assert g_stage1 == 0.0
    assert g_rest > 0.0


def test_aabb_scale_offset_matches_numpy_normalizer():
    from garmentnets_tpu.ops.geometry import AABBGripNormalizer
    rng = np.random.RandomState(7)
    lo = -rng.rand(3) - 0.5
    hi = rng.rand(3) + 0.5
    aabb = np.stack([lo, hi]).astype(np.float32)
    scale, offset = ConvImplicitWNFPipeline.get_aabb_scale_offset(
        jnp.asarray(aabb[None]))
    ref = AABBGripNormalizer(aabb)
    np.testing.assert_allclose(float(scale[0]), ref.scale, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(offset[0]), ref.offset, rtol=1e-5)


def test_sa_gather_combined_is_bit_identical(monkeypatch):
    """GARMENTNETS_SA_GATHER=combined (the default, 2x-faster gather)
    must produce bit-identical SA outputs to the reference-shaped
    'split' formulation (same gathered values, same concat order)."""
    import jax
    import jax.numpy as jnp
    from garmentnets_tpu.models.pointnet2 import SAModule
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 128, 3).astype(np.float32))
    pos = jnp.asarray((rs.rand(2, 128, 3) - 0.5).astype(np.float32))
    mod = SAModule(ratio=0.5, radius=0.2, mlp_channels=(6, 16, 16))
    variables = mod.init(jax.random.PRNGKey(0), x, pos, train=False)
    monkeypatch.setenv("GARMENTNETS_SA_GATHER", "split")
    ref, ref_c = mod.apply(variables, x, pos, train=False)
    monkeypatch.setenv("GARMENTNETS_SA_GATHER", "combined")
    out, out_c = mod.apply(variables, x, pos, train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(ref_c))
