"""Reverse (ours -> Lightning) checkpoint export: identity round trip.

export_checkpoint emits the reference's torch module key names; feeding
its output back through the forward converter (which is golden-tested
against the reference layout, tests/test_convert_checkpoint.py /
test_lightning_ckpt.py) must reproduce the original param/stat trees
bit-for-bit.
"""
import numpy as np
import pytest
import jax

from tools.convert_checkpoint import convert_pipeline, convert_pointnet2
from tools.export_checkpoint import export_state


def _prune(d):
    """Drop empty subtrees (the forward converter emits e.g. an empty
    unet_3d stats dict when the order string has no batchnorm)."""
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            v = _prune(v)
            if not v:
                continue
        out[k] = v
    return out


def _tree_equal(a, b, path=""):
    a, b = _prune(a), _prune(b)
    assert set(a) == set(b), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{path}/{k}")


def test_pipeline_roundtrip():
    import __graft_entry__ as graft
    from garmentnets_tpu.models.pipeline import ConvImplicitWNFPipeline
    cfg = graft._small_cfg()
    model = ConvImplicitWNFPipeline(cfg)
    batch = graft._make_batch()
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)
    state = {
        "params": jax.tree_util.tree_map(np.asarray, variables["params"]),
        "batch_stats": jax.tree_util.tree_map(
            np.asarray, variables["batch_stats"]),
    }
    sd = export_state(state)
    assert all(isinstance(v, np.ndarray) or np.isscalar(v)
               or v.shape == () for v in sd.values())
    p, s = convert_pipeline(sd)
    _tree_equal(state["params"], p)
    _tree_equal(state["batch_stats"], s)


def test_stage1_roundtrip():
    from garmentnets_tpu.models.pointnet2_nocs import (
        PointNet2NOCS, PointNet2NOCSConfig)
    rs = np.random.RandomState(0)
    model = PointNet2NOCS(PointNet2NOCSConfig(nocs_bins=8, feature_dim=32))
    x = rs.rand(1, 256, 3).astype(np.float32)
    pos = (rs.rand(1, 256, 3) - 0.5).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, pos, train=False)
    state = {
        "params": jax.tree_util.tree_map(np.asarray, variables["params"]),
        "batch_stats": jax.tree_util.tree_map(
            np.asarray, variables["batch_stats"]),
    }
    sd = export_state(state)
    p, s = convert_pointnet2(sd)
    _tree_equal(state["params"], p)
    _tree_equal(state["batch_stats"], s)


def test_lightning_file_roundtrip(tmp_path):
    """Full file path: our ckpt -> export CLI -> torch.load payload has
    the Lightning layout -> forward converter ingests the file."""
    torch = pytest.importorskip("torch")
    import __graft_entry__ as graft
    from garmentnets_tpu.models.pipeline import ConvImplicitWNFPipeline
    from garmentnets_tpu.core.checkpoint import save_checkpoint
    from tools import export_checkpoint, convert_checkpoint

    cfg = graft._small_cfg()
    model = ConvImplicitWNFPipeline(cfg)
    variables = model.init(jax.random.PRNGKey(2), graft._make_batch(),
                           train=False)
    ours = tmp_path / "ours.ckpt"
    save_checkpoint(str(ours), {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "step": np.asarray(123, np.int32)},
        hparams={"volume_size": 16})
    out = tmp_path / "lightning.ckpt"
    export_checkpoint.main(str(ours), str(out))
    payload = torch.load(str(out), map_location="cpu", weights_only=False)
    assert payload["global_step"] == 123
    assert "state_dict" in payload and "hyper_parameters" in payload
    sd, hparams = convert_checkpoint.load_torch_state_dict(str(out))
    p, _ = convert_checkpoint.convert_pipeline(sd)
    np.testing.assert_array_equal(
        p["volume_agg"]["local_nn"]["dense_0"]["kernel"],
        np.asarray(variables["params"]["volume_agg"]["local_nn"]
                   ["dense_0"]["kernel"]))


@pytest.mark.parametrize("order", ["cge", "gcr"])
def test_residual_unet_roundtrip(order):
    """export_unet3d's ExtResNetBlock/ConvTranspose branch: our params ->
    torch keys -> forward converter -> identical trees."""
    import jax.numpy as jnp
    from garmentnets_tpu.models.unet3d import ResidualUNet3D
    from tools.convert_checkpoint import convert_residual_unet3d
    from tools.export_checkpoint import export_unet3d
    net = ResidualUNet3D(in_channels=8, out_channels=6, f_maps=4,
                         num_levels=3, num_groups=2, layer_order=order)
    x = np.random.RandomState(1).rand(1, 8, 8, 8, 8).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {}))
    sd = export_unet3d(params, stats, "u")
    p, s = convert_residual_unet3d(sd, "u", order=order)
    _tree_equal(params, p)
    _tree_equal(stats, s)
