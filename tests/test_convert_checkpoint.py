"""Checkpoint converter tests: torch state_dicts with the reference's key
layout convert into our param trees, match our model's init structure, and
produce numerically identical forwards for the torch-comparable submodules."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import sys, pathlib  # noqa: E402
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))
import convert_checkpoint as cc  # noqa: E402

from garmentnets_tpu.models.mlp import PointMLP  # noqa: E402
from garmentnets_tpu.models.unet3d import UNet3D  # noqa: E402
from garmentnets_tpu.models.pointnet2_nocs import (  # noqa: E402
    PointNet2NOCS, PointNet2NOCSConfig)


class NS(tnn.Module):
    def __init__(self, **kw):
        super().__init__()
        for k, v in kw.items():
            setattr(self, k, v)


def ref_mlp(channels):
    """Torch twin of the reference components/mlp.py MLP."""
    return tnn.Sequential(*[
        tnn.Sequential(tnn.Linear(channels[i - 1], channels[i]), tnn.ReLU(),
                       tnn.BatchNorm1d(channels[i]))
        for i in range(1, len(channels))])


def _randomize_bn(module):
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm3d)):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.1
            m.running_var.data = torch.rand_like(m.running_var) + 0.5
            m.weight.data = torch.rand_like(m.weight) + 0.5
            m.bias.data = torch.randn_like(m.bias) * 0.1


def test_mlp_conversion_numerics():
    tm = ref_mlp([6, 16, 8])
    _randomize_bn(tm)
    tm.eval()
    sd = {f"m.{k}": v.numpy() for k, v in tm.state_dict().items()}
    params, stats = cc._mlp(sd, "m")

    x = np.random.RandomState(0).rand(5, 7, 6).astype(np.float32)
    ref = tm(torch.from_numpy(x).reshape(-1, 6)).detach().numpy().reshape(
        5, 7, 8)
    mlp = PointMLP((6, 16, 8))
    out = mlp.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def _torch_single_conv(c_in, c_out):
    """'gcr' SingleConv twin with the reference's submodule names."""
    m = tnn.Sequential()
    m.add_module("groupnorm", tnn.GroupNorm(4, c_in))
    m.add_module("conv", tnn.Conv3d(c_in, c_out, 3, padding=1, bias=False))
    m.add_module("ReLU", tnn.ReLU())
    return m


def _torch_double_conv(c_in, c_out, encoder):
    if encoder:
        c1 = c_out // 2
        if c1 < c_in:
            c1 = c_in
        a, b = _torch_single_conv(c_in, c1), _torch_single_conv(c1, c_out)
    else:
        a, b = _torch_single_conv(c_in, c_out), _torch_single_conv(
            c_out, c_out)
    m = tnn.Module()
    m.add_module("SingleConv1", a)
    m.add_module("SingleConv2", b)

    def fwd(x):
        return b(a(x))
    m.forward = fwd
    return m


def _torch_unet(in_ch, out_ch, f_maps, levels):
    fm = [f_maps * 2 ** k for k in range(levels)]
    encs, decs = tnn.ModuleList(), tnn.ModuleList()
    ch = in_ch
    for i, o in enumerate(fm):
        encs.append(NS(basic_module=_torch_double_conv(ch, o, True)))
        ch = o
    rev = list(reversed(fm))
    for i in range(len(rev) - 1):
        decs.append(NS(basic_module=_torch_double_conv(
            rev[i] + rev[i + 1], rev[i + 1], False)))
    final = tnn.Conv3d(fm[0], out_ch, 1)
    net = NS(encoders=encs, decoders=decs, final_conv=final)

    def fwd(x):
        feats = []
        h = x
        for i, e in enumerate(encs):
            if i > 0:
                h = tnn.functional.max_pool3d(h, 2)
            h = e.basic_module(h)
            feats.insert(0, h)
        feats = feats[1:]
        for d, skip in zip(decs, feats):
            h = tnn.functional.interpolate(h, size=skip.shape[2:],
                                           mode="nearest")
            h = torch.cat([skip, h], dim=1)
            h = d.basic_module(h)
        return final(h)
    net.forward = fwd
    return net


def test_unet3d_conversion_numerics():
    tn = _torch_unet(8, 6, 4, 3)
    _randomize_bn(tn)
    tn.eval()
    sd = {f"u.{k}": v.numpy() for k, v in tn.state_dict().items()}
    params, stats = cc.convert_unet3d(sd, "u")

    net = UNet3D(in_channels=8, out_channels=6, f_maps=4, num_levels=3,
                 num_groups=4)
    x = np.random.RandomState(1).rand(2, 8, 8, 8, 8).astype(np.float32)
    # structure parity with a fresh init
    vref = net.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert (jax.tree_util.tree_structure(vref["params"])
            == jax.tree_util.tree_structure({
                k: v for k, v in params.items()}))
    out = net.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x), train=False)
    with torch.no_grad():
        ref = tn(torch.from_numpy(
            np.transpose(x, (0, 4, 1, 2, 3)).copy()))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 4, 1))
    # conv accumulation order differs between XLA and torch; tolerance covers
    # fp32 noise on near-zero outputs
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-2, atol=1e-3)


def test_pointnet2_conversion_structure():
    """Converted stage-1 tree must match a fresh init's structure exactly."""
    m = NS(
        sa1_module=NS(conv=NS(local_nn=ref_mlp([6, 64, 64, 128]))),
        sa2_module=NS(conv=NS(local_nn=ref_mlp([131, 128, 128, 256]))),
        sa3_module=NS(nn=ref_mlp([259, 256, 512, 1024])),
        fp3_module=NS(nn=ref_mlp([1280, 256, 256])),
        fp2_module=NS(nn=ref_mlp([384, 256, 128])),
        fp1_module=NS(nn=ref_mlp([131, 128, 128, 128])),
        lin1=tnn.Linear(128, 128), lin2=tnn.Linear(128, 128),
        lin3=tnn.Linear(128, 192),
        global_lin1=tnn.Linear(1024, 1024),
        global_lin2=tnn.Linear(1024, 192),
    )
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params, stats = cc.convert_pointnet2(sd)

    cfg = PointNet2NOCSConfig()
    model = PointNet2NOCS(cfg)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 64, 3), jnp.float32)
    pos = jnp.asarray(rng.rand(1, 64, 3), jnp.float32)
    vref = model.init(jax.random.PRNGKey(0), x, pos, train=False)
    assert (jax.tree_util.tree_structure(vref["params"])
            == jax.tree_util.tree_structure(params))
    # converted checkpoint actually runs
    out = model.apply({"params": params, "batch_stats": stats}, x, pos,
                      train=False)
    assert np.isfinite(np.asarray(out["per_point_logits"])).all()
