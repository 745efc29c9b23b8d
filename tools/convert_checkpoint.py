"""Convert released GarmentNets PyTorch-Lightning checkpoints to this
framework's format (SURVEY.md §5 checkpoint/resume: one-shot torch->JAX
converter for the 2 stages x 6 categories of released weights).

Usage:
  python tools/convert_checkpoint.py <Category>_pointnet2.ckpt out.ckpt
  python tools/convert_checkpoint.py <Category>_pipeline.ckpt out.ckpt

Key mapping (reference torch modules -> flax param tree):
  Linear weight [out,in]        -> Dense kernel [in,out] (transpose)
  Conv3d weight [o,i,kd,kh,kw]  -> Conv kernel [kd,kh,kw,i,o]
  BatchNorm1d weight/bias       -> MaskedBatchNorm scale/bias (params)
  BatchNorm running_mean/var    -> batch_stats mean/var
  GroupNorm weight/bias         -> GroupNorm scale/bias
The reference's MLP stacks are Seq(Seq(Lin, ReLU, BN)) so torch keys look
like `<mlp>.{i}.0.weight` (linear) and `<mlp>.{i}.2.*` (batch norm)
(components/mlp.py:9-20).
"""
from __future__ import annotations

import re
import sys

import numpy as np


def _lin(sd, prefix):
    return {"kernel": np.asarray(sd[f"{prefix}.weight"]).T.copy(),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _conv3d(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"])
    out = {"kernel": np.transpose(w, (2, 3, 4, 1, 0)).copy()}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _bn_params(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _bn_stats(sd, prefix):
    return {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.running_var"])}


def _gn(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _mlp(sd, prefix):
    """Reference MLP Seq(Seq(Lin,ReLU,BN)) -> PointMLP params + stats."""
    params, stats = {}, {}
    i = 0
    while f"{prefix}.{i}.0.weight" in sd:
        params[f"dense_{i}"] = _lin(sd, f"{prefix}.{i}.0")
        if f"{prefix}.{i}.2.weight" in sd:
            params[f"bn_{i}"] = _bn_params(sd, f"{prefix}.{i}.2")
            stats[f"bn_{i}"] = _bn_stats(sd, f"{prefix}.{i}.2")
        i += 1
    assert i > 0, f"no MLP layers under {prefix}"
    return params, stats


def convert_pointnet2(sd: dict, prefix: str = ""):
    """torch state_dict -> (params, batch_stats) for PointNet2NOCS."""
    p, s = {}, {}

    def put(name, sub_p, sub_s):
        p[name] = sub_p
        if sub_s:
            s[name] = sub_s

    for sa, torch_name in (("sa1", "sa1_module.conv.local_nn"),
                           ("sa2", "sa2_module.conv.local_nn")):
        mp, ms = _mlp(sd, prefix + torch_name)
        put(sa, {"mlp": mp}, {"mlp": ms})
    mp, ms = _mlp(sd, prefix + "sa3_module.nn")
    put("sa3", {"mlp": mp}, {"mlp": ms})
    for fp in ("fp3", "fp2", "fp1"):
        mp, ms = _mlp(sd, prefix + f"{fp}_module.nn")
        put(fp, {"mlp": mp}, {"mlp": ms})
    for lin in ("lin1", "lin2", "lin3", "global_lin1", "global_lin2"):
        p[lin] = _lin(sd, prefix + lin)
    return p, s


def _single_conv(sd, prefix, order="gcr"):
    """Reference SingleConv torch submodules are named by kind (groupnorm /
    conv / batchnorm, unet3d.py:43-76); our flax names are positional
    (gn_i / conv_i / bn_i), indexed by position in the order string. The
    caller passes the order ('gcr', 'cge', ... — nonlinearity chars consume
    an index but carry no params)."""
    params, stats = {}, {}
    for i, ch in enumerate(order):
        if ch == "c":
            params[f"conv_{i}"] = _conv3d(sd, f"{prefix}.conv")
        elif ch == "g":
            params[f"gn_{i}"] = _gn(sd, f"{prefix}.groupnorm")
        elif ch == "b":
            params[f"bn_{i}"] = _bn_params(sd, f"{prefix}.batchnorm")
            stats[f"bn_{i}"] = _bn_stats(sd, f"{prefix}.batchnorm")
    return params, stats


def convert_unet3d(sd: dict, prefix: str, order: str = "gcr"):
    p, s = {}, {}
    i = 0
    while f"{prefix}.encoders.{i}.basic_module.SingleConv1.conv.weight" in sd:
        enc_p, enc_s = {}, {}
        for j, name in ((1, "conv1"), (2, "conv2")):
            cp, cs = _single_conv(
                sd, f"{prefix}.encoders.{i}.basic_module.SingleConv{j}",
                order)
            enc_p[name] = cp
            if cs:
                enc_s[name] = cs
        p[f"encoder_{i}"] = enc_p
        if enc_s:
            s[f"encoder_{i}"] = enc_s
        i += 1
    i = 0
    while f"{prefix}.decoders.{i}.basic_module.SingleConv1.conv.weight" in sd:
        dec_p, dec_s = {}, {}
        for j, name in ((1, "conv1"), (2, "conv2")):
            cp, cs = _single_conv(
                sd, f"{prefix}.decoders.{i}.basic_module.SingleConv{j}",
                order)
            dec_p[name] = cp
            if cs:
                dec_s[name] = cs
        p[f"decoder_{i}"] = dec_p
        if dec_s:
            s[f"decoder_{i}"] = dec_s
        i += 1
    p["final_conv"] = _conv3d(sd, f"{prefix}.final_conv")
    return p, s


def _ext_resnet_block(sd, prefix, order):
    """Reference ExtResNetBlock (unet3d.py:147-192): conv1/conv2 use the
    full order; conv3 drops the nonlinearity (index layout unchanged)."""
    n_order = order
    for c in "rel":
        n_order = n_order.replace(c, "")
    p, s = {}, {}
    for name, o in (("conv1", order), ("conv2", order), ("conv3", n_order)):
        cp, cs = _single_conv(sd, f"{prefix}.{name}", o)
        p[name] = cp
        if cs:
            s[name] = cs
    return p, s


def convert_residual_unet3d(sd: dict, prefix: str, order: str = "cge"):
    """ResidualUNet3D (reference unet3d.py:494-509): ExtResNetBlock basic
    modules, ConvTranspose3d(k3 s2 p1) upsampling (weight [in,out,kd,kh,kw]
    -> flax transpose_kernel layout [kd,kh,kw,out,in]), sum joining."""
    p, s = {}, {}
    i = 0
    while f"{prefix}.encoders.{i}.basic_module.conv1.conv.weight" in sd:
        bp, bs = _ext_resnet_block(
            sd, f"{prefix}.encoders.{i}.basic_module", order)
        p[f"encoder_{i}"] = bp
        if bs:
            s[f"encoder_{i}"] = bs
        i += 1
    i = 0
    while f"{prefix}.decoders.{i}.basic_module.conv1.conv.weight" in sd:
        bp, bs = _ext_resnet_block(
            sd, f"{prefix}.decoders.{i}.basic_module", order)
        p[f"decoder_{i}"] = bp
        if bs:
            s[f"decoder_{i}"] = bs
        w = np.asarray(
            sd[f"{prefix}.decoders.{i}.upsampling.upsample.weight"])
        p[f"upsample_{i}"] = {
            "kernel": np.transpose(w, (2, 3, 4, 1, 0)).copy(),
            "bias": np.asarray(
                sd[f"{prefix}.decoders.{i}.upsampling.upsample.bias"]),
        }
        i += 1
    p["final_conv"] = _conv3d(sd, f"{prefix}.final_conv")
    return p, s


def convert_pipeline(sd: dict):
    params, stats = {}, {}
    p2p, p2s = convert_pointnet2(sd, prefix="pointnet2_nocs.")
    params["pointnet2_nocs"] = p2p
    stats["pointnet2_nocs"] = p2s
    mp, ms = _mlp(sd, "volume_agg.local_nn")
    params["volume_agg"] = {"local_nn": mp}
    stats["volume_agg"] = {"local_nn": ms}
    up, us = convert_unet3d(sd, "unet_3d.abstract_3d_unet")
    params["unet_3d"] = up
    stats["unet_3d"] = us
    for dec in ("volume_decoder", "surface_decoder", "mc_surface_decoder"):
        if f"{dec}.mlp.0.0.weight" in sd:
            mp, ms = _mlp(sd, f"{dec}.mlp")
            params[dec] = {"mlp": mp}
            stats[dec] = {"mlp": ms}
    return params, stats


def load_torch_state_dict(path):
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    hparams = dict(ckpt.get("hyper_parameters", {}))
    return {k: v.numpy() for k, v in sd.items()}, hparams


def main(src, dst):
    from garmentnets_tpu.core.checkpoint import save_checkpoint
    sd, hparams = load_torch_state_dict(src)
    if any(k.startswith("volume_agg.") for k in sd):
        params, stats = convert_pipeline(sd)
        hp = _pipeline_hparams_from_torch(hparams)
    else:
        params, stats = convert_pointnet2(sd)
        hp = dict(hparams)
        hp.pop("batch_size", None)
        for k in ("vis_per_items", "max_vis_per_epoch_train",
                  "max_vis_per_epoch_val"):
            hp.pop(k, None)
    save_checkpoint(dst, {"params": params, "batch_stats": stats,
                          "step": np.zeros((), np.int32)}, hparams=hp)
    print(f"converted {src} -> {dst}")


def _pipeline_hparams_from_torch(hparams: dict) -> dict:
    hp = dict(hparams)
    pn2 = dict(hp.pop("pointnet2_params", {}))
    for k in ("vis_per_items", "max_vis_per_epoch_train",
              "max_vis_per_epoch_val", "batch_size"):
        hp.pop(k, None)
        pn2.pop(k, None)
    hp["pointnet2_params"] = pn2
    return hp


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
