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


def _single_conv(sd, prefix):
    """Reference SingleConv torch submodules are named by kind (groupnorm /
    conv / batchnorm, unet3d.py:43-76); our flax names are positional
    (gn_i / conv_i / bn_i). Whether the norm precedes the conv is recovered
    from channel counts (norm channels == conv in-channels => before)."""
    params, stats = {}, {}
    conv_w = sd[f"{prefix}.conv.weight"]
    norm_before = False
    for name in ("groupnorm", "batchnorm"):
        key = f"{prefix}.{name}.weight"
        if key not in sd:
            continue
        before = len(sd[key]) == conv_w.shape[1]
        norm_before = norm_before or before
        idx = 0 if before else 2
        if name == "groupnorm":
            params[f"gn_{idx}"] = _gn(sd, f"{prefix}.{name}")
        else:
            params[f"bn_{idx}"] = _bn_params(sd, f"{prefix}.{name}")
            stats[f"bn_{idx}"] = _bn_stats(sd, f"{prefix}.{name}")
    params[f"conv_{1 if norm_before else 0}"] = _conv3d(sd, f"{prefix}.conv")
    return params, stats


def convert_unet3d(sd: dict, prefix: str):
    p, s = {}, {}
    i = 0
    while f"{prefix}.encoders.{i}.basic_module.SingleConv1.conv.weight" in sd:
        enc_p, enc_s = {}, {}
        for j, name in ((1, "conv1"), (2, "conv2")):
            cp, cs = _single_conv(
                sd, f"{prefix}.encoders.{i}.basic_module.SingleConv{j}")
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
                sd, f"{prefix}.decoders.{i}.basic_module.SingleConv{j}")
            dec_p[name] = cp
            if cs:
                dec_s[name] = cs
        p[f"decoder_{i}"] = dec_p
        if dec_s:
            s[f"decoder_{i}"] = dec_s
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
