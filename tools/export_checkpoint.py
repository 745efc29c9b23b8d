"""Export this framework's checkpoints back to PyTorch-Lightning format.

The inverse of tools/convert_checkpoint.py: takes a garmentnets_tpu
checkpoint (stage-1 PointNet2NOCS or stage-2 pipeline) and writes a
`.ckpt` that the REFERENCE code base loads directly via
`load_from_checkpoint` (torch.save payload with `state_dict` under the
reference's module names, `hyper_parameters` in the reference ctor
schema, epoch/global_step — the layout `ModelCheckpoint` writes,
reference train_pointnet2.py:47-56). Completes interop in both
directions: users can train here on TPU and hand weights back to any
torch-side tooling.

Usage:
  python tools/export_checkpoint.py ours.ckpt out_lightning.ckpt

Key mapping is the exact inverse of convert_checkpoint.py:
  Dense kernel [in,out]            -> Linear weight [out,in]
  Conv kernel [kd,kh,kw,i,o]       -> Conv3d weight [o,i,kd,kh,kw]
  transpose kernel [kd,kh,kw,o,i]  -> ConvTranspose3d [i,o,kd,kh,kw]
  scale/bias (+ batch_stats)       -> BatchNorm/GroupNorm weight/bias
                                      (+ running_mean/var,
                                      num_batches_tracked=0)
Round-trip identity (ours -> torch -> ours bit-equal) is tested in
tests/test_export_checkpoint.py against the forward converter, which is
itself golden-tested against the reference layout.
"""
from __future__ import annotations

import sys

import numpy as np


def _put_lin(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
    sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _put_conv3d(sd, prefix, p):
    k = np.asarray(p["kernel"])                      # [kd,kh,kw,i,o]
    sd[f"{prefix}.weight"] = np.ascontiguousarray(
        np.transpose(k, (4, 3, 0, 1, 2)))
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _put_bn(sd, prefix, p, s):
    sd[f"{prefix}.weight"] = np.asarray(p["scale"])
    sd[f"{prefix}.bias"] = np.asarray(p["bias"])
    sd[f"{prefix}.running_mean"] = np.asarray(s["mean"])
    sd[f"{prefix}.running_var"] = np.asarray(s["var"])
    sd[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)


def _put_gn(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["scale"])
    sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _put_mlp(sd, prefix, params, stats):
    """PointMLP -> reference MLP Seq(Seq(Lin,ReLU,BN)) keys."""
    i = 0
    while f"dense_{i}" in params:
        _put_lin(sd, f"{prefix}.{i}.0", params[f"dense_{i}"])
        if f"bn_{i}" in params:
            _put_bn(sd, f"{prefix}.{i}.2", params[f"bn_{i}"],
                    (stats or {})[f"bn_{i}"])
        i += 1
    assert i > 0, f"no MLP layers for {prefix}"


def export_pointnet2(params, stats, prefix: str = ""):
    sd = {}
    for sa, torch_name in (("sa1", "sa1_module.conv.local_nn"),
                           ("sa2", "sa2_module.conv.local_nn")):
        _put_mlp(sd, prefix + torch_name, params[sa]["mlp"],
                 stats.get(sa, {}).get("mlp"))
    _put_mlp(sd, prefix + "sa3_module.nn", params["sa3"]["mlp"],
             stats.get("sa3", {}).get("mlp"))
    for fp in ("fp3", "fp2", "fp1"):
        _put_mlp(sd, prefix + f"{fp}_module.nn", params[fp]["mlp"],
                 stats.get(fp, {}).get("mlp"))
    for lin in ("lin1", "lin2", "lin3", "global_lin1", "global_lin2"):
        _put_lin(sd, prefix + lin, params[lin])
    return sd


def _put_single_conv(sd, prefix, p, s):
    """Positional conv_i/gn_i/bn_i -> reference kind-named submodules."""
    for name, sub in p.items():
        if name.startswith("conv_"):
            _put_conv3d(sd, f"{prefix}.conv", sub)
        elif name.startswith("gn_"):
            _put_gn(sd, f"{prefix}.groupnorm", sub)
        elif name.startswith("bn_"):
            _put_bn(sd, f"{prefix}.batchnorm", sub, (s or {})[name])


def export_unet3d(params, stats, prefix: str):
    sd = {}
    residual = "conv3" in params.get("encoder_0", {})
    for kind in ("encoder", "decoder"):
        i = 0
        while f"{kind}_{i}" in params:
            bp = params[f"{kind}_{i}"]
            bs = stats.get(f"{kind}_{i}", {})
            base = f"{prefix}.{kind}s.{i}.basic_module"
            if residual:
                for conv in ("conv1", "conv2", "conv3"):
                    _put_single_conv(sd, f"{base}.{conv}", bp[conv],
                                     bs.get(conv))
            else:
                for j, conv in ((1, "conv1"), (2, "conv2")):
                    _put_single_conv(sd, f"{base}.SingleConv{j}", bp[conv],
                                     bs.get(conv))
            if kind == "decoder" and f"upsample_{i}" in params:
                k = np.asarray(params[f"upsample_{i}"]["kernel"])
                sd[f"{prefix}.decoders.{i}.upsampling.upsample.weight"] = (
                    np.ascontiguousarray(np.transpose(k, (4, 3, 0, 1, 2))))
                sd[f"{prefix}.decoders.{i}.upsampling.upsample.bias"] = (
                    np.asarray(params[f"upsample_{i}"]["bias"]))
            i += 1
    _put_conv3d(sd, f"{prefix}.final_conv", params["final_conv"])
    return sd


def export_pipeline(params, stats):
    sd = export_pointnet2(params["pointnet2_nocs"],
                          stats.get("pointnet2_nocs", {}),
                          prefix="pointnet2_nocs.")
    _put_mlp(sd, "volume_agg.local_nn", params["volume_agg"]["local_nn"],
             stats.get("volume_agg", {}).get("local_nn"))
    sd.update(export_unet3d(params["unet_3d"], stats.get("unet_3d", {}),
                            "unet_3d.abstract_3d_unet"))
    for dec in ("volume_decoder", "surface_decoder", "mc_surface_decoder"):
        if dec in params:
            _put_mlp(sd, f"{dec}.mlp", params[dec]["mlp"],
                     stats.get(dec, {}).get("mlp"))
    return sd


def export_state(state: dict) -> dict:
    params = state["params"]
    stats = state.get("batch_stats", {})
    if "volume_agg" in params:
        return export_pipeline(params, stats)
    return export_pointnet2(params, stats)


def _hparams_to_torch(hparams: dict, is_pipeline: bool) -> dict:
    hp = dict(hparams or {})
    if is_pipeline and "pointnet2_params" in hp:
        hp["pointnet2_params"] = dict(hp["pointnet2_params"])
    return hp


def main(src, dst):
    import torch
    from garmentnets_tpu.core.checkpoint import load_checkpoint
    state, hparams = load_checkpoint(src)
    sd = export_state(state)
    step = int(np.asarray(state.get("step", 0)))
    ckpt = {
        "state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()},
        "hyper_parameters": _hparams_to_torch(
            hparams, "volume_agg" in state["params"]),
        "epoch": 0,
        "global_step": step,
        "pytorch-lightning_version": "1.3.0",
        "optimizer_states": [],
        "lr_schedulers": [],
        "callbacks": {},
    }
    torch.save(ckpt, dst)
    print(f"exported {src} -> {dst} ({len(sd)} tensors)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
