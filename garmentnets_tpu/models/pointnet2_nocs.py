"""Stage-1 network: PointNet++ NOCS canonicalization.

Capability parity with reference `networks/pointnet2_nocs.py` (PointNet2NOCS):
encoder-decoder PointNet++ (3 SA + 3 FP) with a per-point 64-bin x 3-axis NOCS
classification head and a global grip-point head, plus the loss/metric
variants (regression MSE, per-axis cross-entropy binning, symmetry
min-over-mirror). Re-designed dense-batch for TPU (no PyG Batch); the
Lightning module split into a pure flax module + pure loss functions.

Architecture constants (SURVEY.md §2.2): SA1(.5, .05, [6,64,64,128]) ->
SA2(.25, .1, [131,128,128,256]) -> GlobalSA([259,256,512,1024]) ->
FP3(k1,[1280,256,256]) -> FP2(k3,[384,256,128]) -> FP1(k3,[131,128,128,128])
-> lin 128->128->feature_dim->nocs_bins*3; global 1024->1024->nocs_bins*3.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from garmentnets_tpu.models.losses import masked_mean
from garmentnets_tpu.models.pointnet2 import (
    SAModule, GlobalSAModule, FPModule)
from garmentnets_tpu.ops.virtual_grid import VirtualGrid


@dataclasses.dataclass(frozen=True)
class PointNet2NOCSConfig:
    feature_dim: int = 128
    batch_norm: bool = True
    dropout: bool = True
    sa1_ratio: float = 0.5
    sa1_r: float = 0.05
    sa2_ratio: float = 0.25
    sa2_r: float = 0.1
    fp3_k: int = 1
    fp2_k: int = 3
    fp1_k: int = 3
    nocs_bins: Optional[int] = 64
    symmetry_axis: Optional[int] = None
    # training params (carried with the config for checkpoint hparam parity,
    # reference save_hyperparameters at networks/pointnet2_nocs.py:78)
    learning_rate: float = 1e-4
    nocs_loss_weight: float = 1.0
    grip_point_loss_weight: float = 1.0

    @property
    def output_dim(self) -> int:
        return 3 if self.nocs_bins is None else self.nocs_bins * 3

    def virtual_grid(self) -> VirtualGrid:
        return VirtualGrid(grid_shape=(self.nocs_bins,) * 3, batch_size=1)


class PointNet2NOCS(nn.Module):
    cfg: PointNet2NOCSConfig

    @nn.compact
    def __call__(self, x, pos, train: bool = True):
        """x: [B, N, 3] rgb features; pos: [B, N, 3] sim-space points.

        Returns dict: per_point_features [B,N,feature_dim], per_point_logits
        [B,N,output_dim], global_logits [B,output_dim], global_feature
        [B,1024]. (Reference forward at networks/pointnet2_nocs.py:134-166.)
        """
        c = self.cfg
        bn = c.batch_norm
        sa1_x, sa1_pos = SAModule(
            c.sa1_ratio, c.sa1_r, (6, 64, 64, 128), batch_norm=bn,
            name="sa1")(x, pos, train=train)
        sa2_x, sa2_pos = SAModule(
            c.sa2_ratio, c.sa2_r, (131, 128, 128, 256), batch_norm=bn,
            name="sa2")(sa1_x, sa1_pos, train=train)
        sa3_x, sa3_pos = GlobalSAModule(
            (259, 256, 512, 1024), batch_norm=bn, name="sa3")(
                sa2_x, sa2_pos, train=train)

        fp3_x, _ = FPModule(c.fp3_k, (1024 + 256, 256, 256), batch_norm=bn,
                            name="fp3")(
            sa3_x[:, None], sa3_pos, sa2_x, sa2_pos, train=train)
        fp2_x, _ = FPModule(c.fp2_k, (256 + 128, 256, 128), batch_norm=bn,
                            name="fp2")(
            fp3_x, sa2_pos, sa1_x, sa1_pos, train=train)
        fp1_x, _ = FPModule(c.fp1_k, (128 + 3, 128, 128, 128), batch_norm=bn,
                            name="fp1")(
            fp2_x, sa1_pos, x, pos, train=train)

        # per-point head (reference :144-149; note features = post-dropout)
        h = nn.relu(nn.Dense(128, name="lin1")(fp1_x))
        h = self._dropout(h, train, "dp1")
        h = nn.Dense(c.feature_dim, name="lin2")(h)
        features = self._dropout(h, train, "dp2")
        logits = nn.Dense(c.output_dim, name="lin3")(features)

        # global head (reference :151-157: relu only on the input feature)
        g = nn.relu(sa3_x)
        g = self._dropout(g, train, "global_dp1")
        g = nn.Dense(1024, name="global_lin1")(g)
        g = self._dropout(g, train, "global_dp2")
        global_logits = nn.Dense(c.output_dim, name="global_lin2")(g)

        return {
            "per_point_features": features,
            "per_point_logits": logits,
            "global_logits": global_logits,
            "global_feature": sa3_x,
        }

    def _dropout(self, h, train, name):
        if not self.cfg.dropout:
            return h
        return nn.Dropout(rate=0.5, deterministic=not train, name=name)(h)


# ---------------------------------------------------------------------------
# pure functions: logits -> predictions, losses/metrics
# ---------------------------------------------------------------------------
def logits_to_nocs_bins(cfg: PointNet2NOCSConfig, logits: jax.Array):
    """logits [..., bins*3] -> (pred_nocs [...,3], confidence [...,3]).

    Parity: argmax-bin -> voxel-center point (reference logits_to_nocs :168)
    + per-axis softmax prob of the argmax bin (confidence, :310-314).
    """
    bins = cfg.nocs_bins
    lb = logits.reshape(logits.shape[:-1] + (bins, 3))
    bin_idx = jnp.argmax(lb, axis=-2)                             # [...,3]
    prob = jax.nn.softmax(lb, axis=-2)
    confidence = jnp.take_along_axis(
        prob, bin_idx[..., None, :], axis=-2)[..., 0, :]
    vg = cfg.virtual_grid()
    pred = vg.idxs_to_points(bin_idx)
    return pred, confidence


def mirror_nocs_points_by_axis(points, axis: Optional[int]):
    """Reflect NOCS points about the axis plane through 0.5
    (reference components/symmetry.py:5-19)."""
    if axis is None:
        return points
    add = jnp.zeros((3,), points.dtype).at[axis].set(0.5)
    mul = jnp.ones((3,), points.dtype).at[axis].set(-1.0)
    return (points - add) * mul + add


def _bin_cross_entropy(cfg, logits, gt_points, mask=None):
    """Per-axis CE over nocs bins. logits [...,bins*3]; gt [...,3] in [0,1]."""
    bins = cfg.nocs_bins
    lb = logits.reshape(logits.shape[:-1] + (bins, 3))
    vg = cfg.virtual_grid()
    gt_idx = vg.get_points_grid_idxs(gt_points)                   # [...,3]
    logp = jax.nn.log_softmax(lb, axis=-2)
    picked = jnp.take_along_axis(logp, gt_idx[..., None, :], axis=-2)
    return -masked_mean(picked, mask)


def get_metrics_bin(cfg: PointNet2NOCSConfig, result: dict, batch: dict,
                    mirror_axis: Optional[int] = None) -> tuple[dict, dict]:
    """CE binning loss + error metrics (reference get_metrics_bin_simple :288
    and the mirrored variant of get_metrics_bin_symmetry_helper :341)."""
    gt_nocs = batch["y"]
    gt_grip = batch["nocs_grip_point"]  # [B,3] (collate of (1,3) rows)
    mask = batch.get("_valid_mask")
    if mirror_axis is not None:
        gt_nocs = mirror_nocs_points_by_axis(gt_nocs, mirror_axis)
        gt_grip = mirror_nocs_points_by_axis(gt_grip, mirror_axis)

    nocs_loss = _bin_cross_entropy(
        cfg, result["per_point_logits"], gt_nocs, mask)
    grip_loss = _bin_cross_entropy(
        cfg, result["global_logits"], gt_grip, mask)
    pred_nocs, confidence = logits_to_nocs_bins(
        cfg, result["per_point_logits"])
    pred_grip, _ = logits_to_nocs_bins(cfg, result["global_logits"])

    loss = (cfg.nocs_loss_weight * nocs_loss
            + cfg.grip_point_loss_weight * grip_loss)
    metrics = {
        "loss": loss,
        "nocs_loss": nocs_loss,
        "grip_point_loss": grip_loss,
        "nocs_err_dist": masked_mean(
            jnp.linalg.norm(pred_nocs - gt_nocs, axis=-1), mask),
        "grip_point_err_dist": masked_mean(
            jnp.linalg.norm(pred_grip - gt_grip, axis=-1), mask),
    }
    nocs_data = {
        "x": result["per_point_features"],
        "pos": pred_nocs,
        "grip_point": pred_grip,
        "pred_confidence": confidence,
    }
    return metrics, nocs_data


def get_metrics_regression(cfg: PointNet2NOCSConfig, result: dict,
                           batch: dict) -> tuple[dict, dict]:
    """MSE regression variant (reference get_metrics_regression :257); with a
    symmetry axis configured, uses min-over-mirror MSE (MirrorMSELoss)."""
    pred_nocs = result["per_point_logits"]
    pred_grip = result["global_logits"]
    gt_nocs, gt_grip = batch["y"], batch["nocs_grip_point"]
    mask = batch.get("_valid_mask")

    def criterion(pred, gt):
        mse = masked_mean((pred - gt) ** 2, mask)
        if cfg.symmetry_axis is None:
            return mse
        gt_m = mirror_nocs_points_by_axis(gt, 0)  # MirrorMSELoss mirrors x
        return jnp.minimum(mse, masked_mean((pred - gt_m) ** 2, mask))

    nocs_loss = criterion(pred_nocs, gt_nocs)
    grip_loss = masked_mean((pred_grip - gt_grip) ** 2, mask)
    loss = (cfg.nocs_loss_weight * nocs_loss
            + cfg.grip_point_loss_weight * grip_loss)
    metrics = {
        "loss": loss, "nocs_loss": nocs_loss, "grip_point_loss": grip_loss,
        "nocs_err_dist": masked_mean(
            jnp.linalg.norm(pred_nocs - gt_nocs, axis=-1), mask),
        "grip_point_err_dist": masked_mean(
            jnp.linalg.norm(pred_grip - gt_grip, axis=-1), mask),
    }
    nocs_data = {
        "x": result["per_point_features"], "pos": pred_nocs,
        "grip_point": pred_grip,
    }
    return metrics, nocs_data


def get_metrics(cfg: PointNet2NOCSConfig, result: dict, batch: dict):
    """Dispatch like reference infer (:421-433): regression / bin-simple /
    bin-symmetry (min over normal+mirrored CE, selected branch's metrics)."""
    if cfg.nocs_bins is None:
        return get_metrics_regression(cfg, result, batch)
    if cfg.symmetry_axis is None:
        return get_metrics_bin(cfg, result, batch)
    normal_m, normal_d = get_metrics_bin(cfg, result, batch, None)
    mirror_m, mirror_d = get_metrics_bin(
        cfg, result, batch, cfg.symmetry_axis)
    take_normal = normal_m["loss"] <= mirror_m["loss"]
    final_loss = jnp.minimum(normal_m["loss"], mirror_m["loss"])
    metrics = jax.tree_util.tree_map(
        lambda a, b: jnp.where(take_normal, a, b), normal_m, mirror_m)
    metrics["loss"] = final_loss
    nocs_data = jax.tree_util.tree_map(
        lambda a, b: jnp.where(take_normal, a, b), normal_d, mirror_d)
    return metrics, nocs_data


def predict_grip_point_from_pc(pos, pred_nocs):
    """NOCS of the point nearest the gripper (origin) per batch item
    (reference predict_grip_point_nocs :37-54). pos: [B,N,3]."""
    dist = jnp.linalg.norm(pos, axis=-1)                          # [B,N]
    idx = jnp.argmin(dist, axis=-1)                               # [B]
    return jnp.take_along_axis(
        pred_nocs, idx[:, None, None], axis=1)[:, 0]
