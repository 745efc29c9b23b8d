"""Stage-2 pipeline: volume aggregation -> 3D U-Net -> implicit WNF decoders.

Capability parity with reference `networks/conv_implicit_wnf.py`
(VolumeFeatureAggregator, UNet3D wrapper, ImplicitWNFDecoder,
ConvImplicitWNFPipeline) in dense-batch TPU form. The frozen stage-1 network
runs in eval mode with stopped gradients (reference pointnet2_forward
:213-240 freezes + evals the submodule).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from garmentnets_tpu.models.losses import masked_mean
from garmentnets_tpu.models.mlp import PointMLP
from garmentnets_tpu.models.pointnet2_nocs import (
    PointNet2NOCS, PointNet2NOCSConfig, logits_to_nocs_bins)
from garmentnets_tpu.models.unet3d import UNet3D
from garmentnets_tpu.ops.virtual_grid import VirtualGrid
from garmentnets_tpu.ops.scatter import scatter_to_grid
from garmentnets_tpu.ops.grid_sample import grid_sample_trilinear


class VolumeFeatureAggregator(nn.Module):
    """Scatter per-point features (+local offset, sim points, confidence)
    into a feature volume (reference conv_implicit_wnf.py:23-100)."""
    nn_channels: Sequence[int] = (137, 137, 128)
    batch_norm: bool = True
    lower_corner: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    upper_corner: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    grid_shape: Tuple[int, int, int] = (32, 32, 32)
    reduce_method: str = "max"
    include_point_feature: bool = True
    include_confidence_feature: bool = True

    @nn.compact
    def __call__(self, nocs_data: dict, train: bool = True):
        points = nocs_data["pos"]                                 # [B,N,3]
        B = points.shape[0]
        vg = VirtualGrid(self.lower_corner, self.upper_corner,
                         self.grid_shape, batch_size=B)
        idxs = vg.get_points_grid_idxs(points)                    # [B,N,3]
        flat_idxs = vg.flatten_idxs(idxs)                         # [B,N]

        feats = [nocs_data["x"]]
        if self.include_point_feature:
            grid_points = vg.idxs_to_points(idxs)
            feats.append(points - grid_points)
            feats.append(nocs_data["sim_points"])
        if self.include_confidence_feature:
            feats.append(nocs_data["pred_confidence"])
        features = jnp.concatenate(feats, axis=-1)

        features = PointMLP(self.nn_channels, self.batch_norm,
                            name="local_nn")(features, train=train)
        num_cells = (self.grid_shape[0] * self.grid_shape[1]
                     * self.grid_shape[2])
        vol = scatter_to_grid(features, flat_idxs, num_cells,
                              self.reduce_method)                 # [B,V,C]
        return vol.reshape((B,) + tuple(self.grid_shape)
                           + (features.shape[-1],))


class ImplicitWNFDecoder(nn.Module):
    """Trilinear feature lookup + MLP head (reference :121-149).

    Axis-order quirk preserved for checkpoint parity: unlike the dataset's
    nocs_grid_sample (reference gridding.py:70, which flips xyz->zyx), the
    reference decoder feeds query points to F.grid_sample UNFLIPPED
    (conv_implicit_wnf.py:128-142), so with its [B,C,Gx,Gy,Gz] volume the
    lookup lands at V[qz, qy, qx]. The trained UNet features live in that
    convention; converted reference weights only reproduce if we sample the
    same way, hence the [..., ::-1] below."""
    nn_channels: Sequence[int] = (128, 256, 256, 1)
    batch_norm: bool = True

    @nn.compact
    def __call__(self, features_grid, query_points, train: bool = True):
        """features_grid: [B,D,H,W,C]; query_points: [B,M,3] -> [B,M,C']."""
        sampled = grid_sample_trilinear(features_grid,
                                        query_points[..., ::-1])
        return PointMLP(self.nn_channels, self.batch_norm,
                        name="mlp")(sampled, train=train)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    pointnet2: PointNet2NOCSConfig = PointNet2NOCSConfig()
    volume_agg_nn_channels: Tuple[int, ...] = (137, 137, 128)
    volume_agg_batch_norm: bool = True
    grid_shape: Tuple[int, int, int] = (32, 32, 32)
    reduce_method: str = "max"
    include_point_feature: bool = True
    include_confidence_feature: bool = True
    unet_in_channels: int = 128
    unet_out_channels: int = 128
    unet_f_maps: int = 32
    unet_layer_order: str = "gcr"
    unet_num_groups: int = 8
    unet_num_levels: int = 4
    volume_decoder_channels: Tuple[int, ...] = (128, 256, 256, 1)
    surface_decoder_channels: Tuple[int, ...] = (128, 256, 256, 3)
    mc_surface_decoder_channels: Tuple[int, ...] = (128, 256, 256, 1)
    decoder_batch_norm: bool = True
    # training params (reference ctor :152-177)
    learning_rate: float = 1e-4
    loss_type: str = "l2"
    volume_loss_weight: float = 1.0
    surface_loss_weight: float = 1.0
    mc_surface_loss_weight: float = 0.0
    volume_classification: bool = False
    volume_task_space: bool = False

    @property
    def has_mc_surface_decoder(self) -> bool:
        return self.mc_surface_loss_weight > 0


class ConvImplicitWNFPipeline(nn.Module):
    cfg: PipelineConfig

    def setup(self):
        c = self.cfg
        self.pointnet2_nocs = PointNet2NOCS(c.pointnet2)
        self.volume_agg = VolumeFeatureAggregator(
            nn_channels=c.volume_agg_nn_channels,
            batch_norm=c.volume_agg_batch_norm,
            grid_shape=c.grid_shape,
            reduce_method=c.reduce_method,
            include_point_feature=c.include_point_feature,
            include_confidence_feature=c.include_confidence_feature)
        self.unet_3d = UNet3D(
            in_channels=c.unet_in_channels,
            out_channels=c.unet_out_channels,
            f_maps=c.unet_f_maps, layer_order=c.unet_layer_order,
            num_groups=c.unet_num_groups, num_levels=c.unet_num_levels)
        self.volume_decoder = ImplicitWNFDecoder(
            c.volume_decoder_channels, c.decoder_batch_norm)
        self.surface_decoder = ImplicitWNFDecoder(
            c.surface_decoder_channels, c.decoder_batch_norm)
        if c.has_mc_surface_decoder:
            self.mc_surface_decoder = ImplicitWNFDecoder(
                c.mc_surface_decoder_channels, c.decoder_batch_norm)

    # stage forwards (reference :211-277) -------------------------------
    def pointnet2_forward(self, x, pos):
        """Frozen stage-1: eval mode, stopped gradients (reference :213-240)."""
        result = self.pointnet2_nocs(x, pos, train=False)
        result = jax.tree_util.tree_map(jax.lax.stop_gradient, result)
        pred_nocs, confidence = logits_to_nocs_bins(
            self.cfg.pointnet2, result["per_point_logits"])
        result["nocs_data"] = {
            "x": result["per_point_features"],
            "pos": pred_nocs,
            "sim_points": pos,
            "pred_confidence": confidence,
        }
        return result

    def unet3d_forward(self, nocs_data, train: bool = True):
        in_vol = self.volume_agg(nocs_data, train=train)
        out_vol = self.unet_3d(in_vol, train=train)
        return out_vol

    def volume_decoder_forward(self, feature_volume, query_points,
                               train: bool = True):
        out = self.volume_decoder(feature_volume, query_points, train=train)
        return out[..., 0]                                        # [B,M]

    def surface_decoder_forward(self, feature_volume, query_points,
                                train: bool = True):
        return self.surface_decoder(feature_volume, query_points, train=train)

    def mc_surface_decoder_forward(self, feature_volume, query_points,
                                   train: bool = True):
        return self.mc_surface_decoder(
            feature_volume, query_points, train=train)

    # task-space variant (reference :279-310) ----------------------------
    @staticmethod
    def get_aabb_scale_offset(aabb, padding: float = 0.05):
        """aabb: [B,2,3] -> (scale [B], offset [B,3]) (reference :297-310)."""
        nocs_radius = 0.5 - padding
        radius = jnp.max(jnp.abs(aabb), axis=1)[:, :2]
        radius_scale = jnp.min(nocs_radius / radius, axis=1)
        z_length = aabb[:, 1, 2] - aabb[:, 0, 2]
        z_scale = (nocs_radius * 2) / z_length
        scale = jnp.minimum(radius_scale, z_scale)
        z_max = aabb[:, 1, 2] * scale
        offset = jnp.full((aabb.shape[0], 3), 0.5, aabb.dtype)
        offset = offset.at[:, 2].set(1 - padding - z_max)
        return scale, offset

    def apply_volume_task_space(self, pos, cloth_sim_aabb, pointnet2_result):
        """Replace predicted NOCS with AABB-normalized sim coords
        (reference :279-295; uses item 0's scale for the whole batch)."""
        scale, offset = self.get_aabb_scale_offset(cloth_sim_aabb)
        new_pos = pos * scale[0] + offset[0]
        new_result = dict(pointnet2_result)
        new_result["nocs_data"] = dict(pointnet2_result["nocs_data"],
                                       pos=new_pos)
        return new_result

    # full forward (reference :314-338) ----------------------------------
    def __call__(self, batch: dict, train: bool = True):
        pointnet2_result = self.pointnet2_forward(batch["x"], batch["pos"])
        if self.cfg.volume_task_space:
            pointnet2_result = self.apply_volume_task_space(
                batch["pos"], batch["cloth_sim_aabb"], pointnet2_result)
        feature_volume = self.unet3d_forward(
            pointnet2_result["nocs_data"], train=train)
        result = {
            "pointnet2_result": pointnet2_result,
            "feature_volume": feature_volume,
            "pred_volume_value": self.volume_decoder_forward(
                feature_volume, batch["volume_query_points"], train=train),
            "pred_sim_points": self.surface_decoder_forward(
                feature_volume, batch["surf_query_points"], train=train),
        }
        if self.cfg.has_mc_surface_decoder:
            result["pred_mc_surface_logits"] = self.mc_surface_decoder_forward(
                feature_volume, batch["mc_surf_query_points"], train=train)
        return result


def pipeline_loss(cfg: PipelineConfig, result: dict, batch: dict) -> dict:
    """Weighted volume + surface (+ optional mc-surface BCE) loss
    (reference infer :405-444). Rows with batch['_valid_mask']==0 (trainer
    padding) are excluded from every reduction."""
    mask = batch.get("_valid_mask")

    def criterion(pred, gt):
        if cfg.loss_type == "l2":
            return masked_mean((pred - gt) ** 2, mask)
        if cfg.loss_type == "smooth_l1":
            d = jnp.abs(pred - gt)
            return masked_mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5), mask)
        raise ValueError(f"invalid loss_type {cfg.loss_type!r}")

    def bce_logits(logits, target):
        return masked_mean(
            jnp.maximum(logits, 0) - logits * target
            + jnp.log1p(jnp.exp(-jnp.abs(logits))), mask)

    pred_vol = result["pred_volume_value"]
    gt_vol = batch["gt_volume_value"]
    vol_loss = (bce_logits(pred_vol, gt_vol) if cfg.volume_classification
                else criterion(pred_vol, gt_vol))
    surf_loss = criterion(result["pred_sim_points"], batch["gt_sim_points"])
    losses = {
        "volume_loss": cfg.volume_loss_weight * vol_loss,
        "surface_loss": cfg.surface_loss_weight * surf_loss,
    }
    if cfg.has_mc_surface_decoder:
        losses["mc_surface_loss"] = cfg.mc_surface_loss_weight * bce_logits(
            result["pred_mc_surface_logits"],
            batch["is_query_point_on_surf"])
    metrics = dict(losses)
    metrics["loss"] = sum(losses.values())
    return metrics
