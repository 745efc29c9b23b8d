"""Per-epoch image logging hooks for training.

Capability parity with the reference's wandb image logging
(networks/pointnet2_nocs.py:203-255 vis_batch, conv_implicit_wnf.py:345-403):
renders GT/pred NOCS pairs (+grip overlays, confidence) for stage 1 and
NOCS + WNF-slice pairs for stage 2, deterministically selected via
get_vis_idxs, written as PNGs by the local RunLogger.
"""
from __future__ import annotations

import numpy as np

from garmentnets_tpu.utils.rendering import (
    render_nocs_pair, render_confidence_pair, render_wnf_points_pair,
    get_vis_idxs)


def vis_stage1(logger, batch: dict, nocs_data: dict, batch_idx: int,
               batch_size: int, vis_per_items: int, max_vis_per_epoch: int,
               is_train: bool, step: int):
    if vis_per_items <= 0:
        return
    prefix = "train_" if is_train else "val_"
    this_b = np.asarray(batch["y"]).shape[0]
    _, selected, vis_idxs = get_vis_idxs(
        batch_idx, batch_size=batch_size, this_batch_size=this_b,
        vis_per_items=vis_per_items, max_vis_per_epoch=max_vis_per_epoch)
    gt_nocs = np.asarray(batch["y"])
    pred_nocs = np.asarray(nocs_data["pos"])
    pos = np.asarray(batch["pos"])
    gt_grip = np.asarray(batch["nocs_grip_point"])
    pred_grip_nn = np.asarray(nocs_data["grip_point"])
    for i, vis_idx in zip(selected, vis_idxs):
        grip_idx = int(np.argmin(np.linalg.norm(pos[i], axis=1)))
        img = render_nocs_pair(
            gt_nocs[i], pred_nocs[i], gt_grip[i],
            pred_nocs[i][grip_idx], pred_grip_nn[i])
        if "pred_confidence" in nocs_data:
            conf = np.asarray(nocs_data["pred_confidence"])[i][:, 0]
            cimg = render_confidence_pair(gt_nocs[i], pred_nocs[i], conf)
            img = np.concatenate([img, cimg], axis=0)
        logger.log_image(f"{prefix}{vis_idx}", img[..., :3], step=step)


def vis_stage2(logger, batch: dict, result: dict, batch_idx: int,
               batch_size: int, vis_per_items: int, max_vis_per_epoch: int,
               is_train: bool, step: int):
    if vis_per_items <= 0:
        return
    prefix = "train_" if is_train else "val_"
    this_b = np.asarray(batch["y"]).shape[0]
    _, selected, vis_idxs = get_vis_idxs(
        batch_idx, batch_size=batch_size, this_batch_size=this_b,
        vis_per_items=vis_per_items, max_vis_per_epoch=max_vis_per_epoch)
    gt_nocs = np.asarray(batch["y"])
    nd = result["pointnet2_result"]["nocs_data"]
    pred_nocs = np.asarray(nd["pos"])
    pos = np.asarray(batch["pos"])
    gt_grip = np.asarray(batch["nocs_grip_point"])
    q = np.asarray(batch["volume_query_points"])
    gt_v = np.asarray(batch["gt_volume_value"])
    pred_v = np.asarray(result["pred_volume_value"])
    for i, vis_idx in zip(selected, vis_idxs):
        grip_idx = int(np.argmin(np.linalg.norm(pos[i], axis=1)))
        nocs_img = render_nocs_pair(
            gt_nocs[i], pred_nocs[i], gt_grip[i], pred_nocs[i][grip_idx])
        wnf_img = render_wnf_points_pair(q[i], gt_v[i], pred_v[i])
        img = np.concatenate([nocs_img, wnf_img], axis=0)
        logger.log_image(f"{prefix}{vis_idx}", img[..., :3], step=step)
