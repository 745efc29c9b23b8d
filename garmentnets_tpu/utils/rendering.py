"""Orthographic z-buffer point splatting + WNF colormaps.

Capability parity with reference `common/rendering_util.py`: renders NOCS /
confidence / WNF point clouds to images for training diagnostics. The
reference's numba JIT inner loop (rendering_util.py:8-21) is replaced by a
vectorized numpy scatter-min (kernel dilation via shifted scatters) — no JIT
dependency, same z-buffer front-point-wins semantics.
"""
from __future__ import annotations

import numpy as np


def render_points_idx(points: np.ndarray, img_size: int = 256,
                      kernel_size: int = 4) -> np.ndarray:
    """Index image of the front-most point per pixel (uint32; max = empty).

    points: [N, 3] normalized to [0,1]; image coords are (y, x) like cv.
    """
    idx_dtype = np.uint32
    default_idx = np.iinfo(idx_dtype).max
    xy = np.clip((points[:, :2] * (img_size - 1)).astype(np.int64),
                 0, img_size - 1)
    z = points[:, 2]
    kernel_offset = -(kernel_size // 2)

    # z-order: process points back-to-front so the nearest wins on ties of
    # pixel position (scatter with later-wins after sorting descending z)
    order = np.argsort(-z, kind="stable")
    xs, ys = xy[order, 0], xy[order, 1]
    idxs = order.astype(idx_dtype)

    idx_img = np.full((img_size, img_size), default_idx, idx_dtype)
    min_img = np.full((img_size, img_size), np.inf, np.float64)
    zs = z[order]
    for dy in range(kernel_offset, kernel_offset + kernel_size):
        ny = np.clip(ys + dy, 0, img_size - 1)
        for dx in range(kernel_offset, kernel_offset + kernel_size):
            nx = np.clip(xs + dx, 0, img_size - 1)
            # per-offset winner: duplicate fancy-index assignment keeps the
            # LAST write, and points are sorted back-to-front, so the
            # nearest point of this offset lands
            cand_z = np.full_like(min_img, np.inf)
            cand_i = np.full_like(idx_img, default_idx)
            cand_z[ny, nx] = zs
            cand_i[ny, nx] = idxs
            better = cand_z < min_img
            min_img[better] = cand_z[better]
            idx_img[better] = cand_i[better]
    return idx_img


def color_idx_img(idx_img, colors, default_color=np.array([1, 1, 1])):
    h, w = idx_img.shape
    default_idx = np.iinfo(idx_img.dtype).max
    not_null = idx_img < default_idx
    color_img = np.zeros((h, w, len(default_color)), np.float32)
    color_img[:, :] = default_color
    color_img[not_null] = colors[idx_img[not_null]]
    return color_img


def get_extrinsic(side: str = "front") -> np.ndarray:
    if side == "front":
        return np.array([[1, 0, 0, 0], [0, 0, -1, 1],
                         [0, 1, 0, 0], [0, 0, 0, 1]])
    if side == "top":
        return np.array([[1, 0, 0, 0], [0, -1, 0, 1],
                         [0, 0, -1, 1], [0, 0, 0, 1]])
    if side == "left":
        return np.array([[0, -1, 0, 1], [0, 0, -1, 1],
                         [1, 0, 0, 0], [0, 0, 0, 1]])
    raise ValueError(side)


def to_camera(points, extrinsic):
    return points @ extrinsic[:3, :3].T + extrinsic[:3, 3]


def render_nocs(points, colors=None, side="front", img_size=256,
                kernel_size=4, default_color=np.array([1, 1, 1, 0])):
    extrinsic = get_extrinsic(side)
    camera_points = to_camera(points, extrinsic)
    if colors is None:
        colors = np.concatenate(
            [points, np.ones((len(points), 1), points.dtype)], axis=1)
    idx_img = render_points_idx(camera_points, img_size, kernel_size)
    return color_idx_img(idx_img, colors, default_color)


def _viridis(values):
    from matplotlib import colormaps
    return colormaps["viridis"](values)


def render_wnf(wnf_img, img_size=256, cmap="viridis", min_value=-0.5,
               max_value=1.5):
    """Colormapped 2D WNF slice image (reference rendering_util.py:110-116)."""
    from matplotlib import colormaps
    value_img = (wnf_img - min_value) / (max_value - min_value)
    color_img = colormaps[cmap](value_img)
    # nearest-resize to img_size (reference uses skimage.resize)
    h = color_img.shape[0]
    idx = np.clip((np.arange(img_size) * h / img_size).astype(np.int64),
                  0, h - 1)
    return color_img[idx][:, idx]


def render_wnf_pair(gt_wnf_img, pred_wnf_img, img_size=256):
    return np.concatenate([render_wnf(gt_wnf_img, img_size),
                           render_wnf(pred_wnf_img, img_size)], axis=1)


def get_wnf_cmap(cmap="viridis", min_value=-0.5, max_value=1.5):
    from matplotlib import colormaps
    cm = colormaps[cmap]

    def cmap_func(x):
        return cm((x - min_value) / (max_value - min_value))
    return cmap_func


def render_wnf_points(query_points, wnf_values, slice_range=(0.5, 0.6),
                      side="front", **kwargs):
    colors = get_wnf_cmap()(wnf_values)
    dim_idx = 1
    sel = ((slice_range[0] < query_points[..., dim_idx])
           & (query_points[..., dim_idx] < slice_range[1]))
    if not sel.any():
        sel = np.ones(len(query_points), bool)
    return render_nocs(points=query_points[sel], colors=colors[sel],
                       side=side, **kwargs)


def render_points_confidence(points, confidence, side="front", **kwargs):
    colors = get_wnf_cmap(min_value=0.0, max_value=1.0)(confidence)
    return render_nocs(points=points, colors=colors, side=side, **kwargs)


# -- composition helpers (reference common/visualization_util.py) ----------
def overlay_grip(img, grip_nocs, color=(1, 0, 0, 1), side="front",
                 kernel_size=4):
    grip_img = render_nocs(np.expand_dims(grip_nocs, 0),
                           colors=np.array([color]), side=side,
                           img_size=img.shape[0], kernel_size=kernel_size)
    is_grip = grip_img[:, :, 3] > 0
    out = img.copy()
    out[is_grip] = grip_img[is_grip]
    return out


def render_nocs_pair(gt_nocs, pred_nocs, gt_grip_nocs=None,
                     pred_grip_nocs=None, pred_grip_nocs_nn=None,
                     side="front", img_size=256, kernel_size=4):
    colors = np.concatenate(
        [gt_nocs, np.ones((len(gt_nocs), 1), gt_nocs.dtype)], axis=1)
    gt_img = render_nocs(gt_nocs, colors, side=side, img_size=img_size,
                         kernel_size=kernel_size)
    pred_img = render_nocs(pred_nocs, colors, side=side, img_size=img_size,
                           kernel_size=kernel_size)
    if gt_grip_nocs is not None:
        gt_img = overlay_grip(gt_img, gt_grip_nocs, side=side,
                              kernel_size=kernel_size * 2)
    if pred_grip_nocs is not None:
        pred_img = overlay_grip(pred_img, pred_grip_nocs, side=side,
                                kernel_size=kernel_size * 2)
    if pred_grip_nocs_nn is not None:
        pred_img = overlay_grip(pred_img, pred_grip_nocs_nn,
                                color=(0, 1, 0, 1), side=side,
                                kernel_size=kernel_size * 2)
    return np.concatenate([gt_img, pred_img], axis=1)


def render_confidence_pair(gt_nocs, pred_nocs, confidence, side="front",
                           img_size=256, kernel_size=4):
    gt_img = render_points_confidence(gt_nocs, confidence)
    pred_img = render_points_confidence(pred_nocs, confidence)
    return np.concatenate([gt_img, pred_img], axis=1)


def render_wnf_points_pair(query_points, gt_wnf, pred_wnf, img_size=256):
    gt_img = render_wnf_points(query_points, gt_wnf, img_size=img_size)
    pred_img = render_wnf_points(query_points, pred_wnf, img_size=img_size)
    return np.concatenate([gt_img, pred_img], axis=1)


def get_vis_idxs(batch_idx, batch_size=None, this_batch_size=None,
                 vis_per_items=1, max_vis_per_epoch=None):
    """Deterministic vis-sample selection (reference
    common/visualization_util.py:73-93)."""
    assert (batch_size is not None) or (this_batch_size is not None)
    if this_batch_size is None:
        this_batch_size = batch_size
    if batch_size is None:
        batch_size = this_batch_size
    global_idxs, selected_idxs, vis_idxs = [], [], []
    for i in range(this_batch_size):
        global_idx = batch_size * batch_idx + i
        global_idxs.append(global_idx)
        vis_idx = global_idx // vis_per_items
        if (global_idx % vis_per_items == 0
                and vis_idx < max_vis_per_epoch):
            selected_idxs.append(i)
            vis_idxs.append(vis_idx)
    return global_idxs, selected_idxs, vis_idxs
