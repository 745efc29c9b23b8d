"""Virtual voxel grid index math.

Capability parity with the reference `components/gridding.py:101-256`
(`VirtualGrid`): maps between continuous points in an AABB and integer voxel
indices, plus flat-index packing used by the scatter-to-volume path.

Backend-agnostic: all methods are plain arithmetic on the input array type, so
they work identically for numpy arrays on host (dataset sampling) and traced
jnp arrays inside jit (volume aggregation). No torch-style device plumbing —
placement is XLA's job.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class VirtualGrid:
    lower_corner: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    upper_corner: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    grid_shape: Tuple[int, int, int] = (32, 32, 32)
    batch_size: int = 8

    @property
    def num_grids(self) -> int:
        return int(self.batch_size * np.prod(self.grid_shape))

    # ------------------------------------------------------------------
    # index <-> point maps (reference: gridding.py:161-186, 230-256)
    # ------------------------------------------------------------------
    def get_points_grid_idxs(self, points, batch_idx=None):
        """Continuous points -> clamped integer voxel indices.

        points: (..., 3) float array in any backend.
        batch_idx: optional (...) int array; if given, prepended as idxs[...,0].
        Matches reference truncation semantics: float->int cast (toward zero),
        then clamp per-axis to [0, grid_shape[i]-1].
        """
        xp = _xp(points)
        lc = xp.asarray(self.lower_corner, dtype=points.dtype)
        uc = xp.asarray(self.upper_corner, dtype=points.dtype)
        idx_scale = xp.asarray(self.grid_shape, dtype=points.dtype) - 1
        scales = idx_scale / (uc - lc)
        idxs_f = (points - lc) * scales
        idxs_i = idxs_f.astype(_int_dtype(xp))
        hi = xp.asarray(self.grid_shape, dtype=idxs_i.dtype) - 1
        idxs = xp.clip(idxs_i, 0, hi)
        if batch_idx is not None:
            b = batch_idx.reshape(points.shape[:-1] + (1,)).astype(idxs.dtype)
            idxs = xp.concatenate([b, idxs], axis=-1)
        return idxs

    def idxs_to_points(self, idxs):
        """Integer voxel indices -> voxel-center points (reference :230-256).

        Accepts (...,3) or (...,4) (leading batch column dropped).
        """
        xp = _xp(idxs)
        if idxs.shape[-1] == 4:
            idxs = idxs[..., 1:]
        elif idxs.shape[-1] != 3:
            raise ValueError(f"invalid idxs shape {idxs.shape}")
        lc = xp.asarray(self.lower_corner, dtype=_float_dtype(xp))
        uc = xp.asarray(self.upper_corner, dtype=_float_dtype(xp))
        idx_scale = xp.asarray(self.grid_shape, dtype=_float_dtype(xp)) - 1
        scales = (uc - lc) / idx_scale
        return idxs.astype(_float_dtype(xp)) * scales + lc

    def flatten_idxs(self, idxs, keepdim: bool = False):
        """Pack (...,3|4) integer coords into flat row-major index.

        Coord size 4 includes the batch column (stride grid volume).
        Matches reference stride order (gridding.py:188-206).
        """
        xp = _xp(idxs)
        coord_size = idxs.shape[-1]
        if coord_size == 4:
            target_shape = (self.batch_size,) + tuple(self.grid_shape)
        elif coord_size == 3:
            target_shape = tuple(self.grid_shape)
        else:
            raise ValueError(f"invalid idxs shape {idxs.shape}")
        stride = tuple(
            np.cumprod(np.array(target_shape)[::-1])[::-1]
        )[1:] + (1,)
        stride_arr = xp.asarray(stride, dtype=idxs.dtype)
        flat = (idxs * stride_arr).sum(axis=-1)
        if keepdim:
            flat = flat[..., None]
        return flat

    def unflatten_idxs(self, flat_idxs, include_batch: bool = True):
        xp = _xp(flat_idxs)
        target_shape = tuple(self.grid_shape)
        if include_batch:
            target_shape = (self.batch_size,) + target_shape
        stride = tuple(
            np.cumprod(np.array(target_shape)[::-1])[::-1]
        )[1:] + (1,)
        if flat_idxs.shape and flat_idxs.shape[-1] == 1:
            flat_idxs = flat_idxs[..., 0]
        cols = []
        mod = flat_idxs
        for s in stride:
            cols.append(mod // s)
            mod = mod % s
        return xp.stack(cols, axis=-1)

    # ------------------------------------------------------------------
    # dense grid generation (reference :125-159)
    # ------------------------------------------------------------------
    def get_grid_points(self, include_batch: bool = True, dtype=np.float32):
        """Dense (D,H,W,3) (or (B,D,H,W,3)) array of voxel-center points.

        Host-side numpy (used by predict's dense query grid); tiny and static.
        """
        axes = [
            np.linspace(self.lower_corner[i], self.upper_corner[i],
                        self.grid_shape[i], dtype=dtype)
            for i in range(3)
        ]
        grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
        if include_batch:
            grid = np.broadcast_to(
                grid, (self.batch_size,) + grid.shape)
        return grid


def _xp(arr):
    """Pick numpy or jax.numpy based on array type (no jax import on host path)."""
    if isinstance(arr, np.ndarray):
        return np
    import jax.numpy as jnp  # deferred: host-only users never import jax
    return jnp


def _int_dtype(xp):
    return np.int32 if xp is not np else np.int64


def _float_dtype(xp):
    return np.float32
