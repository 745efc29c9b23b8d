"""Point -> voxel feature scatter (XLA segment ops).

TPU-native replacement for torch_scatter.scatter used by the reference's
`VolumeFeatureAggregator` (networks/conv_implicit_wnf.py:92-94) and
`batch_to_volume` (components/gridding.py:32-35). SURVEY.md §2.3 #5.

The fixed 6000-point -> 32^3-cell scatter is a static-shaped
`jax.ops.segment_{max,sum}`; empty-cell fill matches torch_scatter (zeros).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_cells", "reduce"))
def scatter_to_grid(features: jax.Array, flat_idx: jax.Array,
                    num_cells: int, reduce: str = "max") -> jax.Array:
    """Scatter per-point features into flat grid cells.

    features: [B, N, C]; flat_idx: [B, N] int in [0, num_cells).
    Returns [B, num_cells, C]. reduce in {max, mean, sum}; empty cells are 0
    (torch_scatter parity).
    """
    B, N, C = features.shape
    offsets = (jnp.arange(B, dtype=flat_idx.dtype) * num_cells)[:, None]
    seg = (flat_idx + offsets).reshape(-1)                       # [B*N]
    flat_feat = features.reshape(B * N, C)
    total = B * num_cells
    counts = jax.ops.segment_sum(
        jnp.ones((B * N,), features.dtype), seg, num_segments=total)
    if reduce == "max":
        out = jax.ops.segment_max(flat_feat, seg, num_segments=total)
        out = jnp.where(counts[:, None] > 0, out, 0.0)
    elif reduce == "sum":
        out = jax.ops.segment_sum(flat_feat, seg, num_segments=total)
    elif reduce == "mean":
        s = jax.ops.segment_sum(flat_feat, seg, num_segments=total)
        out = s / jnp.maximum(counts[:, None], 1.0)
    else:
        raise ValueError(f"unknown reduce {reduce!r}")
    return out.reshape(B, num_cells, C)


def batch_to_volume(points: jax.Array, features: jax.Array,
                    volume_size: int, reduce: str = "mean") -> jax.Array:
    """Dense-batch twin of reference components/gridding.py:8-42: scatter
    per-point features into a cube grid by truncated point coordinates.

    points: [B, N, 3] in [0,1]; features: [B, N, C].
    Returns [B, volume_size^3... ] reshaped to [B, S, S, S, C] feature-last.
    """
    s = volume_size
    grid_i = jnp.clip((points * s).astype(jnp.int32), 0, s - 1)
    flat = (grid_i[..., 0] * s + grid_i[..., 1]) * s + grid_i[..., 2]
    vol = scatter_to_grid(features, flat, s ** 3, reduce)
    return vol.reshape(points.shape[0], s, s, s, features.shape[-1])
