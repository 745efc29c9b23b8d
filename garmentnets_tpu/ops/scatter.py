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
