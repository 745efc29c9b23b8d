"""Device-side active-cube extraction for host marching cubes.

The remote-TPU link is bandwidth- and latency-poor (measured ~20 MB/s d2h);
shipping full 128^3 WNF volumes to the host (8.4 MB/garment, plus another
8.4 MB of gradient magnitude) would dominate end-to-end predict time. Instead
the device finds the cubes whose corners straddle the iso level and emits a
fixed-capacity (static-shape) list of cube ids + corner values — ~1 MB per
garment. The C++ marching-cubes kernel consumes the list directly
(marching_cubes.marching_cubes_active), also skipping its full-volume scan.

Corner order matches marching_cubes.CUBE_CORNERS.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from garmentnets_tpu.ops.marching_cubes import CUBE_CORNERS


VAL_QUANT_SCALE = 254.0  # int8 mode: (v - level) * 254 in [-127, 127]


@functools.partial(jax.jit, static_argnames=("level", "cap", "quantize"))
def extract_active_cubes(wnf: jax.Array, level: float, cap: int,
                         quantize: bool = False):
    """wnf: [B, S, S, S] -> (base_idx [B,cap] i32 (-1 pad), vals [B,cap,8],
    counts [B] i32).

    base_idx is the flat C-order index of each active cube's origin vertex.
    counts may exceed cap (host should detect overflow and fall back to the
    full-volume path).

    vals dtype: f16, or int8 when quantize=True — (v-level)*VAL_QUANT_SCALE
    saturated to [-127,127]; the d2h link is the predict bottleneck and the
    int8 halves the dominant transfer. Dequantized corner values shift MC
    vertices by at most (1/254)/|corner gap| of a voxel — sub-1% at real
    iso crossings; shared corners quantize identically so the mesh stays
    crack-free. Host side dequantizes via dequantize_vals()."""
    B, S = wnf.shape[0], wnf.shape[1]
    inside = wnf > level
    corner_slices = [
        inside[:, dx:S - 1 + dx, dy:S - 1 + dy, dz:S - 1 + dz]
        for (dx, dy, dz) in CUBE_CORNERS]
    any_in = functools.reduce(jnp.logical_or, corner_slices)
    all_in = functools.reduce(jnp.logical_and, corner_slices)
    active = jnp.logical_and(any_in, jnp.logical_not(all_in))
    counts = active.reshape(B, -1).sum(axis=1).astype(jnp.int32)

    s3 = (S - 1) ** 3
    flat_active = active.reshape(B, s3)

    # stream compaction via cumsum + searchsorted: the k-th active cube is
    # the first index whose prefix count reaches k+1 (binary search over the
    # monotone prefix sum). ~25% faster than jnp.nonzero(size=cap) here and
    # avoids its vmapped-scatter lowering.
    csum = jnp.cumsum(flat_active.astype(jnp.int32), axis=1)
    targets = jnp.arange(1, cap + 1, dtype=jnp.int32)
    cube_idx = jax.vmap(
        lambda row: jnp.searchsorted(row, targets))(csum)
    cube_idx = jnp.where(targets[None, :] <= counts[:, None],
                         cube_idx, -1).astype(jnp.int32)
    # cube-grid flat idx -> full-grid flat idx of the origin vertex
    s = S - 1
    cz = cube_idx % s
    cy = (cube_idx // s) % s
    cx = cube_idx // (s * s)
    base = (cx * S + cy) * S + cz
    # corner values gathered straight from the WNF (materializing a dense
    # 8-channel corner volume first costs ~0.5 GB of HBM traffic per batch)
    corner_off = jnp.asarray(
        (CUBE_CORNERS[:, 0] * S + CUBE_CORNERS[:, 1]) * S
        + CUBE_CORNERS[:, 2], jnp.int32)                    # [8]
    gather_idx = jnp.maximum(base, 0)[..., None] + corner_off
    vals = jnp.take_along_axis(
        wnf.reshape(B, -1), gather_idx.reshape(B, -1),
        axis=1).reshape(B, cap, 8)
    base = jnp.where(cube_idx >= 0, base, -1).astype(jnp.int32)
    if quantize:
        q = jnp.clip(jnp.round((vals - level) * VAL_QUANT_SCALE),
                     -127, 127).astype(jnp.int8)
        return base, q, counts
    return base, vals.astype(jnp.float16), counts


def dequantize_vals(vals, level: float):
    """Host-side inverse of the int8 quantization (no-op for float vals)."""
    import numpy as np
    vals = np.asarray(vals)
    if vals.dtype == np.int8:
        return vals.astype(np.float32) / VAL_QUANT_SCALE + level
    return vals.astype(np.float32)
