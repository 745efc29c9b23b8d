"""Trilinear volume sampling (XLA gather + lerp).

TPU-native replacement for cuDNN F.grid_sample as used by the reference's
`nocs_grid_sample` (components/gridding.py:45-98) and `ImplicitWNFDecoder`
(networks/conv_implicit_wnf.py:128-149). SURVEY.md §2.3 #6.

Semantics preserved exactly:
- align_corners=True: query q in [0,1] maps to voxel coordinate q*(size-1).
- padding_mode='border': sample position clamped to the volume boundary.
- the reference's zyx flip (gridding.py:70) + grid_sample's (x->W, y->H, z->D)
  convention compose so query axis 0 indexes volume depth axis, axis 1 height,
  axis 2 width — i.e. plain row-major `volume[..., qx, qy, qz, :]` indexing.
  We implement that directly; no flip gymnastics survive the redesign.

Layout: volumes are feature-last [B, D, H, W, C] (TPU-native; channels on the
128-wide lane dimension).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def grid_sample_trilinear(volume: jax.Array, query: jax.Array) -> jax.Array:
    """volume: [B, D, H, W, C]; query: [B, M, 3] in [0,1] -> [B, M, C]."""
    B, D, H, W, C = volume.shape
    dims = jnp.asarray([D - 1, H - 1, W - 1], volume.dtype)
    q = query.astype(volume.dtype) * dims                 # voxel coords
    q = jnp.clip(q, 0.0, dims)                            # border padding
    lo = jnp.floor(q)
    frac = q - lo
    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, jnp.asarray([D - 1, H - 1, W - 1], jnp.int32))

    flat = volume.reshape(B, D * H * W, C)

    def gather(ix, iy, iz):
        lin = (ix * H + iy) * W + iz                      # [B, M]
        return jnp.take_along_axis(flat, lin[..., None], axis=1)

    fx, fy, fz = frac[..., 0:1], frac[..., 1:2], frac[..., 2:3]
    c000 = gather(lo_i[..., 0], lo_i[..., 1], lo_i[..., 2])
    c001 = gather(lo_i[..., 0], lo_i[..., 1], hi_i[..., 2])
    c010 = gather(lo_i[..., 0], hi_i[..., 1], lo_i[..., 2])
    c011 = gather(lo_i[..., 0], hi_i[..., 1], hi_i[..., 2])
    c100 = gather(hi_i[..., 0], lo_i[..., 1], lo_i[..., 2])
    c101 = gather(hi_i[..., 0], lo_i[..., 1], hi_i[..., 2])
    c110 = gather(hi_i[..., 0], hi_i[..., 1], lo_i[..., 2])
    c111 = gather(hi_i[..., 0], hi_i[..., 1], hi_i[..., 2])

    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def grid_sample_trilinear_np(volume, query):
    """Numpy twin of grid_sample_trilinear for host-side dataset sampling
    (the reference calls torch nocs_grid_sample on CPU in the data loader,
    datasets/conv_implicit_wnf_dataset.py:268-272).

    volume: (D,H,W) or (D,H,W,C); query: (M,3) in [0,1] -> (M,) or (M,C).
    """
    import numpy as np
    squeeze_c = volume.ndim == 3
    if squeeze_c:
        volume = volume[..., None]
    D, H, W, C = volume.shape
    dims = np.asarray([D - 1, H - 1, W - 1], volume.dtype)
    q = np.clip(query.astype(volume.dtype) * dims, 0, dims)
    lo = np.floor(q).astype(np.int64)
    hi = np.minimum(lo + 1, dims.astype(np.int64))
    f = (q - lo).astype(volume.dtype)
    out = np.zeros((len(query), C), volume.dtype)
    for dx, wx in ((0, 1 - f[:, 0]), (1, f[:, 0])):
        ix = lo[:, 0] if dx == 0 else hi[:, 0]
        for dy, wy in ((0, 1 - f[:, 1]), (1, f[:, 1])):
            iy = lo[:, 1] if dy == 0 else hi[:, 1]
            for dz, wz in ((0, 1 - f[:, 2]), (1, f[:, 2])):
                iz = lo[:, 2] if dz == 0 else hi[:, 2]
                out += (wx * wy * wz)[:, None] * volume[ix, iy, iz]
    return out[:, 0] if squeeze_c else out


def nocs_grid_sample(volume, query):
    """Convenience wrapper accepting reference-style shapes.

    volume: (B,D,H,W,C) | (B,D,H,W) | (D,H,W); query: (B,M,3) | (M,3).
    Returns (B,M,C) | (M,C) like the reference nocs_grid_sample.
    """
    squeeze_batch = query.ndim == 2
    if query.ndim == 2:
        query = query[None]
    if volume.ndim == 3:
        volume = volume[None, ..., None]
    elif volume.ndim == 4:
        volume = volume[..., None]
    out = grid_sample_trilinear(volume, query)
    if squeeze_batch:
        out = out[0]
    return out
