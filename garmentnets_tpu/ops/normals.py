"""Device-side MC vertex normals (skimage gradient semantics) with
octahedral u8 packing.

The host C++ MC kernel's per-vertex normals (lerp of central-difference
gradients at the edge endpoints, normalized, sign by gradient_direction —
ops/cpp/marching.cpp edge_vertex*) cost ~20 ms/garment at 256^3 — ~28% of
the kernel (measured 2026-08-20: 72.2 vs 52.0 ms median with/without).
Since MC vertices lie ON lattice edges, trilinear interpolation of the
per-voxel gradient field at the vertex reduces exactly to that endpoint
lerp — so the WARP device program (which already receives every MC vertex
for the warp-field query) can emit the same normals from the full-precision
WNF volume, and the host kernel runs with return_normals=False.

Wire format: normals are storage-only downstream (reference predict.py:195
writes them; nothing in eval.py reads them), so they ship OCTAHEDRAL
u8-pair encoded — packed into ONE extra f16 lane of the combined warp
result buffer (+2 bytes/vertex instead of +6 for f16 xyz on a ~30 MB/s
link). 16-bit octahedral quantization has ~0.5 deg mean / ~1 deg max
angular error; GARMENTNETS_DEVICE_NORMALS=0 selects the exact host path.

Known deviations from the host kernel (both far below storage use):
- full-precision field vs the host's int8-dequantized bricks;
- interior voxels whose neighbor brick was not shipped: the host falls
  back to a one-sided difference there, the device always has the field.
Volume borders match (one-sided, np.gradient semantics).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def dense_gradient(wnf: jax.Array) -> jax.Array:
    """np.gradient semantics per axis (interior central, border one-sided),
    unit spacing: wnf [B,S,S,S] -> [B,S,S,S,3]. The isotropic 1/(S-1)
    spacing divides out under normalization, so it is skipped."""
    comps = []
    for axis in range(1, 4):
        up = jnp.roll(wnf, -1, axis=axis)
        dn = jnp.roll(wnf, 1, axis=axis)
        g = 0.5 * (up - dn)
        # one-sided at the two borders
        idx_lo = [slice(None)] * 4
        idx_lo[axis] = slice(0, 1)
        idx_hi = [slice(None)] * 4
        idx_hi[axis] = slice(-1, None)
        lo = (jnp.take(wnf, jnp.asarray([1]), axis=axis)
              - jnp.take(wnf, jnp.asarray([0]), axis=axis))
        hi = (jnp.take(wnf, jnp.asarray([wnf.shape[axis] - 1]), axis=axis)
              - jnp.take(wnf, jnp.asarray([wnf.shape[axis] - 2]),
                         axis=axis))
        g = g.at[tuple(idx_lo)].set(lo)
        g = g.at[tuple(idx_hi)].set(hi)
        comps.append(g)
    return jnp.stack(comps, axis=-1)


def sample_gradient_normals_oct(wnf: jax.Array, query_points: jax.Array,
                                ascent: bool) -> jax.Array:
    """Trilinearly sample the gradient of wnf at normalized [0,1] lattice
    query points, normalize (sign: outward = -grad under 'ascent'), and
    return the octahedral-u8-pair encoding bitcast into ONE f16 channel.

    wnf [B,S,S,S], query_points [B,V,3] -> [B,V,1] f16 (bit pattern).

    Implementation note (measured 2026-08-20): this materializes the dense
    [B,S,S,S,3] gradient field inside the jit (transient; ~400 MB/garment
    at 256^3) and gathers 8 corner rows per vertex. An O(V)-memory
    alternative that gathers the 6 neighbors of each corner instead (48
    scalar gathers/vertex) was built and REJECTED: paired A/B at 256^3
    read 0.651 vs the dense form's 0.965 against host normals — scattered
    scalar gathers lose badly to vectorized dense ops + row gathers on
    TPU. The transient HBM peak is the price of the faster form; the knob
    is opt-in either way (host normals remain the default)."""
    B, S = wnf.shape[0], wnf.shape[1]
    grad = dense_gradient(wnf)                       # [B,S,S,S,3]
    c = query_points.astype(jnp.float32) * (S - 1)
    i0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, S - 2)
    f = jnp.clip(c - i0.astype(jnp.float32), 0.0, 1.0)   # [B,V,3]
    gf = grad.reshape(B, S * S * S, 3)
    base = (i0[..., 0] * S + i0[..., 1]) * S + i0[..., 2]   # [B,V]
    acc = jnp.zeros(query_points.shape[:2] + (3,), jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                idx = base + (dx * S + dy) * S + dz
                w = ((f[..., 0] if dx else 1 - f[..., 0])
                     * (f[..., 1] if dy else 1 - f[..., 1])
                     * (f[..., 2] if dz else 1 - f[..., 2]))
                g8 = jnp.take_along_axis(gf, idx[..., None], axis=1)
                acc = acc + w[..., None] * g8
    sign = -1.0 if ascent else 1.0
    n = sign * acc
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return oct_encode_f16(n)


def oct_encode_f16(n: jax.Array) -> jax.Array:
    """Unit vectors [..., 3] -> octahedral u8 pair bitcast to f16 [..., 1]."""
    ax = jnp.sum(jnp.abs(n), axis=-1, keepdims=True)
    p = n[..., :2] / jnp.maximum(ax, 1e-12)
    # lower hemisphere: fold across the diagonal
    fold = (1.0 - jnp.abs(p[..., ::-1])) * jnp.where(p >= 0, 1.0, -1.0)
    p = jnp.where(n[..., 2:3] < 0, fold, p)
    q = jnp.clip(jnp.round((p * 0.5 + 0.5) * 255.0), 0, 255).astype(
        jnp.uint8)
    u16 = q[..., 0].astype(jnp.uint16) | (q[..., 1].astype(jnp.uint16) << 8)
    return jax.lax.bitcast_convert_type(u16, jnp.float16)[..., None]


def oct_decode_np(col_f16: np.ndarray) -> np.ndarray:
    """Host inverse of oct_encode_f16: f16 bit-pattern column [...] ->
    unit vectors [..., 3] float32."""
    u16 = np.asarray(col_f16, np.float16).view(np.uint16)
    u = (u16 & 0xFF).astype(np.float32) / 255.0 * 2.0 - 1.0
    v = (u16 >> 8).astype(np.float32) / 255.0 * 2.0 - 1.0
    z = 1.0 - np.abs(u) - np.abs(v)
    # fold back the lower hemisphere
    t = np.clip(-z, 0.0, None)
    x = u + np.where(u >= 0, -t, t)
    y = v + np.where(v >= 0, -t, t)
    n = np.stack([x, y, z], axis=-1)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return n.astype(np.float32)
