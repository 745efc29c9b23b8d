"""Device-side isosurface extraction for host marching cubes.

The remote-TPU link is bandwidth- and latency-poor (~30 MB/s d2h with a
~27 ms per-transfer latency floor); shipping full 128^3 WNF volumes to the
host (8.4 MB/garment, plus another 8.4 MB of gradient magnitude) would
dominate end-to-end predict time. Three static-shape extraction formats,
from oldest to the production path:

- extract_active_cubes: per-cube list (cube id + 8 corner values). Simple,
  but compaction over the (S-1)^3 cube grid is the cost.
- extract_active_bricks (PRODUCTION): non-overlapping int8 4^3 bricks in a
  brick-major layout — 64x smaller compaction, contiguous 64-byte row
  gathers, ~0.2 MB/garment paged to the true count. The C++ kernel
  (marching_cubes.marching_cubes_bricks) discovers the straddling cubes
  from the bricks itself.
- extract_crossing_edges: canonical enumeration of the iso-crossing grid
  edges (== MC vertices, 1:1), for on-device warp queries keyed by rank.
  Validated but not wired into the engine (see predict_engine design note:
  TPU stream compaction costs more than the host-vertex upload it saves).

Corner order matches marching_cubes.CUBE_CORNERS.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from garmentnets_tpu.ops.marching_cubes import CUBE_CORNERS


VAL_QUANT_SCALE = 254.0  # int8 mode: (v - level) * 254 in [-127, 127]


def _quantize_vals(vals, level):
    """int8 side-preserving quantization: q >= 1 iff v > level, so the
    host's dequantized inside-test (value > level) reproduces the device's
    float decision exactly — a borderline corner rounding to 0 would
    otherwise flip a cube between the mixed and constant classes. Bias
    error <= one quant step (1/254), the scheme's existing error bound."""
    q = jnp.round((vals - level) * VAL_QUANT_SCALE)
    q = jnp.where(vals > level, jnp.maximum(q, 1.0), jnp.minimum(q, 0.0))
    return jnp.clip(q, -127, 127).astype(jnp.int8)


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
        q = _quantize_vals(vals, level)
        return base, q, counts
    return base, vals.astype(jnp.float16), counts


def dequantize_vals(vals, level: float):
    """Host-side inverse of the int8 quantization (no-op for float vals)."""
    import numpy as np
    vals = np.asarray(vals)
    if vals.dtype == np.int8:
        return vals.astype(np.float32) / VAL_QUANT_SCALE + level
    return vals.astype(np.float32)


def _pack_pages(base, payload_i8, page: int, counts=None):
    """Shared page packer: (base [B,cap] i32, payload [B,cap,K] i8) ->
    tuple of [B, page, 4+K]-uint8 transfer buffers (4 little-endian index
    bytes + K payload bytes per record).

    Page layout exists purely for the device->host link: the host needs only
    ceil(max(counts)/page) pages, so fetching per-page cuts the dominant
    predict transfer from cap-sized to count-sized without putting a
    device-side dynamic slice on the critical path (each page is its own
    XLA output buffer — the host picks which to copy). Byte order is fixed
    by shift arithmetic (not bitcast) so host decode is platform-independent.
    cap must be a multiple of page.

    When `counts` ([B] i32 true record counts, which MAY exceed cap) is
    given, page 0 grows one HEADER row (shape [B, 1+page, 4+K]) whose
    first 4 bytes carry the count little-endian. The host then learns the
    per-garment counts from the page-0 fetch it performs anyway, instead
    of a separate tiny d2h sync that costs a full ~20 ms tunnel round
    trip per batch (measured: the 'counts' stage of
    tools/profile_bench_loop.py)."""
    B, cap = base.shape
    assert cap % page == 0, (cap, page)
    b32 = base.astype(jnp.uint32)
    base_bytes = jnp.stack(
        [(b32 >> (8 * i)).astype(jnp.uint8) for i in range(4)],
        axis=-1)                                           # [B, cap, 4]
    val_bytes = jax.lax.bitcast_convert_type(payload_i8, jnp.uint8)
    packed = jnp.concatenate([base_bytes, val_bytes], axis=-1)
    pages = list(jnp.split(packed, cap // page, axis=1))
    if counts is not None:
        rec = packed.shape[-1]
        c32 = counts.astype(jnp.uint32)
        hdr = jnp.stack(
            [(c32 >> (8 * i)).astype(jnp.uint8) for i in range(4)],
            axis=-1)                                       # [B, 4]
        hdr = jnp.pad(hdr, ((0, 0), (0, rec - 4)))[:, None, :]
        pages[0] = jnp.concatenate([hdr, pages[0]], axis=1)
    return tuple(pages)


def read_page_counts(page0) -> "np.ndarray":
    """Decode the [B] int32 record counts from a header-stamped page 0
    (see _pack_pages(counts=...)). Accepts the device array or its host
    fetch; JAX caches the host copy so re-reading is free."""
    import numpy as np
    h = np.asarray(page0)[:, 0, :4].astype(np.uint32)
    return (h[:, 0] | (h[:, 1] << 8) | (h[:, 2] << 16)
            | (h[:, 3] << 24)).view(np.int32)


def _unpack_pages(pages, header: bool = False):
    """Host inverse of _pack_pages over the fetched page prefix: returns
    (base [B, n*page] int32, payload [B, n*page, K] int8). header=True
    strips the count row _pack_pages(counts=...) prepended to page 0."""
    import numpy as np
    arrs = [np.asarray(p) for p in pages]
    if header and arrs:
        arrs[0] = arrs[0][:, 1:]
    buf = np.concatenate(arrs, axis=1)
    base = (buf[:, :, 0].astype(np.uint32)
            | (buf[:, :, 1].astype(np.uint32) << 8)
            | (buf[:, :, 2].astype(np.uint32) << 16)
            | (buf[:, :, 3].astype(np.uint32) << 24)).view(np.int32)
    return base, buf[:, :, 4:].view(np.int8)


def pack_active_pages(base, vals_q, page: int):
    """Per-cube record pages: [B, page, 12] uint8 (4 base + 8 corner bytes).
    See _pack_pages for the layout rationale."""
    return _pack_pages(base, vals_q, page)


def unpack_active_pages(pages, level: float):
    """Inverse of pack_active_pages; dequantizes the corner values:
    returns (base [B, n*page] int32, vals [B, n*page, 8] float32)."""
    base, payload = _unpack_pages(pages)
    return base, dequantize_vals(payload, level)


# ---------------------------------------------------------------------------
# Brick-level extraction: the predict engine's production path. The volume is
# quantized to int8 once (dense, vectorized) and reshaped into NON-overlapping
# 4^3 "bricks" (64 B each, brick-major layout); the shipped set is the
# support-active blocks (5^3 min/max pooling straddle test, window 5 stride 4
# — exact: a cube straddles iff an adjacent voxel pair in some block's
# support straddles) DILATED by one block in each negative-face direction, so
# every corner of every straddling cube lands in a shipped brick. Compaction
# is a lax.sort over the 32^3 block grid, and the value fetch is a contiguous
# 64-byte row gather from the brick-major tensor — the 5^3 overlapping-window
# scalar gather this replaces was ~39 ms at production shapes; this is ~6 ms.
# Cube discovery moves into the C++ marching-cubes kernel
# (marching_cubes.marching_cubes_bricks), which sees exactly the cube set and
# int8-dequantized corner values of extract_active_cubes(quantize=True).
# ---------------------------------------------------------------------------

BLOCK = 4          # cubes/voxels per brick edge
BRICK_RECORD = 68  # 4 base bytes + 64 int8 values per shipped brick


@functools.partial(jax.jit,
                   static_argnames=("level", "brick_cap", "with_masks"))
def extract_active_bricks(wnf: jax.Array, level: float, brick_cap: int,
                          with_masks: bool = False):
    """wnf: [B, S, S, S] -> (brick_idx [B,brick_cap] i32 flat index into the
    (S/4)^3 block grid (-1 pad), brick_vals [B,brick_cap,64] int8 quantized
    4^3 voxel values in local C-order, counts [B] i32 shipped-brick counts).

    S must be a multiple of BLOCK. counts may exceed brick_cap (host falls
    back to the full-volume path). The shipped set covers the support-active
    blocks and their 7 negative-face neighbors; quantization is
    side-preserving (shared voxels quantize identically -> crack-free).

    with_masks=True appends the per-brick 64-bit cube-STRADDLE mask as 8
    little-endian uint8 bytes (brick_vals becomes [B,brick_cap,72] int8;
    bit loc of the mask = the cube originating at local voxel loc
    straddles the level). The C++ MC kernel then skips its 64-cube
    rejection scan and all-empty support fills
    (extract_isosurface_bricks_masked) — identical cube set by the
    side-preserving quantization guarantee; +8 B/brick on the link."""
    B, S = wnf.shape[0], wnf.shape[1]
    assert S % BLOCK == 0, S
    nb = S // BLOCK
    # support-activity: 5^3 min/max pooling, window 5 stride 4 (high-edge
    # pad 1 covers the last block's truncated support)
    dims = (1, 5, 5, 5)
    strides = (1, BLOCK, BLOCK, BLOCK)
    pad = ((0, 0), (0, 1), (0, 1), (0, 1))
    bmax = jax.lax.reduce_window(wnf, -jnp.inf, jax.lax.max, dims, strides,
                                 pad)
    bmin = jax.lax.reduce_window(wnf, jnp.inf, jax.lax.min, dims, strides,
                                 pad)
    active = jnp.logical_and(bmin <= level, bmax > level)    # [B,nb,nb,nb]
    # ship-set: brick b is shipped iff some block a in b - {0,1}^3 is active
    # (i.e. b holds corner values of cubes originating in a)
    shipped = jax.lax.reduce_window(
        active, False, jax.lax.bitwise_or, (1, 2, 2, 2), (1, 1, 1, 1),
        ((0, 0), (1, 0), (1, 0), (1, 0)))
    flat = shipped.reshape(B, nb ** 3)
    counts = flat.sum(axis=1).astype(jnp.int32)

    # compaction: ascending sort of (shipped ? idx : 2^30) — measured ~2x
    # faster than the searchsorted-over-cumsum formulation at this size
    cap = min(brick_cap, nb ** 3)    # a small grid can't fill a big cap
    idx = jnp.arange(nb ** 3, dtype=jnp.int32)
    keys = jnp.where(flat, idx[None, :], jnp.int32(2 ** 30))
    brick_idx = jax.lax.sort(keys, dimension=1)[:, :cap]
    valid = jnp.arange(1, cap + 1,
                       dtype=jnp.int32)[None, :] <= counts[:, None]

    # brick-major int8 layout + contiguous row gather
    q = _quantize_vals(wnf, level)                           # [B,S,S,S] i8
    bricks = q.reshape(B, nb, BLOCK, nb, BLOCK, nb, BLOCK)
    bricks = bricks.transpose(0, 1, 3, 5, 2, 4, 6).reshape(B, nb ** 3, 64)
    if with_masks:
        # per-cube straddle over the forward 2^3 corner window, VALID
        # windows only (high-edge voxels are not cube origins — padding
        # into the AND-reduce would instead IGNORE the missing corners and
        # mark mixed partial windows as straddling), then pad False
        inside = wnf > level
        dims2, str1 = (1, 2, 2, 2), (1, 1, 1, 1)
        nopad = ((0, 0),) * 4
        any_in = jax.lax.reduce_window(inside, False, jax.lax.bitwise_or,
                                       dims2, str1, nopad)
        all_in = jax.lax.reduce_window(inside, True, jax.lax.bitwise_and,
                                       dims2, str1, nopad)
        straddle = jnp.pad(
            jnp.logical_and(any_in, jnp.logical_not(all_in)),
            ((0, 0), (0, 1), (0, 1), (0, 1)))
        sb = straddle.reshape(B, nb, BLOCK, nb, BLOCK, nb, BLOCK)
        sb = sb.transpose(0, 1, 3, 5, 2, 4, 6).reshape(B, nb ** 3, 8, 8)
        weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
        mask_bytes = (sb.astype(jnp.uint8) * weights).sum(
            axis=-1, dtype=jnp.uint8)                    # [B, nb^3, 8]
        bricks = jnp.concatenate(
            [bricks, jax.lax.bitcast_convert_type(mask_bytes, jnp.int8)],
            axis=-1)                                     # [B, nb^3, 72]
    safe_idx = jnp.where(valid, brick_idx, 0)
    vals = jnp.take_along_axis(bricks, safe_idx[..., None], axis=1)
    brick_idx = jnp.where(valid, brick_idx, -1)
    if cap < brick_cap:
        pad = brick_cap - cap
        brick_idx = jnp.pad(brick_idx, ((0, 0), (0, pad)),
                            constant_values=-1)
        vals = jnp.pad(vals, ((0, 0), (0, pad), (0, 0)))
    return brick_idx, vals, counts


def bricks_to_cube_list(brick_idx, brick_vals_q, level: float,
                        volume_size: int):
    """Host-side brick -> active-cube-list expansion for one garment (the
    numpy mirror of the C++ kernel's cube discovery; used as the no-g++
    fallback and as the test oracle).

    brick_idx [n] int32 block-grid indices, brick_vals_q [n,64] int8 ->
    (cube_base [m] i64 flat VOXEL index of each cube origin, cube_vals
    [m,8] f32) matching extract_active_cubes on the dequantized field."""
    import numpy as np
    S = volume_size
    nb = S // BLOCK
    brick_idx = np.asarray(brick_idx)
    keep = brick_idx >= 0
    brick_idx = brick_idx[keep].astype(np.int64)
    vals_q = np.asarray(brick_vals_q)[keep]
    if len(brick_idx) == 0:
        return (np.zeros((0,), np.int64), np.zeros((0, 8), np.float32))
    # dense row map over the block grid
    row_of = np.full(nb ** 3, -1, np.int64)
    row_of[brick_idx] = np.arange(len(brick_idx))
    # global voxel coords of every local voxel of every shipped brick
    bz = brick_idx % nb
    by = (brick_idx // nb) % nb
    bx = brick_idx // (nb * nb)
    loc = np.arange(BLOCK)
    lx, ly, lz = np.meshgrid(loc, loc, loc, indexing="ij")
    gx = bx[:, None] * BLOCK + lx.reshape(-1)[None, :]     # [n, 64]
    gy = by[:, None] * BLOCK + ly.reshape(-1)[None, :]
    gz = bz[:, None] * BLOCK + lz.reshape(-1)[None, :]
    # candidate cube origins (exclude the high grid edge)
    cand = ((gx <= S - 2) & (gy <= S - 2) & (gz <= S - 2)).reshape(-1)
    cgx, cgy, cgz = (a.reshape(-1)[cand] for a in (gx, gy, gz))
    # 8 corner values via brick/row lookup; missing brick -> cube skipped
    off = np.asarray(CUBE_CORNERS)
    cx = cgx[:, None] + off[None, :, 0]
    cy = cgy[:, None] + off[None, :, 1]
    cz = cgz[:, None] + off[None, :, 2]
    nbrick = row_of[((cx // BLOCK) * nb + (cy // BLOCK)) * nb
                    + (cz // BLOCK)]                       # [m, 8]
    ok = (nbrick >= 0).all(axis=1)
    local = ((cx % BLOCK) * BLOCK + (cy % BLOCK)) * BLOCK + (cz % BLOCK)
    qv = np.zeros((len(cgx), 8), np.int8)
    qv[ok] = vals_q[nbrick[ok], local[ok]]
    cube_vals = dequantize_vals(qv, level)
    inside = cube_vals > level
    active = ok & inside.any(axis=1) & ~inside.all(axis=1)
    base = (cgx.astype(np.int64) * S + cgy) * S + cgz
    return base[active], cube_vals[active]


# ---------------------------------------------------------------------------
# Crossing-edge enumeration: the marching-cubes VERTICES are exactly the
# grid edges whose endpoints straddle the iso level, and the device already
# knows them — so the surface-decoder (warp-field) query can run on device
# inside the encode program, keyed by a canonical edge order both sides can
# reproduce, instead of round-tripping host MC vertices through the slow
# link. Canonical order: (shipped-brick rank, slot) with slot =
# dir * 64 + local voxel id of the edge ORIGIN (the smaller endpoint); every
# edge is owned by exactly one brick (the one containing its origin), and
# every crossing edge's owner brick is shipped (its containing cube's origin
# block is support-active). The host (C++ kernel / numpy mirror) recomputes
# the same order from the dequantized bricks — side-preserving quantization
# makes the crossing set identical — and indexes the device's results by
# rank.
# ---------------------------------------------------------------------------

EDGE_SLOTS = 192   # 3 directions x 64 local origins per brick


@functools.partial(jax.jit, static_argnames=("level", "edge_cap"))
def extract_crossing_edges(wnf: jax.Array, level: float,
                           brick_idx: jax.Array, edge_cap: int):
    """Enumerates crossing grid edges of the shipped bricks in canonical
    (brick rank, slot) order.

    wnf: [B, S, S, S]; brick_idx: [B, brick_cap] from extract_active_bricks
    (-1 pad). Returns (edge_counts [B] i32, vert_pos [B, edge_cap, 3] f32 —
    the iso-crossing point of each edge in NORMALIZED [0,1] lattice
    coordinates (grid_index / (S-1)), zero-padded). counts may exceed
    edge_cap (caller falls back to a host-vertex warp query)."""
    B, S = wnf.shape[0], wnf.shape[1]
    nb = S // BLOCK
    cap = brick_idx.shape[1]
    inside = wnf > level

    def shifted_xor(axis):
        # crossing flag of the edge originating at each voxel along `axis`;
        # the last slice has no outgoing edge (origin must be <= S-2)
        a = inside
        b = jnp.roll(inside, -1, axis=axis + 1)
        x = jnp.logical_xor(a, b)
        idx = [slice(None)] * 4
        idx[axis + 1] = S - 1
        return x.at[tuple(idx)].set(False)

    # brick-major layout of the 3 crossing-flag volumes -> [B, nb^3, 192]
    flags = []
    for axis in range(3):
        f = shifted_xor(axis)
        f = f.reshape(B, nb, BLOCK, nb, BLOCK, nb, BLOCK)
        f = f.transpose(0, 1, 3, 5, 2, 4, 6).reshape(B, nb ** 3, 64)
        flags.append(f)
    cross = jnp.concatenate(flags, axis=-1)          # [B, nb^3, 192]

    valid_brick = brick_idx >= 0
    rows = jnp.take_along_axis(
        cross, jnp.maximum(brick_idx, 0)[..., None], axis=1)  # [B,cap,192]
    rows = jnp.logical_and(rows, valid_brick[..., None])

    # compaction: flat searchsorted over the cumsative crossing count in
    # (brick rank, slot) order — the rank of each crossing edge IS its
    # output index (the canonical order the host reproduces)
    flat = rows.reshape(B, cap * EDGE_SLOTS)
    csum = jnp.cumsum(flat.astype(jnp.int32), axis=1)         # inclusive
    counts = csum[:, -1]
    targets = jnp.arange(1, edge_cap + 1, dtype=jnp.int32)    # rank j+1
    pos = jax.vmap(lambda row: jnp.searchsorted(row, targets))(csum)
    pos = jnp.minimum(pos, cap * EDGE_SLOTS - 1).astype(jnp.int32)
    br = pos // EDGE_SLOTS
    slot = pos % EDGE_SLOTS

    picked_brick = jnp.take_along_axis(
        jnp.maximum(brick_idx, 0), br, axis=1)                # block idx
    d = slot // 64
    loc = slot % 64
    bx = (picked_brick // (nb * nb)) * BLOCK + (loc >> 4)
    by = ((picked_brick // nb) % nb) * BLOCK + ((loc >> 2) & 3)
    bz = (picked_brick % nb) * BLOCK + (loc & 3)
    o_flat = (bx * S + by) * S + bz
    step = jnp.where(d == 0, S * S, jnp.where(d == 1, S, 1))
    wnf_flat = wnf.reshape(B, -1)
    va = jnp.take_along_axis(wnf_flat, o_flat, axis=1)
    vb = jnp.take_along_axis(wnf_flat, o_flat + step, axis=1)
    denom = jnp.where(vb != va, vb - va, 1.0)
    t = jnp.clip((level - va) / denom, 0.0, 1.0)
    base = jnp.stack([bx, by, bz], axis=-1).astype(jnp.float32)
    offs = jnp.stack([(d == 0).astype(jnp.float32),
                      (d == 1).astype(jnp.float32),
                      (d == 2).astype(jnp.float32)], axis=-1)
    vert = (base + t[..., None] * offs) / (S - 1)
    valid = targets[None, :] <= counts[:, None]
    vert = jnp.where(valid[..., None], vert, 0.0)
    return counts, vert


def crossing_edge_mask_np(brick_idx, brick_vals_q, level: float,
                          volume_size: int):
    """Numpy mirror of the canonical crossing-edge enumeration for ONE
    garment: returns a [n_bricks, 192] bool mask in (brick rank, slot)
    order — the rank of a True entry (in C-order flatten) is the device's
    edge index. Used by the no-g++ fallback and as the test oracle of the
    C++ kernel's rank computation."""
    import numpy as np
    S = volume_size
    nb = S // BLOCK
    brick_idx = np.asarray(brick_idx)
    keep = brick_idx >= 0
    bidx = brick_idx[keep].astype(np.int64)
    vals = np.asarray(brick_vals_q)[keep]
    n = len(bidx)
    mask = np.zeros((len(brick_idx), EDGE_SLOTS), bool)
    if n == 0:
        return mask
    row_of = np.full(nb ** 3, -1, np.int64)
    row_of[bidx] = np.arange(n)
    inside = vals >= 1                      # side-preserving: q>=1 <=> v>level
    bz = bidx % nb
    by = (bidx // nb) % nb
    bx = bidx // (nb * nb)
    loc = np.arange(BLOCK)
    lx, ly, lz = np.meshgrid(loc, loc, loc, indexing="ij")
    lx, ly, lz = (a.reshape(-1) for a in (lx, ly, lz))
    gx = bx[:, None] * BLOCK + lx[None, :]
    gy = by[:, None] * BLOCK + ly[None, :]
    gz = bz[:, None] * BLOCK + lz[None, :]
    for d, (dx, dy, dz) in enumerate(((1, 0, 0), (0, 1, 0), (0, 0, 1))):
        ex, ey, ez = gx + dx, gy + dy, gz + dz
        ok = (ex <= S - 1) & (ey <= S - 1) & (ez <= S - 1)
        nbrick = row_of[np.clip(((ex // BLOCK) * nb + (ey // BLOCK)) * nb
                                + (ez // BLOCK), 0, nb ** 3 - 1)]
        ok &= nbrick >= 0
        # endpoint side; a crossing edge's endpoint brick is always shipped
        # (it is a corner brick of the edge's crossing cube), so ok=False
        # rows can only be non-crossing — same set as the device's XOR
        other = np.zeros_like(inside, dtype=bool)
        li = ((ex % BLOCK) * BLOCK + (ey % BLOCK)) * BLOCK + (ez % BLOCK)
        other[ok] = inside[nbrick[ok], li[ok]]
        # local origins are enumerated in C-order, so `inside` columns are
        # already in slot order
        crossing = ok & (inside != other)
        mask[np.flatnonzero(keep), d * 64:(d + 1) * 64] = crossing
    return mask


def pack_brick_pages(base, vals_q, page: int, counts=None):
    """Brick record pages (PRODUCTION path): [B, page, 68] uint8 (4 index +
    64 quantized voxel bytes). With `counts`, page 0 gains a header row
    carrying the true shipped-brick counts (see _pack_pages) so the host
    skips the separate active_counts d2h sync. See _pack_pages for the
    layout rationale."""
    return _pack_pages(base, vals_q, page, counts=counts)


def unpack_brick_pages(pages, header: bool = False):
    """Host inverse of pack_brick_pages over the fetched page prefix:
    (brick_idx [B, n*page] int32, payload [B, n*page, 64 or 72] int8 —
    72 when the extraction ran with_masks=True; split_brick_payload
    separates values from the straddle-mask bytes).
    header=True strips the page-0 count row."""
    return _unpack_pages(pages, header=header)


def split_brick_payload(payload):
    """(vals_q [.., 64] int8, cube_masks [.., 8] uint8 or None) from a
    brick page payload (see extract_active_bricks with_masks)."""
    import numpy as np
    if payload.shape[-1] == 64:
        return payload, None
    assert payload.shape[-1] == 72, payload.shape
    return payload[..., :64], payload[..., 64:].view(np.uint8)
