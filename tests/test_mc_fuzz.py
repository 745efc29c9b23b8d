"""Property-based fuzzing of the marching-cubes stack (hypothesis).

Random small volumes probe invariants the example-based tests can't sweep:
- mesh sanity: faces index real verts, verts inside the volume bounds,
  per-vertex values >= the iso level (edge-endpoint max semantics);
- interior cracks: every interior edge is used by an even number of faces
  (volume-border edges may legitimately be open);
- brick path == dense path: the int8 brick pipeline (device wire format ->
  C++ kernel) produces the same welded vertex set as dense marching cubes
  over the dequantized field.
"""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from garmentnets_tpu.ops.marching_cubes import marching_cubes


def _volumes(min_n=4, max_n=8):
    return st.tuples(
        st.integers(min_n, max_n),
        st.integers(0, 2 ** 31 - 1),
        st.booleans(),
    )


@settings(max_examples=25, deadline=None)
@given(_volumes())
def test_dense_mc_invariants(args):
    n, seed, smooth = args
    rng = np.random.RandomState(seed)
    vol = rng.rand(n, n, n).astype(np.float32)
    if smooth:
        # smooth fields exercise the non-ambiguous fast paths
        from scipy.ndimage import gaussian_filter
        vol = gaussian_filter(vol, 1.0).astype(np.float32)
    level = float(np.median(vol))
    if not (vol.min() < level < vol.max()):
        return
    try:
        verts, faces, normals, values = marching_cubes(
            vol, level, spacing=(1.0, 1.0, 1.0))
    except ValueError:
        return  # no crossing after the median-level guard: legal
    assert len(verts) > 0
    assert faces.min() >= 0 and faces.max() < len(verts)
    assert (verts >= 0).all() and (verts <= n - 1 + 1e-5).all()
    assert np.isfinite(verts).all() and np.isfinite(values).all()
    # per-vertex value = max of the crossing edge's endpoints >= level
    assert (values >= level - 1e-6).all()
    # interior crack-freeness: odd-count edges only at the volume border
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e.sort(axis=1)
    key = e[:, 0].astype(np.int64) * (1 << 32) + e[:, 1]
    uniq, counts = np.unique(key, return_counts=True)
    for k in uniq[counts % 2 == 1]:
        a, b = int(k) >> 32, int(k) & 0xFFFFFFFF
        for p in (verts[a], verts[b]):
            assert np.isclose(p, 0).any() or np.isclose(p, n - 1).any(), (
                "crack: odd-count edge off the volume border")


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2 ** 31 - 1))
def test_brick_path_matches_dense(seed):
    jnp = pytest.importorskip("jax.numpy")
    from garmentnets_tpu.ops.isosurface import (
        extract_active_bricks, pack_brick_pages, unpack_brick_pages,
        dequantize_vals, _quantize_vals)
    from garmentnets_tpu.ops.marching_cubes import marching_cubes_bricks

    S, level = 8, 0.5
    rng = np.random.RandomState(seed)
    from scipy.ndimage import gaussian_filter
    vol = gaussian_filter(rng.rand(S, S, S), 0.8).astype(np.float32)
    vol = (vol - vol.min()) / max(vol.max() - vol.min(), 1e-6)
    base, vals, counts = extract_active_bricks(
        jnp.asarray(vol[None]), level, 64)
    n = int(np.asarray(counts)[0])
    if n == 0 or n > 64:
        return
    bi, bv = unpack_brick_pages(pack_brick_pages(base, vals, 64))
    spacing = (1.0 / (S - 1),) * 3
    try:
        v_b, f_b, val_b = marching_cubes_bricks(
            np.asarray(bi[0, :n]), np.asarray(bv[0, :n]), (S, S, S),
            level, spacing, return_values=True)
    except ValueError:
        v_b = np.zeros((0, 3), np.float32)
    # dense MC over the DEQUANTIZED field (what the bricks carry)
    q = np.asarray(_quantize_vals(jnp.asarray(vol), level))
    deq = dequantize_vals(q, level)
    try:
        v_d, f_d, _, val_d = marching_cubes(deq, level, spacing=spacing)
    except ValueError:
        v_d = np.zeros((0, 3), np.float32)
    s_b = set(map(tuple, np.round(v_b, 5)))
    s_d = set(map(tuple, np.round(v_d, 5)))
    assert s_b == s_d
    if len(v_b):
        # welded values agree as (position, value) MULTISETS: when a corner
        # equals the level exactly (quantized fields make that common),
        # several edges interpolate to the same node position with
        # different endpoint maxes, and cube iteration order differs
        # between the pipelines — so a position-keyed dict would compare
        # insertion order, not content
        from collections import Counter
        c_b = Counter((t, round(float(x), 4))
                      for t, x in zip(map(tuple, np.round(v_b, 5)), val_b))
        c_d = Counter((t, round(float(x), 4))
                      for t, x in zip(map(tuple, np.round(v_d, 5)), val_d))
        assert c_b == c_d


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2 ** 31 - 1))
def test_masked_brick_path_matches_scan(seed):
    """Fuzz the device straddle-mask wire format (with_masks=True) against
    the scan path: identical bricks, counts, and bit-identical meshes on
    random smoothed fields."""
    jnp = pytest.importorskip("jax.numpy")
    from garmentnets_tpu.ops.isosurface import (
        extract_active_bricks, split_brick_payload)
    from garmentnets_tpu.ops.marching_cubes import marching_cubes_bricks

    S, level = 8, 0.5
    rng = np.random.RandomState(seed)
    from scipy.ndimage import gaussian_filter
    vol = gaussian_filter(rng.rand(S, S, S), 0.8).astype(np.float32)
    vol = (vol - vol.min()) / max(vol.max() - vol.min(), 1e-6)
    b0, v0, c0 = extract_active_bricks(jnp.asarray(vol[None]), level, 64)
    b1, v1, c1 = extract_active_bricks(jnp.asarray(vol[None]), level, 64,
                                       with_masks=True)
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    n = int(np.asarray(c0)[0])
    if n == 0 or n > 64:
        return
    vals, masks = split_brick_payload(np.asarray(v1)[0, :n])
    np.testing.assert_array_equal(vals, np.asarray(v0)[0, :n])
    spacing = (1.0 / (S - 1),) * 3
    kw = dict(return_values=True, return_normals=True)
    try:
        plain = marching_cubes_bricks(
            np.asarray(b0)[0, :n], np.asarray(v0)[0, :n], (S, S, S),
            level, spacing, **kw)
    except ValueError:
        plain = None
    try:
        masked = marching_cubes_bricks(
            np.asarray(b0)[0, :n], vals, (S, S, S), level, spacing,
            cube_masks=masks, **kw)
    except ValueError:
        masked = None
    assert (plain is None) == (masked is None)
    if plain is not None:
        for a, b in zip(plain, masked):
            np.testing.assert_array_equal(a, b)
