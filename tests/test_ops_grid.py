import numpy as np
import jax.numpy as jnp
import pytest

from garmentnets_tpu.ops.grid_sample import grid_sample_trilinear, nocs_grid_sample
from garmentnets_tpu.ops.scatter import scatter_to_grid
from garmentnets_tpu.ops.gaussian import gaussian_gradient_magnitude
from garmentnets_tpu.ops.virtual_grid import VirtualGrid
from garmentnets_tpu.ops.slicer import ArraySlicer


def test_grid_sample_matches_torch_reference_semantics():
    """Oracle: torch F.grid_sample with the reference's zyx flip
    (components/gridding.py:45-98)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    B, C, D, H, W, M = 2, 4, 5, 6, 7, 50
    vol = rng.rand(B, C, D, H, W).astype(np.float32)
    q = rng.rand(B, M, 3).astype(np.float32) * 1.2 - 0.1  # include border

    # reference path (torch): normalize to [-1,1], flip to zyx, grid_sample
    qn = torch.from_numpy(q) * 2.0 - 1.0
    grid = qn.view(B, M, 1, 1, 3).flip(-1)
    ref = F.grid_sample(torch.from_numpy(vol), grid, mode="bilinear",
                        padding_mode="border", align_corners=True)
    ref = ref.view(B, C, M).permute(0, 2, 1).numpy()

    # ours: feature-last volume, query in [0,1], row-major indexing
    vol_fl = np.moveaxis(vol, 1, -1)  # [B,D,H,W,C]
    out = np.asarray(grid_sample_trilinear(
        jnp.asarray(vol_fl), jnp.asarray(q)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_nocs_grid_sample_shapes():
    vol = jnp.asarray(np.random.RandomState(1).rand(4, 4, 4), jnp.float32)
    q = jnp.asarray(np.random.RandomState(2).rand(10, 3), jnp.float32)
    out = nocs_grid_sample(vol, q)
    assert out.shape == (10, 1)


def test_scatter_reduce_modes():
    feat = jnp.asarray(
        [[[1.0, -2.0], [3.0, -4.0], [5.0, -6.0]]])       # [1,3,2]
    idx = jnp.asarray([[0, 0, 2]])
    out_max = np.asarray(scatter_to_grid(feat, idx, 4, "max"))[0]
    np.testing.assert_allclose(out_max[0], [3.0, -2.0])
    np.testing.assert_allclose(out_max[1], [0.0, 0.0])    # empty cell -> 0
    np.testing.assert_allclose(out_max[2], [5.0, -6.0])
    out_mean = np.asarray(scatter_to_grid(feat, idx, 4, "mean"))[0]
    np.testing.assert_allclose(out_mean[0], [2.0, -3.0])
    np.testing.assert_allclose(out_mean[3], [0.0, 0.0])
    out_sum = np.asarray(scatter_to_grid(feat, idx, 4, "sum"))[0]
    np.testing.assert_allclose(out_sum[0], [4.0, -6.0])


def test_scatter_batched_isolation():
    rng = np.random.RandomState(3)
    feat = rng.rand(3, 20, 4).astype(np.float32)
    idx = rng.randint(0, 8, size=(3, 20))
    out = np.asarray(scatter_to_grid(
        jnp.asarray(feat), jnp.asarray(idx), 8, "max"))
    for b in range(3):
        for c in range(8):
            sel = feat[b][idx[b] == c]
            ref = sel.max(0) if len(sel) else np.zeros(4)
            np.testing.assert_allclose(out[b, c], ref, rtol=1e-6)


def test_gaussian_gradient_magnitude_vs_scipy():
    import scipy.ndimage as ni
    rng = np.random.RandomState(4)
    vol = rng.rand(16, 17, 18).astype(np.float32)
    ref = ni.gaussian_gradient_magnitude(vol, sigma=0.5, mode="nearest")
    out = np.asarray(gaussian_gradient_magnitude(jnp.asarray(vol), 0.5))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_virtual_grid_roundtrip_and_reference_math():
    vg = VirtualGrid(grid_shape=(8, 8, 8), batch_size=2)
    pts = np.random.RandomState(5).rand(30, 3).astype(np.float32)
    idxs = vg.get_points_grid_idxs(pts)
    # reference math: floor((p - lc) * (shape-1)/(uc-lc)), clamped
    ref = np.clip((pts * 7).astype(np.int64), 0, 7)
    np.testing.assert_array_equal(idxs, ref)
    # idxs -> points are voxel centers on the [0,1] lattice of size-1 spacing
    back = vg.idxs_to_points(idxs)
    np.testing.assert_allclose(back, idxs / 7.0, rtol=1e-6)
    # flatten/unflatten roundtrip incl batch column
    bidx = np.random.RandomState(6).randint(0, 2, size=30)
    idxs4 = vg.get_points_grid_idxs(pts, batch_idx=bidx)
    flat = vg.flatten_idxs(idxs4)
    assert flat.max() < vg.num_grids
    np.testing.assert_array_equal(vg.unflatten_idxs(flat), idxs4)


def test_virtual_grid_jnp_backend():
    vg = VirtualGrid(grid_shape=(4, 4, 4), batch_size=1)
    pts = jnp.asarray(np.random.RandomState(7).rand(10, 3), jnp.float32)
    idxs = vg.get_points_grid_idxs(pts)
    flat = vg.flatten_idxs(idxs)
    assert int(np.asarray(flat).max()) < 64


def test_array_slicer_covers_grid():
    sl = ArraySlicer((128, 128, 128), (64, 64, 64))
    assert len(sl) == 8
    vol = np.zeros((128, 128, 128))
    for s in sl:
        vol[tuple(s)] += 1
    np.testing.assert_array_equal(vol, 1)
    # ragged tail
    sl2 = ArraySlicer((100, 50), (64, 64))
    vol2 = np.zeros((100, 50))
    for s in sl2:
        vol2[tuple(s)] += 1
    np.testing.assert_array_equal(vol2, 1)
