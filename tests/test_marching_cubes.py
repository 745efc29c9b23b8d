import numpy as np
import pytest

from garmentnets_tpu.ops.marching_cubes import (
    marching_cubes, delete_invalid_verts, _mc_numpy, _load_lib)


def _sphere_volume(n=32, r=0.3):
    ax = np.linspace(0, 1, n)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return (r - np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
            ).astype(np.float32)


def test_sphere_isosurface_accuracy():
    n = 32
    vol = _sphere_volume(n)
    spacing = (1 / (n - 1),) * 3
    verts, faces, normals, values = marching_cubes(
        vol, 0.0, spacing=spacing, gradient_direction="ascent")
    assert len(verts) > 200 and len(faces) > 200
    d = np.linalg.norm(verts - 0.5, axis=1)
    # all surface verts within a voxel of the true sphere radius
    assert np.abs(d - 0.3).max() < 1.5 / (n - 1)
    assert faces.max() < len(verts)
    # normals are unit and roughly radial (outward for ascent of r - |x|
    # means -gradient = radial outward... just check unit + consistency)
    np.testing.assert_allclose(
        np.linalg.norm(normals, axis=1), 1.0, atol=1e-4)
    radial = (verts - 0.5) / d[:, None]
    align = np.abs(np.sum(normals * radial, axis=1))
    assert np.median(align) > 0.9


def test_native_and_numpy_agree():
    if _load_lib() is None:
        pytest.skip("native lib unavailable")
    vol = _sphere_volume(16)
    sp = (1 / 15,) * 3
    v1, f1 = __import__(
        "garmentnets_tpu.ops.marching_cubes",
        fromlist=["_mc_native"])._mc_native(vol, 0.0, sp, True)
    v2, f2 = _mc_numpy(vol, 0.0, sp, True)
    assert len(v1) == len(v2)
    assert len(f1) == len(f2)
    # same welded vertex sets (ordering may differ)
    s1 = set(map(tuple, np.round(v1, 5)))
    s2 = set(map(tuple, np.round(v2, 5)))
    assert s1 == s2


def test_level_out_of_range_raises():
    vol = _sphere_volume(8)
    with pytest.raises(ValueError):
        marching_cubes(vol, 99.0)


def test_delete_invalid_verts():
    verts = np.arange(15, dtype=np.float32).reshape(5, 3)
    faces = np.array([[0, 1, 2], [1, 2, 3], [2, 3, 4]])
    on_surface = np.array([True, True, True, False, True])
    v2, f2 = delete_invalid_verts(verts, faces, on_surface)
    assert len(f2) == 1
    np.testing.assert_array_equal(v2[f2[0]], verts[[0, 1, 2]])
