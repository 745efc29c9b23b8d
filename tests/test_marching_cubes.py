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


def test_native_and_numpy_agree_tetrahedra():
    if _load_lib() is None:
        pytest.skip("native lib unavailable")
    vol = _sphere_volume(16)
    sp = (1 / 15,) * 3
    from garmentnets_tpu.ops.marching_cubes import _mc_native
    v1, f1, _ = _mc_native(vol, 0.0, sp, True, method="tetrahedra")
    v2, f2, _ = _mc_numpy(vol, 0.0, sp, True)
    assert len(v1) == len(v2)
    assert len(f1) == len(f2)
    # same welded vertex sets (ordering may differ)
    s1 = set(map(tuple, np.round(v1, 5)))
    s2 = set(map(tuple, np.round(v2, 5)))
    assert s1 == s2


def test_native_and_python_agree_cubes():
    if _load_lib() is None:
        pytest.skip("native lib unavailable")
    from garmentnets_tpu.ops.marching_cubes import (
        _mc_native, _mc_python_cubes)
    rng = np.random.RandomState(0)
    for vol in (_sphere_volume(16),
                rng.rand(9, 10, 11).astype(np.float32) - 0.5):
        sp = (0.1, 0.11, 0.12)
        v1, f1, val1 = _mc_native(vol, 0.0, sp, True, method="cubes")
        v2, f2, val2 = _mc_python_cubes(vol, 0.0, sp, True)
        assert len(v1) == len(v2) and len(f1) == len(f2)
        # per-vertex values agree between native and python (same welded
        # vertex set; compare as position->value maps since order differs)
        m1 = {t: round(float(x), 5)
              for t, x in zip(map(tuple, np.round(v1, 5)), val1)}
        m2 = {t: round(float(x), 5)
              for t, x in zip(map(tuple, np.round(v2, 5)), val2)}
        assert m1 == m2
        assert (val1 >= 0.0).all()  # edge max is >= level for crossings
        s1 = set(map(tuple, np.round(v1, 5)))
        s2 = set(map(tuple, np.round(v2, 5)))
        assert s1 == s2


def _edge_use_counts(faces):
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e.sort(axis=1)
    key = e[:, 0].astype(np.int64) * (1 << 32) + e[:, 1]
    _, counts = np.unique(key, return_counts=True)
    return counts


def test_cubes_method_watertight_and_lean():
    """The default method must be crack-free (every edge on an even number
    of faces; exactly 2 for a smooth closed surface) with Lewiner-like
    vertex density (~3x fewer verts than tetrahedra)."""
    vol = _sphere_volume(32)
    sp = (1 / 31,) * 3
    vc, fc, _, _ = marching_cubes(vol, 0.0, spacing=sp, method="cubes")
    vt, ft, _, _ = marching_cubes(vol, 0.0, spacing=sp, method="tetrahedra")
    assert len(vc) * 2 < len(vt)
    assert set(_edge_use_counts(fc)) == {2}          # closed 2-manifold
    # noisy field: no odd-count edges anywhere (no cracks; even-count fins
    # from rare ambiguous configurations are allowed)
    rng = np.random.RandomState(1)
    noisy = rng.rand(10, 10, 10).astype(np.float32) - 0.5
    v, f, _, _ = marching_cubes(noisy, 0.0, spacing=(1, 1, 1))
    counts = _edge_use_counts(f)
    boundary = np.asarray([0.0, 9.0])
    # interior edges must be even-count; volume-border edges may be open
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    e.sort(axis=1)
    key = e[:, 0].astype(np.int64) * (1 << 32) + e[:, 1]
    uniq, counts = np.unique(key, return_counts=True)
    odd = uniq[counts % 2 == 1]
    for k in odd:
        a, b = int(k) >> 32, int(k) & 0xFFFFFFFF
        for p in (v[a], v[b]):
            assert (np.isclose(p, 0).any() or np.isclose(p, 9).any()), (
                "crack: odd-count edge off the volume border")


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


def test_brick_gradient_normals():
    """Brick-path volume-gradient normals (VERDICT r2 #7): unit length,
    radial on a sphere field (outward under 'ascent' of inside-positive),
    and the C++ kernel agrees with the pure-Python mirror."""
    jnp = pytest.importorskip("jax.numpy")
    from garmentnets_tpu.ops.isosurface import (
        extract_active_bricks, pack_brick_pages, unpack_brick_pages)
    from garmentnets_tpu.ops.marching_cubes import marching_cubes_bricks
    import garmentnets_tpu.ops.marching_cubes as mcmod
    n = 32
    vol = _sphere_volume(n) + 0.5          # iso at 0.5, inside > 0.5
    spacing = (1 / (n - 1),) * 3
    base, vals, counts = extract_active_bricks(
        jnp.asarray(vol[None]), 0.5, 512)
    k = int(np.asarray(counts)[0])
    assert 0 < k <= 512
    bi_p, bv_p = unpack_brick_pages(pack_brick_pages(base, vals, 512))
    bi = np.asarray(bi_p[0, :k])
    bv = np.asarray(bv_p[0, :k])
    verts, faces, values, normals = marching_cubes_bricks(
        bi, bv, (n, n, n), 0.5, spacing, gradient_direction="ascent",
        return_values=True, return_normals=True)
    assert normals.shape == (len(verts), 3)
    nn = np.linalg.norm(normals, axis=1)
    np.testing.assert_allclose(nn, 1.0, atol=1e-4)
    # field = r - |x - c|: gradient points inward, so ascent normals
    # (-gradient) point radially OUTWARD
    d = np.linalg.norm(verts - 0.5, axis=1)
    radial = (verts - 0.5) / d[:, None]
    align = np.sum(normals * radial, axis=1)
    assert np.median(align) > 0.95
    assert (align > 0.5).mean() > 0.95

    if _load_lib() is None:
        pytest.skip("no C++ toolchain; python path already exercised")
    # python mirror == C++ kernel (same edges -> same normals)
    saved = mcmod._LIB
    try:
        mcmod._LIB = None
        mcmod._LIB_FAILED = True
        v2, f2, vals2, n2 = marching_cubes_bricks(
            bi, bv, (n, n, n), 0.5, spacing, gradient_direction="ascent",
            return_values=True, return_normals=True)
    finally:
        mcmod._LIB = saved
        mcmod._LIB_FAILED = False
    assert len(v2) == len(verts)
    # weld order may differ between backends: match by vertex position
    order1 = np.lexsort(verts.T)
    order2 = np.lexsort(v2.T)
    np.testing.assert_allclose(verts[order1], v2[order2], atol=1e-6)
    np.testing.assert_allclose(
        normals[order1], n2[order2], rtol=1e-4, atol=1e-5)


def _single_cube_volume(corner_vals):
    """2x2x2 volume with the 8 documented corner values (corner order
    0:(0,0,0) 1:(1,0,0) 2:(1,1,0) 3:(0,1,0) 4..7 at z=1)."""
    v = np.zeros((2, 2, 2), np.float32)
    order = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
             (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
    for c, (x, y, z) in enumerate(order):
        v[x, y, z] = corner_vals[c]
    return v


def test_trilinear_interior_tunnel_vs_caps():
    """method='trilinear' (VERDICT r2 #6): the diagonal case-4 cube.
    When the trilinear interior connects the two inside corners the mode
    emits a tunnel band (6 tris over the 6 crossing-edge verts); when it
    does not, two caps (2 tris) — which is also what method='cubes'
    always produces."""
    if _load_lib() is None:
        pytest.skip("trilinear mode requires the C++ kernel")
    level = 0.5
    # corners 0 and 6 inside; others at `lo`. F(center) = (2 + 6*lo)/8:
    # lo=0.45 -> 0.5875 > level (tunnel); lo=0.1 -> 0.325 < level (caps)
    for lo, tunnel in ((0.45, True), (0.1, False)):
        cv = [lo] * 8
        cv[0] = cv[6] = 1.0
        vol = _single_cube_volume(cv)
        vt, ft, _, _ = marching_cubes(vol, level, method="trilinear")
        vc, fc, _, _ = marching_cubes(vol, level, method="cubes")
        assert len(vt) == 6 and len(vc) == 6  # same crossing-edge verts
        assert len(fc) == 2                    # cubes: always two caps
        if tunnel:
            assert len(ft) == 6, "trilinear should emit a 6-tri band"
            # the band is a closed annulus: every mesh edge shared by
            # exactly 2 faces along the tube direction... at least assert
            # it connects both triangles' vertex sets
            assert set(ft.flatten()) == set(range(6))
        else:
            assert len(ft) == 2, "disconnected interior -> two caps"


def test_trilinear_face_decider_differs_from_average():
    """A face-ambiguous config where the bilinear saddle and the face-center
    average disagree: corners chosen so avg > level but saddle < level.
    a=0.9, c=0.52, b=d=0.3 (level 0.5): avg=0.505 (joined), saddle =
    (a'c' - b'd')/(a'+c'-b'-d') + L with primes = v - L: (0.4*0.02 -
    0.04)/(0.4+0.02-0.4) + 0.5 = -1.6+0.5 < L (separated)."""
    if _load_lib() is None:
        pytest.skip("trilinear mode requires the C++ kernel")
    level = 0.5
    cv = [0.9, 0.3, 0.52, 0.3,    # z=0 face: diagonal 0/2 in, 1/3 out
          0.1, 0.1, 0.1, 0.1]     # z=1 all out
    vol = _single_cube_volume(cv)
    vt, ft, _, _ = marching_cubes(vol, level, method="trilinear")
    vc, fc, _, _ = marching_cubes(vol, level, method="cubes")
    # same crossing edges either way (6 of them: 3 per inside corner)
    assert len(vt) == len(vc) == 6
    # both watertight around the two corners; the tilings differ
    assert len(ft) >= 2 and len(fc) >= 2
    tri_t = {tuple(sorted(f)) for f in ft.tolist()}
    tri_c = {tuple(sorted(f)) for f in fc.tolist()}
    assert tri_t != tri_c, "decider should change the ambiguous tiling"


def test_trilinear_matches_cubes_on_smooth_field():
    """On an ambiguity-free field the three ingredients (verts, faces,
    values) of 'trilinear' coincide with 'cubes' exactly."""
    if _load_lib() is None:
        pytest.skip("trilinear mode requires the C++ kernel")
    n = 24
    vol = _sphere_volume(n)
    spacing = (1 / (n - 1),) * 3
    vt, ft, nt, valt = marching_cubes(
        vol, 0.0, spacing=spacing, method="trilinear")
    vc, fcs, ncs, valc = marching_cubes(
        vol, 0.0, spacing=spacing, method="cubes")
    np.testing.assert_array_equal(vt, vc)
    np.testing.assert_array_equal(ft, fcs)
    np.testing.assert_array_equal(valt, valc)


def test_brick_straddle_masks_bit_exact():
    """extract_active_bricks(with_masks=True) appends per-brick straddle
    masks; the masked C++ path must produce the BIT-identical mesh of the
    scan path (same cube set by the side-preserving quantization
    guarantee), and the device mask must equal a numpy recompute from the
    dequantized bricks."""
    jnp = pytest.importorskip("jax.numpy")
    from garmentnets_tpu.ops.isosurface import (
        extract_active_bricks, split_brick_payload, dequantize_vals,
        bricks_to_cube_list, BLOCK)
    from garmentnets_tpu.ops.marching_cubes import marching_cubes_bricks

    n = 32
    rng = np.random.RandomState(5)
    fields = [
        _sphere_volume(n) + 0.5,
        # noisy multi-component field exercises partial bricks + borders
        (rng.rand(n, n, n) * 0.2 + _sphere_volume(n) * 0.7 + 0.5
         ).astype(np.float32),
    ]
    for vol in fields:
        b, v64, c = extract_active_bricks(jnp.asarray(vol[None]), 0.5, 512)
        bm, v72, cm = extract_active_bricks(jnp.asarray(vol[None]), 0.5,
                                            512, with_masks=True)
        np.testing.assert_array_equal(np.asarray(b), np.asarray(bm))
        np.testing.assert_array_equal(np.asarray(c), np.asarray(cm))
        k = int(np.asarray(c)[0])
        bi = np.asarray(b)[0, :k]
        vals, masks = split_brick_payload(np.asarray(v72)[0, :k])
        np.testing.assert_array_equal(vals, np.asarray(v64)[0, :k])

        # mask oracle: recompute the straddle set from the cube list
        cube_base, _ = bricks_to_cube_list(bi, vals, 0.5, n)
        bits = np.zeros((k, 64), bool)
        nb = n // BLOCK
        cz = cube_base % n
        cy = (cube_base // n) % n
        cx = cube_base // (n * n)
        block = ((cx // BLOCK) * nb + (cy // BLOCK)) * nb + (cz // BLOCK)
        row_of = {int(idx): r for r, idx in enumerate(bi)}
        for blk, x, y, z in zip(block, cx % BLOCK, cy % BLOCK, cz % BLOCK):
            bits[row_of[int(blk)], (x * BLOCK + y) * BLOCK + z] = True
        got_bits = np.unpackbits(
            masks, axis=-1, bitorder="little").astype(bool)
        np.testing.assert_array_equal(got_bits, bits)

        spacing = (1 / (n - 1),) * 3
        plain = marching_cubes_bricks(
            bi, vals, (n, n, n), 0.5, spacing, return_values=True,
            return_normals=True)
        masked = marching_cubes_bricks(
            bi, vals, (n, n, n), 0.5, spacing, return_values=True,
            return_normals=True, cube_masks=masks)
        for a, bb in zip(plain, masked):
            np.testing.assert_array_equal(a, bb)
