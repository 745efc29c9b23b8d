"""Exact mesh Hausdorff (VERDICT r1 #9): ops/cpp/hausdorff.cpp replicates
igl.hausdorff's definition (reference eval.py:569) — the max over VERTICES
of either mesh of the exact point-to-triangle-mesh distance to the other.
Validated against a brute-force numpy point-to-triangle oracle and against
analytic cases.
"""
import numpy as np
import pytest

from garmentnets_tpu.ops.geometry import (
    mesh_hausdorff, _load_hausdorff_lib)


def _point_tri_dist_brute(p, a, b, c):
    """Exact point-triangle distance: closest-point-on-triangle via the
    region test (independent reimplementation of the C++ helper's math)."""
    ab, ac, ap = b - a, c - a, p - a
    d1, d2 = ab @ ap, ac @ ap
    if d1 <= 0 and d2 <= 0:
        return np.linalg.norm(p - a)
    bp = p - b
    d3, d4 = ab @ bp, ac @ bp
    if d3 >= 0 and d4 <= d3:
        return np.linalg.norm(p - b)
    vc = d1 * d4 - d3 * d2
    if vc <= 0 and d1 >= 0 and d3 <= 0:
        v = d1 / (d1 - d3)
        return np.linalg.norm(p - (a + v * ab))
    cp = p - c
    d5, d6 = ab @ cp, ac @ cp
    if d6 >= 0 and d5 <= d6:
        return np.linalg.norm(p - c)
    vb = d5 * d2 - d1 * d6
    if vb <= 0 and d2 >= 0 and d6 <= 0:
        w = d2 / (d2 - d6)
        return np.linalg.norm(p - (a + w * ac))
    va = d3 * d6 - d5 * d4
    if va <= 0 and (d4 - d3) >= 0 and (d5 - d6) >= 0:
        w = (d4 - d3) / ((d4 - d3) + (d5 - d6))
        return np.linalg.norm(p - (b + w * (c - b)))
    denom = va + vb + vc
    v, w = vb / denom, vc / denom
    return np.linalg.norm(p - (a + ab * v + ac * w))


def _hausdorff_brute(va, fa, vb, fb):
    def one_sided(Q, V, F):
        worst = 0.0
        for p in Q:
            best = min(_point_tri_dist_brute(p, V[f[0]], V[f[1]], V[f[2]])
                       for f in F)
            worst = max(worst, best)
        return worst
    return max(one_sided(va, vb, fb), one_sided(vb, va, fa))


def _random_mesh(rng, nv=14, nf=16):
    v = rng.rand(nv, 3)
    f = rng.randint(0, nv, size=(nf, 3))
    # avoid degenerate faces with repeated vertices
    ok = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
    return v.astype(np.float64), f[ok].astype(np.int32)


@pytest.fixture(scope="module")
def native():
    lib = _load_hausdorff_lib()
    if lib is None:
        pytest.skip("no g++ toolchain: exact hausdorff lib unavailable")
    return lib


def test_exact_matches_brute_force(native):
    rng = np.random.RandomState(0)
    for trial in range(6):
        va, fa = _random_mesh(rng)
        vb, fb = _random_mesh(rng)
        vb = vb + rng.randn(3) * 0.2
        got = mesh_hausdorff(va, fa, vb, fb)
        want = _hausdorff_brute(va, fa, vb, fb)
        assert got == pytest.approx(want, abs=1e-12), trial


def test_translated_triangles_analytic(native):
    # two parallel unit triangles offset by dz: igl vertex-to-mesh distance
    # is exactly dz in both directions
    va = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
    fa = np.array([[0, 1, 2]], np.int32)
    vb = va + np.array([0, 0, 0.37])
    assert mesh_hausdorff(va, fa, vb, fa) == pytest.approx(0.37, abs=1e-15)


def test_vertex_off_surface_counts(native):
    # B = A plus one stray vertex far away that belongs to no face of the
    # OTHER mesh's query set; igl takes the max over VERTICES, so the stray
    # vertex of B dominates d(B, A)
    va = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
    fa = np.array([[0, 1, 2]], np.int32)
    vb = np.vstack([va, [[5.0, 0.0, 0.0]]])
    fb = np.array([[0, 1, 2]], np.int32)  # stray vertex unused by faces
    assert mesh_hausdorff(va, fa, vb, fb) == pytest.approx(4.0, abs=1e-12)


def test_larger_meshes_tree_correctness(native):
    """BVH path (many triangles -> internal nodes) agrees with brute force
    on a high-poly pair where recursion and pruning actually engage."""
    rng = np.random.RandomState(7)
    va, fa = _random_mesh(rng, nv=60, nf=220)
    vb, fb = _random_mesh(rng, nv=60, nf=220)
    got = mesh_hausdorff(va, fa, vb, fb)
    want = _hausdorff_brute(va, fa, vb, fb)
    assert got == pytest.approx(want, abs=1e-12)


def test_fallback_sampled_close(monkeypatch):
    """The no-toolchain fallback (point-sampled sets) approximates the
    metric on a case with a known value: two parallel unit triangles offset
    by dz have Hausdorff ~= dz, recovered up to the sample spacing. (On
    irregular meshes the sampled point-to-point metric deviates more — it
    is a fallback, documented as approximate.)"""
    import garmentnets_tpu.ops.geometry as geo
    va = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
    fa = np.array([[0, 1, 2]], np.int32)
    vb = va + np.array([0, 0, 0.37])
    monkeypatch.setattr(geo, "_HAUSDORFF_LIB", None)
    monkeypatch.setattr(geo, "_HAUSDORFF_FAILED", True)
    approx = geo.mesh_hausdorff(va, fa, vb, fa, num_samples=20000)
    assert approx == pytest.approx(0.37, rel=0.05)


def test_points_to_mesh_distance_matches_brute(native):
    from garmentnets_tpu.ops.geometry import points_to_mesh_distance
    rng = np.random.RandomState(3)
    v, f = _random_mesh(rng, nv=30, nf=60)
    q = rng.randn(40, 3) * 0.8 + 0.5
    got = points_to_mesh_distance(q, v, f)
    want = np.array([
        min(_point_tri_dist_brute(p, v[t[0]], v[t[1]], v[t[2]]) for t in f)
        for p in q])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_points_to_mesh_distance_fallback(monkeypatch):
    import garmentnets_tpu.ops.geometry as geo
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
    f = np.array([[0, 1, 2]], np.int32)
    q = np.array([[0.2, 0.2, 0.5], [0.25, 0.25, -0.1]])
    monkeypatch.setattr(geo, "_HAUSDORFF_LIB", None)
    monkeypatch.setattr(geo, "_HAUSDORFF_FAILED", True)
    approx = geo.points_to_mesh_distance(q, v, f, num_samples=50000)
    np.testing.assert_allclose(approx, [0.5, 0.1], atol=0.02)
