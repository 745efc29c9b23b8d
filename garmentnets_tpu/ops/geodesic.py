"""Heat-method geodesic distances (scipy sparse, host-side).

Replaces potpourri3d's MeshHeatMethodDistanceSolver (C++ geometry-central)
used by the reference for geodesic-RMS eval (common/potpourri3d_util.py:5-15,
eval.py:736; SURVEY.md §2.3 #12). Implements Crane et al., "Geodesics in
Heat": one-time sparse factorization of the heat and Poisson systems, then
two triangular solves per source vertex.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


class MeshHeatMethodDistanceSolver:
    def __init__(self, verts: np.ndarray, faces: np.ndarray,
                 t_coef: float = 1.0):
        verts = np.asarray(verts, np.float64)
        faces = np.asarray(faces, np.int64)
        nv = len(verts)
        self.verts = verts
        self.faces = faces

        vi = [verts[faces[:, k]] for k in range(3)]
        # edge vectors opposite to each corner
        e = [vi[(k + 2) % 3] - vi[(k + 1) % 3] for k in range(3)]
        # face areas / normals
        n = np.cross(e[1], e[2])
        double_area = np.linalg.norm(n, axis=1)
        double_area = np.maximum(double_area, 1e-12)
        self.face_area = double_area / 2
        self.face_normal = n / double_area[:, None]

        # cotangents at each corner: cot(angle at corner k)
        cots = []
        for k in range(3):
            a = -e[(k + 1) % 3]
            b = e[(k + 2) % 3]
            cos_ = np.einsum("ij,ij->i", a, b)
            sin_ = np.linalg.norm(np.cross(a, b), axis=1)
            cots.append(cos_ / np.maximum(sin_, 1e-12))
        cots = np.stack(cots, axis=1)  # [F, 3]

        # cotan Laplacian (positive semidefinite): L = D - W
        rows, cols, vals = [], [], []
        for k in range(3):
            i = faces[:, (k + 1) % 3]
            j = faces[:, (k + 2) % 3]
            w = 0.5 * cots[:, k]
            rows += [i, j, i, j]
            cols += [j, i, i, j]
            vals += [-w, -w, w, w]
        L = sp.coo_matrix(
            (np.concatenate(vals),
             (np.concatenate(rows), np.concatenate(cols))),
            shape=(nv, nv)).tocsc()
        self.L = L

        # lumped mass matrix
        mass = np.zeros(nv)
        for k in range(3):
            np.add.at(mass, faces[:, k], self.face_area / 3)
        mass = np.maximum(mass, 1e-12)
        self.mass = mass

        # time step: mean edge length squared
        el = np.concatenate([np.linalg.norm(ek, axis=1) for ek in e])
        t = t_coef * float(np.mean(el)) ** 2

        A_heat = sp.diags(mass) + t * L
        A_pois = (L + sp.eye(nv) * 1e-9).tocsc()
        self._heat_solve = spla.factorized(A_heat.tocsc())
        self._pois_solve = spla.factorized(A_pois)

        # per-face gradient helpers: grad u = sum_k u_k (N x e_k) / (2A)
        self._grad_vec = [
            np.cross(self.face_normal, e[k]) / (2 * self.face_area[:, None])
            for k in range(3)]

    def compute_distance(self, source_idx: int) -> np.ndarray:
        nv = len(self.verts)
        delta = np.zeros(nv)
        delta[source_idx] = 1.0
        u = self._heat_solve(delta)

        # normalized negative gradient per face
        grad = np.zeros((len(self.faces), 3))
        for k in range(3):
            grad += u[self.faces[:, k], None] * self._grad_vec[k]
        norm = np.linalg.norm(grad, axis=1, keepdims=True)
        X = -grad / np.maximum(norm, 1e-12)

        # integrated divergence at vertices: for each face corner i with
        # adjacent edges e_ij, e_il and opposite cotangents
        div = np.zeros(nv)
        for k in range(3):
            i = self.faces[:, k]
            j = self.faces[:, (k + 1) % 3]
            l = self.faces[:, (k + 2) % 3]
            e_ij = self.verts[j] - self.verts[i]
            e_il = self.verts[l] - self.verts[i]
            # cot of angle opposite to edge e_ij is at corner l, etc.
            def cot_at(a_idx, b_idx, c_idx):
                a = self.verts[b_idx] - self.verts[a_idx]
                b = self.verts[c_idx] - self.verts[a_idx]
                cos_ = np.einsum("ij,ij->i", a, b)
                sin_ = np.linalg.norm(np.cross(a, b), axis=1)
                return cos_ / np.maximum(sin_, 1e-12)
            cot_l = cot_at(l, i, j)   # angle at l, opposite edge ij
            cot_j = cot_at(j, i, l)   # angle at j, opposite edge il
            contrib = 0.5 * (cot_l * np.einsum("ij,ij->i", e_ij, X)
                             + cot_j * np.einsum("ij,ij->i", e_il, X))
            np.add.at(div, i, contrib)

        phi = self._pois_solve(div)
        phi = phi - phi[source_idx]
        if np.mean(phi) < 0:  # sign of the Poisson solution is arbitrary
            phi = -phi
        return np.maximum(phi, 0.0)


def geodesic_matrix(verts, faces, vert_idxs) -> np.ndarray:
    """Pairwise geodesic distances between selected vertices
    (reference common/potpourri3d_util.py:5-15)."""
    solver = MeshHeatMethodDistanceSolver(verts, faces)
    n = len(vert_idxs)
    out = np.zeros((n, n))
    for i, vi in enumerate(vert_idxs):
        all_d = solver.compute_distance(int(vi))
        out[i] = all_d[vert_idxs]
    return out
