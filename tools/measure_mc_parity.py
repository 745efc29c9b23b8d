"""Measure the procedural marching-cubes deviation bound (docs/PARITY.md).

The production extractor (ops/cpp/marching.cpp method 0, "cubes") resolves
face-ambiguous configurations by the face-center average and never forms
interior tunnels; skimage's Lewiner tables (reference predict.py:172-177)
encode full trilinear topology. This tool turns the "differs only
sub-voxel in rare saddle cubes" argument into MEASURED numbers, on the
cloth-calibrated WNF fields the headline bench uses plus a saddle-rich
noise field:

  1. method='cubes'  vs  method='trilinear' (ops/cpp/marching.cpp method 2:
     asymptotic decider + sampled-trilinear interior tunnel test — the
     topology class the Lewiner tables encode), same 1x grid;
  2. each of the two against an ORACLE surface: the field trilinearly
     upsampled 4x (exact quarter-voxel interpolation via
     dense_decode.interp_matrix) and extracted at the fine grid — as
     factor -> inf this converges to the true trilinear isosurface that
     Lewiner approximates, so chamfer/hausdorff against it bounds each
     method's distance from the trilinear-exact surface.

Distances are reported in VOXELS (x (S-1); the [0,1]^3 domain spacing is
1/(S-1)). Usage: python tools/measure_mc_parity.py [--volume 128]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cloth_like_wnf                                # noqa: E402
from garmentnets_tpu.ops.marching_cubes import marching_cubes    # noqa: E402
from garmentnets_tpu.ops.dense_decode import interp_matrix       # noqa: E402
from garmentnets_tpu.ops.geometry import (                       # noqa: E402
    mesh_sample_barycentric, barycentric_interpolation, mesh_hausdorff,
    points_to_mesh_distance)


def upsample_trilinear(vol: np.ndarray, factor: int) -> np.ndarray:
    """Exact trilinear upsample to factor*(S-1)+1 per axis: fine grid
    points sit at integer multiples of 1/factor voxels, so align_corners
    interp_matrix weights reproduce the trilinear interpolant exactly."""
    S = vol.shape[0]
    Sf = factor * (S - 1) + 1
    W = interp_matrix(Sf, S)                       # [Sf, S]
    v = np.einsum("oz,xyz->xyo", W, vol).astype(np.float32)
    v = np.einsum("oy,xyz->xoz", W, v).astype(np.float32)
    out = np.empty((Sf, Sf, Sf), np.float32)
    flat = v.reshape(S, -1)
    chunk = 64
    for o in range(0, Sf, chunk):
        out[o:o + chunk] = (W[o:o + chunk] @ flat).reshape(-1, Sf, Sf)
    return out


def surf_samples(verts, faces, n=20000, seed=0):
    bc, fi = mesh_sample_barycentric(verts, faces, n, seed=seed)
    return barycentric_interpolation(bc, verts, faces[fi])


def deviation(pts_a, vb, fb):
    """Exact point-to-MESH distances (point-to-point chamfer between two
    samplings of the same surface floors at the ~0.5-voxel sample spacing
    and would bury the actual deviation signal — measured). Returns
    (mean, p99, max)."""
    d = points_to_mesh_distance(pts_a, vb, fb)
    return float(d.mean()), float(np.percentile(d, 99)), float(d.max())


def measure(name: str, vol: np.ndarray, level: float, factor: int = 4):
    S = vol.shape[0]
    spacing = (1.0 / (S - 1),) * 3
    t0 = time.time()
    vc, fc, _, _ = marching_cubes(vol, level, spacing=spacing,
                                  method="cubes")
    vt, ft, _, _ = marching_cubes(vol, level, spacing=spacing,
                                  method="trilinear")
    fine = upsample_trilinear(vol, factor)
    Sf = fine.shape[0]
    vo, fo, _, _ = marching_cubes(fine, level,
                                  spacing=(1.0 / (Sf - 1),) * 3,
                                  method="cubes")
    vox = float(S - 1)  # [0,1] units -> voxels
    pc = surf_samples(vc, fc)
    pt = surf_samples(vt, ft)
    po = surf_samples(vo, fo)

    def row(pts, v, f):
        m, p99, mx = deviation(pts, v, f)
        return (f"mean {m * vox:.5f} / p99 {p99 * vox:.5f} "
                f"/ max {mx * vox:.5f}")

    res = {
        "verts cubes/trilinear/oracle": (len(vc), len(vt), len(vo)),
        "faces cubes/trilinear/oracle": (len(fc), len(ft), len(fo)),
        "dev cubes->trilinear [voxels]": row(pc, vt, ft),
        "dev trilinear->cubes [voxels]": row(pt, vc, fc),
        "dev cubes->oracle    [voxels]": row(pc, vo, fo),
        "dev trilinear->oracle [voxels]": row(pt, vo, fo),
        "dev oracle->cubes    [voxels]": row(po, vc, fc),
        "dev oracle->trilinear [voxels]": row(po, vt, ft),
        "hausdorff(cubes, trilinear) [voxels]":
            mesh_hausdorff(vc, fc, vt, ft) * vox,
        "hausdorff(cubes, oracle)   [voxels]":
            mesh_hausdorff(vc, fc, vo, fo) * vox,
        "hausdorff(trilinear, oracle) [voxels]":
            mesh_hausdorff(vt, ft, vo, fo) * vox,
    }
    print(f"\n== {name} (S={S}, oracle {Sf}^3, {time.time()-t0:.1f}s) ==")
    for k, v in res.items():
        print(f"  {k}: {v:.5f}" if isinstance(v, float)
              else f"  {k}: {v}")
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--volume", type=int, default=128)
    ap.add_argument("--factor", type=int, default=4)
    args = ap.parse_args()

    measure("cloth shell (bench default load)",
            _cloth_like_wnf(args.volume, heavy=False), 0.5, args.factor)
    measure("cloth shell (heavy/dress load)",
            _cloth_like_wnf(args.volume, heavy=True), 0.5, args.factor)
    # saddle-rich smoothed noise: worst case for ambiguity resolution
    from scipy.ndimage import gaussian_filter
    rng = np.random.RandomState(0)
    noise = gaussian_filter(rng.rand(48, 48, 48), 1.2).astype(np.float32)
    measure("smoothed noise (saddle-rich worst case)",
            noise, float(np.median(noise)), args.factor)


if __name__ == "__main__":
    main()
