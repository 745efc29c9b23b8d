"""Isosurface extraction: ctypes binding for the C++ kernel (procedural
marching cubes by default, marching tetrahedra selectable), with pure-Python
fallbacks implementing the identical algorithms.

Replaces skimage.measure.marching_cubes (reference predict.py:172-177,
common/marching_cubes_util.py). Deviation note: the default "cubes" method
places vertices only on crossing cube edges like Lewiner (same vertex
density, ~1/active cube); face-ambiguous configurations are resolved by the
face-center average (identical on both sides of a face, hence crack-free)
where Lewiner uses full trilinear topology — the surfaces differ only
sub-voxel in rare saddle cubes, far below eval-metric resolution. The
"tetrahedra" method (6-tet split, ~3x more vertices) is kept as a
simplicial-exact alternative.

Signature parity with skimage: marching_cubes(volume, level, spacing,
gradient_direction) -> (verts, faces, normals, values); raises ValueError when
the level is not crossed (the predict harness's NaN-sentinel failure protocol,
reference predict.py:165-189, depends on this).
"""
from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Tuple

import numpy as np

_CPP_DIR = pathlib.Path(__file__).parent / "cpp"
_LIB = None
_LIB_FAILED = False
_LIB_LOCK = threading.Lock()


def _load_lib():
    # Double-checked locking: the engine's per-garment MC thread pool can
    # hit first use from several workers at once; without the lock two
    # racing g++ subprocesses truncate the same .so and a dlopen of the
    # partially written file pins the process to the pure-Python fallback.
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    with _LIB_LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        return _load_lib_locked()


def _load_lib_locked():
    global _LIB, _LIB_FAILED
    so = _CPP_DIR / "libmarching.so"
    src = _CPP_DIR / "marching.cpp"
    try:
        if (not so.exists()
                or so.stat().st_mtime < src.stat().st_mtime):
            # compile to a pid-unique temp path and os.rename into place:
            # atomic on POSIX, so a CONCURRENT PROCESS (e.g. pytest -n or
            # the eval process pool) never dlopens a half-written file
            tmp = so.with_suffix(f".{os.getpid()}.tmp.so")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(tmp),
                 str(src)],
                check=True, capture_output=True)
            os.rename(tmp, so)
        lib = ctypes.CDLL(str(so))
        float_pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))
        out_args = [
            float_pp,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.extract_isosurface.restype = ctypes.c_int
        lib.extract_isosurface.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int,
        ] + out_args + [float_pp, float_pp]
        lib.extract_isosurface_active.restype = ctypes.c_int
        lib.extract_isosurface_active.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int,
        ] + out_args + [float_pp, float_pp]
        lib.extract_isosurface_bricks.restype = ctypes.c_int
        lib.extract_isosurface_bricks.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int8), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int,
        ] + out_args + [ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
                        float_pp, float_pp]
        lib.extract_isosurface_bricks_masked.restype = ctypes.c_int
        lib.extract_isosurface_bricks_masked.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int,
        ] + out_args + [ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
                        float_pp, float_pp]
        lib.mt_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except Exception as e:
        # LOUD fallback: the pure-Python MC is orders of magnitude slower;
        # a silent flag here once masked a non-compiling source revision
        # behind a stale prebuilt .so (round-5 find)
        import sys
        detail = ""
        if isinstance(e, subprocess.CalledProcessError) and e.stderr:
            detail = ": " + e.stderr.decode(errors="replace").strip()[-500:]
        print(f"garmentnets_tpu: C++ marching-cubes unavailable ({e!r}"
              f"{detail}); falling back to the SLOW pure-Python extractor",
              file=sys.stderr, flush=True)
        _LIB_FAILED = True
    return _LIB


_METHOD_CODE = {"cubes": 0, "tetrahedra": 1, "trilinear": 2}


def _mc_native(vol, level, spacing, ascent, method="cubes"):
    lib = _load_lib()
    vol = np.ascontiguousarray(vol, np.float32)
    nx, ny, nz = vol.shape
    return _collect_mesh(lib.extract_isosurface, (
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, ctypes.c_float(level),
        ctypes.c_float(spacing[0]), ctypes.c_float(spacing[1]),
        ctypes.c_float(spacing[2]), 1 if ascent else 0,
        _METHOD_CODE[method]), want_values=True)


def _collect_mesh(lib_fn, args, want_values: bool = False,
                  want_normals: bool = False):
    """Marshal (verts, faces[, values][, normals]) out of a C extractor
    call. The C functions take trailing nullable float** values_out /
    normals_out."""
    verts_p = ctypes.POINTER(ctypes.c_float)()
    faces_p = ctypes.POINTER(ctypes.c_int32)()
    values_p = ctypes.POINTER(ctypes.c_float)()
    normals_p = ctypes.POINTER(ctypes.c_float)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    lib = _load_lib()
    lib_fn(*args, ctypes.byref(verts_p), ctypes.byref(nv),
           ctypes.byref(faces_p), ctypes.byref(nf),
           ctypes.byref(values_p) if want_values else None,
           ctypes.byref(normals_p) if want_normals else None)
    try:
        verts = np.ctypeslib.as_array(
            verts_p, shape=(max(nv.value, 1), 3)).copy()[: nv.value]
        faces = np.ctypeslib.as_array(
            faces_p, shape=(max(nf.value, 1), 3)).copy()[: nf.value]
        if want_values:
            values = np.ctypeslib.as_array(
                values_p, shape=(max(nv.value, 1),)).copy()[: nv.value]
        if want_normals:
            normals = np.ctypeslib.as_array(
                normals_p, shape=(max(nv.value, 1), 3)).copy()[: nv.value]
    finally:
        lib.mt_free(verts_p)
        lib.mt_free(faces_p)
        if want_values:
            lib.mt_free(values_p)
        if want_normals:
            lib.mt_free(normals_p)
    out = (verts.astype(np.float32), faces.astype(np.int64))
    if want_values:
        out += (values.astype(np.float32),)
    if want_normals:
        out += (normals.astype(np.float32),)
    return out


# corner offset order must match the C++/device extraction
CUBE_CORNERS = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                         [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]])


def marching_cubes_active(cube_idx: np.ndarray, corner_vals: np.ndarray,
                          dims, level: float, spacing,
                          gradient_direction: str = "ascent",
                          method: str = "cubes"):
    """Isosurface from a device-extracted active-cube list.

    cube_idx: [K] flat vertex index of each cube's origin corner (C-order
    over dims; -1 = padding); corner_vals: [K, 8] field values at the cube
    corners in CUBE_CORNERS order. Returns (verts, faces). Raises ValueError
    when no surface is produced (NaN-sentinel protocol parity).
    """
    cube_idx = np.ascontiguousarray(cube_idx, np.int32)
    corner_vals = np.ascontiguousarray(corner_vals, np.float32)
    nx, ny, nz = dims
    ascent = gradient_direction == "ascent"
    if _load_lib() is not None:
        lib = _load_lib()
        verts, faces = _collect_mesh(lib.extract_isosurface_active, (
            cube_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            corner_vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(cube_idx), nx, ny, nz, ctypes.c_float(level),
            ctypes.c_float(spacing[0]), ctypes.c_float(spacing[1]),
            ctypes.c_float(spacing[2]), 1 if ascent else 0,
            _METHOD_CODE[method]))
    elif method == "cubes":
        verts, faces, _ = _mc_python_cubes_active(
            cube_idx, corner_vals, dims, level, spacing, ascent)
    else:
        verts, faces, _ = _mc_numpy_active(
            cube_idx, corner_vals, dims, level, spacing, ascent)
    if len(verts) == 0 or len(faces) == 0:
        raise ValueError("no surface found at given iso level")
    return verts, faces


def marching_cubes_bricks(brick_idx: np.ndarray, brick_vals_q: np.ndarray,
                          dims, level: float, spacing,
                          gradient_direction: str = "ascent",
                          method: str = "cubes",
                          return_ranks: bool = False,
                          return_values: bool = False,
                          return_normals: bool = False,
                          cube_masks=None):
    """Isosurface from device-extracted int8 bricks (the predict engine's
    production wire format — ops/isosurface.extract_active_bricks).

    brick_idx: [K] flat index into the (dims/4) block grid (-1 = padding);
    brick_vals_q: [K, 64] side-preserving quantized voxel values in local
    C-order. The C++ kernel discovers the straddling cubes directly from the
    bricks (no host-python expansion step); the pure-Python fallback routes
    through bricks_to_cube_list. Returns (verts, faces), extended by
    `values` with return_values (per-vertex edge-endpoint max — skimage's
    `values` output, from the dequantized int8 field so within 1/QUANT_SCALE
    of the true WNF), by `normals` with return_normals (unit volume-gradient
    normals: central differences of the dequantized field at the edge
    endpoints, lerped at the vertex — skimage-semantics gradient normals,
    reference predict.py:172-197; one-sided where a neighbor brick was not
    shipped), and/or by `ranks` with return_ranks, where ranks[i] is
    vertex i's index in the device's canonical crossing-edge enumeration
    (ops/isosurface.extract_crossing_edges) for looking up on-device
    warp-query results; order (verts, faces[, values][, normals][, ranks]).
    Raises ValueError when no surface is produced (NaN-sentinel protocol
    parity)."""
    from garmentnets_tpu.ops.isosurface import (
        VAL_QUANT_SCALE, bricks_to_cube_list)
    brick_idx = np.ascontiguousarray(brick_idx, np.int32)
    if np.shape(brick_vals_q)[-1] == 72 and cube_masks is None:
        # masked wire format (extract_active_bricks with_masks=True) passed
        # whole: auto-split rather than silently reading mask bytes as
        # voxel values at the kernel's stride-64 indexing
        from garmentnets_tpu.ops.isosurface import split_brick_payload
        brick_vals_q, cube_masks = split_brick_payload(
            np.asarray(brick_vals_q))
    assert np.shape(brick_vals_q)[-1] == 64, (
        f"brick_vals_q must be [K,64] int8 voxel rows (or the [K,72] "
        f"masked payload), got {np.shape(brick_vals_q)}")
    brick_vals_q = np.ascontiguousarray(brick_vals_q, np.int8)
    nx, ny, nz = dims
    ascent = gradient_direction == "ascent"
    if return_ranks and not ascent:
        # the canonical crossing-edge set is keyed on the (v > level) side
        # rule; descent-mode MC can place vertices on edges outside that
        # set (corners dequantizing to exactly `level`), which would
        # corrupt the rank <-> vertex bijection
        raise ValueError("return_ranks requires gradient_direction='ascent'")
    if return_ranks and method != "cubes":
        # uniform across backends: tetrahedra places vertices on diagonal
        # edges that have no rank in the canonical grid-edge enumeration
        # (the C++ kernel would emit -1 there; the python fallback can't
        # compute them at all)
        raise ValueError("return_ranks requires method='cubes'")
    ranks = None
    normals = None
    if _load_lib() is not None:
        lib = _load_lib()
        verts_p = ctypes.POINTER(ctypes.c_float)()
        faces_p = ctypes.POINTER(ctypes.c_int32)()
        ranks_p = ctypes.POINTER(ctypes.c_int32)()
        values_p = ctypes.POINTER(ctypes.c_float)()
        normals_p = ctypes.POINTER(ctypes.c_float)()
        nv = ctypes.c_int64()
        nf = ctypes.c_int64()
        common = (
            len(brick_idx), nx, ny, nz, ctypes.c_float(level),
            ctypes.c_float(VAL_QUANT_SCALE),
            ctypes.c_float(spacing[0]), ctypes.c_float(spacing[1]),
            ctypes.c_float(spacing[2]), 1 if ascent else 0,
            _METHOD_CODE[method],
            ctypes.byref(verts_p), ctypes.byref(nv),
            ctypes.byref(faces_p), ctypes.byref(nf),
            ctypes.byref(ranks_p) if return_ranks else None,
            ctypes.byref(values_p) if return_values else None,
            ctypes.byref(normals_p) if return_normals else None)
        if cube_masks is not None:
            # device-computed straddle masks: the kernel skips its cube
            # rejection scan (identical cube set — side-preserving
            # quantization guarantee; see extract_isosurface_bricks_masked)
            cube_masks = np.ascontiguousarray(cube_masks, np.uint8)
            assert cube_masks.shape == (len(brick_idx), 8), cube_masks.shape
            lib.extract_isosurface_bricks_masked(
                brick_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                brick_vals_q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                cube_masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                *common)
        else:
            lib.extract_isosurface_bricks(
                brick_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                brick_vals_q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                *common)
        try:
            verts = np.ctypeslib.as_array(
                verts_p, shape=(max(nv.value, 1), 3)).copy()[: nv.value]
            faces = np.ctypeslib.as_array(
                faces_p, shape=(max(nf.value, 1), 3)).copy()[: nf.value]
            if return_ranks:
                ranks = np.ctypeslib.as_array(
                    ranks_p, shape=(max(nv.value, 1),)).copy()[: nv.value]
            if return_values:
                values = np.ctypeslib.as_array(
                    values_p, shape=(max(nv.value, 1),)).copy()[: nv.value]
            if return_normals:
                normals = np.ctypeslib.as_array(
                    normals_p,
                    shape=(max(nv.value, 1), 3)).copy()[: nv.value]
        finally:
            lib.mt_free(verts_p)
            lib.mt_free(faces_p)
            if return_ranks:
                lib.mt_free(ranks_p)
            if return_values:
                lib.mt_free(values_p)
            if return_normals:
                lib.mt_free(normals_p)
        verts = verts.astype(np.float32)
        faces = faces.astype(np.int64)
    else:
        # the python helpers assume a cubic grid (the engine always passes
        # one); the C++ path above handles general (nx, ny, nz)
        assert nx == ny == nz, (
            f"python brick-MC fallback requires cubic dims, got {dims}")
        cube_base, cube_vals = bricks_to_cube_list(
            brick_idx, brick_vals_q, level, nx)
        if method == "cubes":
            verts, faces, values, edge_keys = _mc_python_cubes_active(
                cube_base, cube_vals, dims, level, spacing, ascent,
                return_edges=True)
        else:
            verts, faces, values = _mc_numpy_active(
                cube_base, cube_vals, dims, level, spacing, ascent)
            edge_keys = None
        if return_ranks:
            ranks = _ranks_from_edge_keys(
                edge_keys, brick_idx, brick_vals_q, level, dims)
        if return_normals:
            if edge_keys is None:
                raise NotImplementedError(
                    "return_normals python fallback requires "
                    "method='cubes'")
            normals = _brick_grad_normals_py(
                edge_keys, brick_idx, brick_vals_q, level, dims, spacing,
                ascent)
    if len(verts) == 0 or len(faces) == 0:
        raise ValueError("no surface found at given iso level")
    out = (verts, faces)
    if return_values:
        out += (values.astype(np.float32),)
    if return_normals:
        out += (normals.astype(np.float32),)
    if return_ranks:
        out += (ranks,)
    return out if len(out) > 2 else (verts, faces)


def _brick_grad_normals_py(edge_keys, brick_idx, brick_vals_q, level, dims,
                           spacing, ascent):
    """Python mirror of the C++ kernel's want_normals path: unit volume-
    gradient normals at each vertex's edge, central differences on the
    dequantized brick field with one-sided fallback where a neighbor value
    is unavailable, lerped by the vertex's edge parameter t."""
    from garmentnets_tpu.ops.isosurface import VAL_QUANT_SCALE, BLOCK
    nx, ny, nz = dims
    nbx, nby, nbz = nx // BLOCK, ny // BLOCK, nz // BLOCK
    row_of = np.full(nbx * nby * nbz, -1, np.int64)
    keep = np.asarray(brick_idx) >= 0
    row_of[np.asarray(brick_idx)[keep].astype(np.int64)] = \
        np.flatnonzero(keep)
    q = np.asarray(brick_vals_q).reshape(len(brick_idx), 64)

    def val(x, y, z):
        if not (0 <= x < nx and 0 <= y < ny and 0 <= z < nz):
            return None
        row = row_of[((x // 4) * nby + (y // 4)) * nbz + (z // 4)]
        if row < 0:
            return None
        qq = q[row, ((x % 4) << 4) | ((y % 4) << 2) | (z % 4)]
        return np.float32(qq) / np.float32(VAL_QUANT_SCALE) \
            + np.float32(level)

    def grad(x, y, z):
        g = np.zeros(3, np.float32)
        c = (x, y, z)
        for a in range(3):
            pp = list(c)
            pp[a] += 1
            vp = val(*pp)
            pp[a] -= 2
            vm = val(*pp)
            v0 = val(*c)
            if vp is not None and vm is not None:
                g[a] = (vp - vm) / (2 * spacing[a])
            elif vp is not None:
                g[a] = (vp - v0) / spacing[a]
            elif vm is not None:
                g[a] = (v0 - vm) / spacing[a]
        return g

    out = np.zeros((len(edge_keys), 3), np.float32)
    for i, (ga, gb) in enumerate(edge_keys):
        ax, ay, az = ga // (nz * ny), (ga // nz) % ny, ga % nz
        bx, by, bz = gb // (nz * ny), (gb // nz) % ny, gb % nz
        va, vb = val(ax, ay, az), val(bx, by, bz)
        t = np.float32(0.5) if vb == va else \
            min(max((np.float32(level) - va) / (vb - va),
                    np.float32(0)), np.float32(1))
        n = grad(ax, ay, az)
        n = n + t * (grad(bx, by, bz) - n)
        ln = float(np.linalg.norm(n))
        out[i] = n * ((-1.0 if ascent else 1.0) / (ln if ln > 0 else 1.0))
    return out


def _ranks_from_edge_keys(edge_keys, brick_idx, brick_vals_q, level, dims):
    """Python-fallback rank computation: maps each vertex's (ga, gb) grid
    edge to its index in the device's canonical crossing-edge enumeration
    (mirrored by isosurface.crossing_edge_mask_np)."""
    from garmentnets_tpu.ops.isosurface import (
        crossing_edge_mask_np, BLOCK, EDGE_SLOTS)
    nx, ny, nz = dims
    if edge_keys is None:
        raise NotImplementedError(
            "vertex ranks require the 'cubes' method")
    mask = crossing_edge_mask_np(brick_idx, brick_vals_q, level, nx)
    flat_true = np.flatnonzero(mask.reshape(-1))
    nb = nx // BLOCK
    row_of = np.full(nb ** 3, -1, np.int64)
    keep = np.asarray(brick_idx) >= 0
    row_of[np.asarray(brick_idx)[keep].astype(np.int64)] = \
        np.flatnonzero(keep)
    ranks = np.full(len(edge_keys), -1, np.int32)
    for i, (ga, gb) in enumerate(edge_keys):
        d = gb - ga
        if d == 1:
            dr = 2
        elif d == nz:
            dr = 1
        elif d == ny * nz:
            dr = 0
        else:
            continue
        z = ga % nz
        y = (ga // nz) % ny
        x = ga // (nz * ny)
        row = row_of[((x // BLOCK) * nb + (y // BLOCK)) * nb + (z // BLOCK)]
        slot = dr * 64 + (((x % 4) << 4) | ((y % 4) << 2) | (z % 4))
        flat = row * EDGE_SLOTS + slot
        j = np.searchsorted(flat_true, flat)
        if j < len(flat_true) and flat_true[j] == flat:
            ranks[i] = j
    return ranks


def _mc_numpy_active(cube_idx, corner_vals, dims, level, spacing, ascent):
    """Numpy fallback: scatter corner values into a sparse-as-dense volume
    restricted to active cubes, then reuse the dense path on the bounding
    region. Simpler than re-vectorizing; only used where g++ is absent."""
    nx, ny, nz = dims
    keep = cube_idx >= 0
    cube_idx = cube_idx[keep]
    corner_vals = corner_vals[keep]
    if len(cube_idx) == 0:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64),
                np.zeros((0,), np.float32))
    # fill a dense volume with a far-side constant so only active cubes cross
    fill = level - 1.0 if ascent else level + 1.0
    vol = np.full((nx, ny, nz), fill, np.float32)
    cz = cube_idx % nz
    cy = (cube_idx // nz) % ny
    cx = cube_idx // (nz * ny)
    for c, (dx, dy, dz) in enumerate(CUBE_CORNERS):
        vol[cx + dx, cy + dy, cz + dz] = corner_vals[:, c]
    verts, faces, values = _mc_numpy(vol, level, spacing, ascent)
    # drop any triangle not fully inside an active cube (fill-boundary
    # artifacts): triangles whose cube isn't active
    active = set(cube_idx.tolist())
    vv = verts / np.asarray(spacing)
    centroid = vv[faces].mean(axis=1)
    cub = np.minimum(np.floor(centroid).astype(np.int64),
                     np.asarray([nx - 2, ny - 2, nz - 2]))
    flat = (cub[:, 0] * ny + cub[:, 1]) * nz + cub[:, 2]
    ok = np.asarray([f in active for f in flat.tolist()])
    faces = faces[ok]
    used = np.unique(faces)
    remap = np.zeros(len(verts), np.int64)
    remap[used] = np.arange(len(used))
    return verts[used], remap[faces], values[used]


# ---------------------------------------------------------------------------
# pure-Python marching cubes (mirror of the C++ method 0; also the oracle)
# ---------------------------------------------------------------------------
_EDGE_C = [(0, 1), (1, 2), (2, 3), (3, 0),
           (4, 5), (5, 6), (6, 7), (7, 4),
           (0, 4), (1, 5), (2, 6), (3, 7)]
_FACE_C = [(0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 5, 4),
           (3, 2, 6, 7), (0, 3, 7, 4), (1, 2, 6, 5)]
_FACE_E = [(0, 1, 2, 3), (4, 5, 6, 7), (0, 9, 4, 8),
           (2, 10, 6, 11), (3, 11, 7, 8), (1, 10, 5, 9)]


def _cube_mc_segments(v, inside, level, ascent):
    """Per-cube contour segments as (edge_a, edge_b) pairs (C++ logic)."""
    segs = []
    for f in range(6):
        fc, fe = _FACE_C[f], _FACE_E[f]
        m = sum(1 << i for i in range(4) if inside[fc[i]])
        if m in (0, 15):
            continue
        if m in (5, 10):
            center = (v[fc[0]] + v[fc[1]] + v[fc[2]] + v[fc[3]]) * 0.25
            cin = center > level if ascent else center < level
            j0 = 1 if (m == 5) == cin else 0
            segs.append((fe[(j0 + 3) & 3], fe[j0]))
            segs.append((fe[(j0 + 1) & 3], fe[(j0 + 2) & 3]))
            continue
        bits = [(m >> i) & 1 for i in range(4)]
        cnt = sum(bits)
        if cnt in (1, 3):
            want = 1 if cnt == 1 else 0
            k = [i for i in range(4) if bits[i] == want][0]
            segs.append((fe[(k + 3) & 3], fe[k]))
        else:
            k = [i for i in range(4) if bits[i] and bits[(i + 1) & 3]][0]
            segs.append((fe[(k + 3) & 3], fe[(k + 1) & 3]))
    return segs


def _chain_loops(segs):
    partner = {}
    for a, b in segs:
        partner.setdefault(a, []).append(b)
        partner.setdefault(b, []).append(a)
    used = set()
    loops = []
    for e0 in sorted(partner):
        if e0 in used:
            continue
        loop, prev, cur = [], -1, e0
        while len(loop) < 12:
            loop.append(cur)
            used.add(cur)
            nxt = (partner[cur][1] if partner[cur][0] == prev
                   else partner[cur][0])
            prev, cur = cur, nxt
            if cur == e0:
                break
        if len(loop) >= 3:
            loops.append(loop)
    return loops


def _mc_python_cubes_active(cube_idx, corner_vals, dims, level, spacing,
                            ascent, return_edges: bool = False):
    """Python mirror of the C++ 'cubes' method over an active-cube list.
    Returns (verts, faces, values) — values is the per-vertex edge-endpoint
    max (skimage `values` semantics, same rule as the C++ kernel).

    return_edges additionally returns the (ga, gb) grid-vertex pair of each
    mesh vertex's edge (for crossing-edge rank computation)."""
    nx, ny, nz = dims
    sp = np.asarray(spacing, np.float32)
    edge_map = {}
    verts = []
    vert_values = []
    faces = []
    edge_keys = []

    def coords(g):
        return np.asarray([g // (nz * ny), (g // nz) % ny, g % nz],
                          np.float32)

    def edge_vertex(ga, gb, va, vb):
        if ga > gb:
            ga, gb, va, vb = gb, ga, vb, va
        key = (ga, gb)
        if key in edge_map:
            return edge_map[key]
        # float32 throughout, bit-matching the C++ kernel
        va = np.float32(va)
        vb = np.float32(vb)
        t = ((np.float32(level) - va) / (vb - va) if vb != va
             else np.float32(0.5))
        t = min(max(t, np.float32(0.0)), np.float32(1.0))
        ca, cb = coords(ga), coords(gb)
        p = (ca + np.float32(t) * (cb - ca)) * sp
        edge_map[key] = len(verts)
        verts.append(p)
        vert_values.append(max(va, vb))
        edge_keys.append(key)
        return edge_map[key]

    corner_off = (CUBE_CORNERS[:, 0] * ny + CUBE_CORNERS[:, 1]) * nz \
        + CUBE_CORNERS[:, 2]
    for ci in range(len(cube_idx)):
        base = int(cube_idx[ci])
        if base < 0:
            continue
        v = corner_vals[ci]
        inside = [(v[c] > level if ascent else v[c] < level)
                  for c in range(8)]
        n_in = sum(inside)
        if n_in in (0, 8):
            continue
        segs = _cube_mc_segments(v, inside, level, ascent)
        ref = np.mean([coords(base + corner_off[c]) * sp
                       for c in range(8) if inside[c]], axis=0)
        for loop in _chain_loops(segs):
            vid = [edge_vertex(base + corner_off[_EDGE_C[e][0]],
                               base + corner_off[_EDGE_C[e][1]],
                               float(v[_EDGE_C[e][0]]),
                               float(v[_EDGE_C[e][1]])) for e in loop]
            for i in range(1, len(vid) - 1):
                a, b, c = vid[0], vid[i], vid[i + 1]
                if a == b or b == c or a == c:
                    continue
                pa, pb, pc = verts[a], verts[b], verts[c]
                n = np.cross(pb - pa, pc - pa)
                if np.dot(n, (pa + pb + pc) / 3 - ref) < 0:
                    b, c = c, b
                faces.append((a, b, c))

    if not verts:
        out = (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64),
               np.zeros((0,), np.float32))
        return out + ([],) if return_edges else out
    out = (np.asarray(verts, np.float32),
           np.asarray(faces, np.int64).reshape(-1, 3),
           np.asarray(vert_values, np.float32))
    return out + (edge_keys,) if return_edges else out


def _mc_python_cubes(vol, level, spacing, ascent):
    """Dense-volume wrapper over the python cubes method (fallback path)."""
    nx, ny, nz = vol.shape
    flat = np.ascontiguousarray(vol, np.float32).reshape(-1)
    inside = (flat > level) if ascent else (flat < level)
    gx, gy, gz = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                             np.arange(nz - 1), indexing="ij")
    base = ((gx * ny + gy) * nz + gz).reshape(-1)
    corner_off = (CUBE_CORNERS[:, 0] * ny + CUBE_CORNERS[:, 1]) * nz \
        + CUBE_CORNERS[:, 2]
    corners = base[:, None] + corner_off[None, :]
    b = inside[corners]
    active = b.any(1) & (~b).any(1)
    if not active.any():
        raise ValueError("no surface found at given iso level")
    return _mc_python_cubes_active(
        base[active].astype(np.int64), flat[corners[active]],
        (nx, ny, nz), level, spacing, ascent)


# ---------------------------------------------------------------------------
# numpy fallback for the tetrahedra method (vectorized over cubes)
# ---------------------------------------------------------------------------
_TETS = np.array([[0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
                  [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]])
_CORNERS = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]])


def _mc_numpy(vol, level, spacing, ascent):
    nx, ny, nz = vol.shape
    flat = vol.reshape(-1)
    inside = (flat > level) if ascent else (flat < level)
    gx, gy, gz = np.meshgrid(
        np.arange(nx - 1), np.arange(ny - 1), np.arange(nz - 1),
        indexing="ij")
    base = (gx * ny + gy) * nz + gz  # flat idx of cube origin
    base = base.reshape(-1)
    corner_off = (_CORNERS[:, 0] * ny + _CORNERS[:, 1]) * nz + _CORNERS[:, 2]

    edges = []  # (ga, gb) per triangle corner, triangles = len//3
    for tet in _TETS:
        g = base[:, None] + corner_off[tet][None, :]       # [Q,4]
        b = inside[g]                                       # [Q,4]
        code = b @ (1 << np.arange(4))
        n_in = b.sum(1)
        # single-corner cases (n_in 1 or 3)
        for apex in range(4):
            others = [i for i in range(4) if i != apex]
            for target in (1, 3):
                if target == 1:
                    sel = (n_in == 1) & b[:, apex]
                else:
                    sel = (n_in == 3) & ~b[:, apex]
                if not sel.any():
                    continue
                gs = g[sel]
                tri = np.stack([
                    np.stack([gs[:, apex], gs[:, o]], axis=1)
                    for o in others], axis=1)               # [S,3,2]
                edges.append(tri.reshape(-1, 2))
        # 2-in / 2-out
        import itertools
        for ins in itertools.combinations(range(4), 2):
            outs = tuple(i for i in range(4) if i not in ins)
            sel = (n_in == 2) & b[:, ins[0]] & b[:, ins[1]]
            if not sel.any():
                continue
            gs = g[sel]
            q00 = np.stack([gs[:, ins[0]], gs[:, outs[0]]], 1)
            q01 = np.stack([gs[:, ins[0]], gs[:, outs[1]]], 1)
            q11 = np.stack([gs[:, ins[1]], gs[:, outs[1]]], 1)
            q10 = np.stack([gs[:, ins[1]], gs[:, outs[0]]], 1)
            t1 = np.stack([q00, q01, q11], axis=1)
            t2 = np.stack([q00, q11, q10], axis=1)
            edges.append(t1.reshape(-1, 2))
            edges.append(t2.reshape(-1, 2))

    if not edges:
        raise ValueError("no surface found at given iso level")
    ee = np.concatenate(edges, axis=0)                      # [3T, 2]
    ee.sort(axis=1)
    key = ee[:, 0].astype(np.int64) * (nx * ny * nz) + ee[:, 1]
    uniq, faces_flat = np.unique(key, return_inverse=True)
    ga = (uniq // (nx * ny * nz)).astype(np.int64)
    gb = (uniq % (nx * ny * nz)).astype(np.int64)
    va, vb = flat[ga], flat[gb]
    denom = np.where(vb != va, vb - va, 1.0)
    t = np.clip((level - va) / denom, 0, 1)

    def coords(gidx):
        z = gidx % nz
        y = (gidx // nz) % ny
        x = gidx // (nz * ny)
        return np.stack([x, y, z], axis=-1).astype(np.float64)

    pa, pb = coords(ga), coords(gb)
    verts = (pa + t[:, None] * (pb - pa)) * np.asarray(spacing)
    faces = faces_flat.reshape(-1, 3).astype(np.int64)
    # drop degenerate triangles (two corners welded to the same vertex)
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
          & (faces[:, 0] != faces[:, 2]))
    values = np.maximum(va, vb).astype(np.float32)
    return verts.astype(np.float32), faces[ok], values


def _vertex_normals_from_gradient(vol, verts, spacing):
    """Per-vertex normals from the volume gradient (skimage convention)."""
    g = np.gradient(vol.astype(np.float64))
    idx = np.clip(
        np.round(verts / np.asarray(spacing)).astype(np.int64),
        0, np.asarray(vol.shape) - 1)
    n = np.stack([gi[idx[:, 0], idx[:, 1], idx[:, 2]] for gi in g], axis=1)
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    norm[norm == 0] = 1
    return (n / norm).astype(np.float32)


def marching_cubes(volume: np.ndarray, level: float,
                   spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
                   gradient_direction: str = "ascent",
                   method: str = "cubes",
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """skimage.measure.marching_cubes-compatible facade.

    method: 'cubes' (Lewiner-density, default), 'tetrahedra', or
    'trilinear' (trilinear-topology ambiguity resolution — asymptotic
    decider + interior tunnel test, the topology class skimage's Lewiner
    tables encode; C++ kernel only, used to measure the procedural
    deviation bound in docs/PARITY.md). Raises ValueError if `level` is
    outside the volume's value range (predict's NaN-sentinel protocol
    depends on this, predict.py:165-189).
    """
    volume = np.asarray(volume, np.float32)
    if not (volume.min() < level < volume.max()):
        raise ValueError(
            f"level {level} not within volume range "
            f"[{volume.min()}, {volume.max()}]")
    ascent = gradient_direction == "ascent"
    if _load_lib() is not None:
        verts, faces, values = _mc_native(
            volume, level, spacing, ascent, method)
    elif method == "cubes":
        verts, faces, values = _mc_python_cubes(
            volume, level, spacing, ascent)
    elif method == "trilinear":
        raise NotImplementedError(
            "method='trilinear' requires the C++ kernel (no toolchain "
            "found to build ops/cpp/marching.cpp)")
    else:
        verts, faces, values = _mc_numpy(volume, level, spacing, ascent)
    if len(verts) == 0:
        raise ValueError("no surface found at given iso level")
    normals = _vertex_normals_from_gradient(volume, verts, spacing)
    if ascent:
        normals = -normals  # skimage: normals point toward gradient descent
    return verts, faces, normals, values


def wnf_to_mesh(wnf_volume: np.ndarray, iso_surface_level: float = 0.5,
                gradient_threshold: float = 0.25, sigma: float = 0.5):
    """Standalone WNF -> surface-filtered mesh (reference
    common/marching_cubes_util.py:5-35, used by offline dataset generation):
    marching cubes at the iso level, then faces whose vertices fall below the
    smoothed gradient-magnitude threshold are dropped (open-boundary halo
    removal)."""
    import scipy.ndimage as ni
    volume_size = wnf_volume.shape[-1]
    wnf_ggm = ni.gaussian_gradient_magnitude(
        wnf_volume, sigma=sigma, mode="nearest")
    voxel_spacing = 1 / (volume_size - 1)
    mc_verts, mc_faces, _, _ = marching_cubes(
        wnf_volume, level=iso_surface_level, spacing=(voxel_spacing,) * 3,
        gradient_direction="ascent")
    nn_idx = np.clip((mc_verts / voxel_spacing).astype(np.int64), 0,
                     volume_size - 1)
    verts_ggm = wnf_ggm[nn_idx[:, 0], nn_idx[:, 1], nn_idx[:, 2]]
    return delete_invalid_verts(mc_verts, mc_faces,
                                verts_ggm > gradient_threshold)


def delete_invalid_verts(mc_verts, mc_faces, is_vert_on_surface):
    """Drop faces touching off-surface verts and reindex (reference
    common/marching_cubes_util.py:38-53)."""
    is_vert_on_surface = np.asarray(is_vert_on_surface, bool)
    is_face_valid = np.ones(len(mc_faces), dtype=bool)
    for i in range(3):
        is_face_valid &= is_vert_on_surface[mc_faces[:, i]]
    raw_valid_faces = mc_faces[is_face_valid]
    raw_valid_vert_idx = np.unique(raw_valid_faces.flatten())
    valid_verts = mc_verts[raw_valid_vert_idx]
    remap = np.zeros(len(mc_verts), dtype=mc_faces.dtype)
    remap[raw_valid_vert_idx] = np.arange(
        len(valid_verts), dtype=mc_faces.dtype)
    return valid_verts, remap[raw_valid_faces]
