"""Dense-lattice implicit decoding: separable interpolation as MXU matmuls.

The predict path evaluates the implicit WNF decoder on the FULL volume_size^3
voxel-center lattice (reference predict.py:145-156). Gather-based trilinear
sampling is the wrong tool on TPU (measured ~45 ms per 32k queries — gathers
don't tile onto the MXU). For a *regular lattice*, trilinear interpolation is
separable: one [S_out, S_in] linear-interpolation matrix per axis, applied as
three tensor contractions — pure MXU work.

Two further algebraic moves:
- the decoder's first affine layer commutes with interpolation (trilinear
  weights sum to 1, so affine maps pass through), so Dense_0 runs at the
  coarse 32^3 grid before upsampling — removing the widest matmul from the
  fine lattice;
- the fine lattice is processed in D-axis slabs under lax.map so peak
  activation memory stays bounded at any volume size (256^3 stretch incl.).

Exactness: matches grid_sample_trilinear + PointMLP(eval) on lattice queries
to fp32 rounding (tested), i.e. full parity with the reference's
align_corners grid_sample + Lin/ReLU/BN decoder semantics.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def interp_matrix(s_out: int, s_in: int, dtype=np.float32) -> np.ndarray:
    """[s_out, s_in] align_corners linear interpolation weights."""
    w = np.zeros((s_out, s_in), dtype)
    if s_out == 1:
        w[0, 0] = 1
        return w
    pos = np.arange(s_out) * (s_in - 1) / max(s_out - 1, 1)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, s_in - 1)
    hi = np.minimum(lo + 1, s_in - 1)
    f = (pos - lo).astype(dtype)
    w[np.arange(s_out), lo] += 1 - f
    w[np.arange(s_out), hi] += f
    return w


def eval_layers(mlp_params: dict, mlp_batch_stats: dict,
                epsilon: float = 1e-5
                ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray,
                                np.ndarray]]:
    """PointMLP eval-mode layers as (K, b, g, s): h -> g*relu(h@K+b)+s.

    The reference MLP applies Lin -> ReLU -> BatchNorm for EVERY layer
    including the final output (components/mlp.py:9-20); in eval mode the BN
    is the affine (g, s) with g = scale/rsqrt(var+eps), s = bias - mean*g.
    Layers without BN get identity (g=1, s=0).
    """
    layers = []
    i = 0
    while f"dense_{i}" in mlp_params:
        k = np.asarray(mlp_params[f"dense_{i}"]["kernel"], np.float32)
        b = np.asarray(mlp_params[f"dense_{i}"]["bias"], np.float32)
        if f"bn_{i}" in mlp_params:
            scale = np.asarray(mlp_params[f"bn_{i}"]["scale"], np.float32)
            bias = np.asarray(mlp_params[f"bn_{i}"]["bias"], np.float32)
            mean = np.asarray(mlp_batch_stats[f"bn_{i}"]["mean"], np.float32)
            var = np.asarray(mlp_batch_stats[f"bn_{i}"]["var"], np.float32)
            g = scale / np.sqrt(var + epsilon)
            s = bias - mean * g
        else:
            g = np.ones(k.shape[1], np.float32)
            s = np.zeros(k.shape[1], np.float32)
        layers.append((k, b, g, s))
        i += 1
    assert layers, "no dense layers found"
    return layers


def _slab_plan(S: int, D: int, slab: int):
    """Per-slab D-axis interpolation plan: each output slice interpolates
    exactly 2 adjacent source slices, so a slab of `slab` output slices only
    needs a `win`-wide contiguous source window. Returns
    (d0 [n_slabs] i32 window starts, w_win [n_slabs, slab, win] f32 weights,
    win)."""
    n_slabs = S // slab
    pos = np.arange(S) * (D - 1) / max(S - 1, 1)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, D - 2)  # pair base
    frac = (pos - lo).astype(np.float32)
    slab_base = lo.reshape(n_slabs, slab)
    # per-slab source window [d0, d0+win); width = max pair spread + 1
    d0 = slab_base.min(axis=1)
    win = int((slab_base.max(axis=1) + 1 - d0).max()) + 1
    d0 = np.minimum(d0, D - win)
    # per-output-slice weights over the window
    w_win = np.zeros((n_slabs, slab, win), np.float32)
    for i in range(n_slabs):
        for j in range(slab):
            off = slab_base[i, j] - d0[i]
            w_win[i, j, off] += 1 - frac[i * slab + j]
            w_win[i, j, off + 1] += frac[i * slab + j]
    return d0.astype(np.int32), w_win, win


def dense_decode(feature_volume: jax.Array, layers, volume_size: int,
                 slab: int = 4, precision=None,
                 mesh=None, space_axis: str = "space",
                 backend: str | None = None) -> jax.Array:
    """Evaluate an eval-mode PointMLP head on the dense lattice.

    feature_volume: [B, D, H, W, C]; layers: from eval_layers().
    Returns [B, S, S, S] when the head is scalar, else [B, S, S, S, C_out].

    Spatial sharding (SURVEY.md §2.5 model-sharding row; the TPU-native form
    of the reference's host-side ArraySlicer chunk loop, predict.py:147-156):
    when `mesh` has an axis named `space_axis`, the D-axis slab loop is
    shard_map'ed over it — each device runs lax.map over its own contiguous
    chunk of slabs against the (small, replicated-over-space) coarse volume.
    This is how a 256^3 decode scales past one chip when the batch axis alone
    can't fill the mesh: a ("data", "space") mesh composes batch DP with
    slab SP, and collectives stay on ICI. The coarse `z` volume is only
    B x 32^3 x C, so replicating it across the space axis costs ~nothing
    next to the fine-lattice matmuls it unlocks.
    """
    B, D, H, W, C = feature_volume.shape
    S = volume_size

    # backend dispatch: 'xla' (this slab path; works everywhere),
    # 'pallas' (ops/dense_decode_pallas — fused VMEM kernel; shard_maps
    # itself over any mesh), or 'auto' (probe-select pallas where it
    # compiles, mirroring the Pallas-FPS autodetect). Default 'auto':
    # the fused kernel measured faster at EVERY precision tier on a real
    # v5e (tools/bench_encode.py, 128^3/B=8: HIGHEST 110 vs 136 ms,
    # HIGH 60 vs 92, DEFAULT 27 vs 47) and the probe falls back to XLA
    # wherever Mosaic can't compile (e.g. CPU test meshes).
    # GARMENTNETS_DENSE_DECODE selects globally; explicit `backend` wins.
    import os
    backend = backend or os.environ.get("GARMENTNETS_DENSE_DECODE", "auto")
    if backend == "auto":
        from garmentnets_tpu.ops.dense_decode_pallas import (
            fused_decode_available)
        backend = "pallas" if fused_decode_available()[0] else "xla"
    if backend not in ("xla", "pallas"):
        raise ValueError(
            f"unknown dense-decode backend {backend!r} "
            "(expected 'xla', 'pallas', or 'auto')")
    if backend == "pallas":
        from garmentnets_tpu.ops.dense_decode_pallas import (
            dense_decode_fused)
        return dense_decode_fused(feature_volume, layers, volume_size,
                                  precision=precision, mesh=mesh,
                                  space_axis=space_axis)

    layers = [tuple(jnp.asarray(a) for a in lay) for lay in layers]

    # first affine at the coarse grid (commutes with interpolation)
    k0, b0, g0, s0 = layers[0]
    z = jnp.einsum("bdhwc,co->bdhwo", feature_volume, k0,
                   precision=precision) + b0
    wh = jnp.asarray(interp_matrix(S, H))
    ww = jnp.asarray(interp_matrix(S, W))

    # D-axis upsample in slabs: H/W upsampling also happens inside the slab
    # loop, so the only materialized fine-lattice tensors are one slab wide
    # (peak memory O(B*slab*S^2*C) — the 256^3 stretch fits on one chip).
    assert S % slab == 0
    n_slabs = S // slab
    d0, w_win, win = _slab_plan(S, D, slab)
    d0 = jnp.asarray(d0)
    w_win = jnp.asarray(w_win)

    def slab_chunk(z_full, d0_c, w_win_c):
        """lax.map over a chunk of slabs -> [n_chunk, B, slab, S, S, O]."""
        def do_slab(args):
            d_start, w_slab = args
            zz = jax.lax.dynamic_slice_in_dim(z_full, d_start, win, axis=1)
            h = jnp.einsum("sd,bdhwc->bshwc", w_slab, zz,
                           precision=precision)
            h = jnp.einsum("oh,bshwc->bsowc", wh, h, precision=precision)
            h = jnp.einsum("ow,bshwc->bshoc", ww, h, precision=precision)
            h = jax.nn.relu(h) * g0 + s0
            for (k, b, g, s) in layers[1:]:
                h = jnp.einsum("bshwc,co->bshwo", h, k,
                               precision=precision) + b
                h = jax.nn.relu(h) * g + s
            return h
        return jax.lax.map(do_slab, (d0_c, w_win_c))

    if mesh is not None and space_axis in mesh.axis_names:
        try:
            from jax import shard_map          # jax >= 0.4.35
        except ImportError:                    # pragma: no cover
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        n_space = mesh.shape[space_axis]
        assert n_slabs % n_space == 0, (
            f"S/slab = {n_slabs} slabs must divide over the {n_space}-way "
            f"'{space_axis}' mesh axis")
        data_axis = next(
            (a for a in mesh.axis_names if a != space_axis and B > 1
             and B % mesh.shape[a] == 0), None)
        z_spec = P(data_axis) if data_axis else P()
        out = shard_map(
            slab_chunk, mesh=mesh,
            in_specs=(z_spec, P(space_axis), P(space_axis)),
            out_specs=P(space_axis, data_axis))(z, d0, w_win)
    else:
        out = slab_chunk(z, d0, w_win)           # [S/slab, B, slab, S, S, O]
    out = jnp.moveaxis(out, 0, 1).reshape(B, S, S, S, -1)
    if out.shape[-1] == 1:
        out = out[..., 0]
    return out
