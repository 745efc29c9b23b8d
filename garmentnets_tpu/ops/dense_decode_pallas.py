"""Fused Pallas dense-lattice decode: upsample + MLP chain in VMEM.

The XLA dense decode (ops/dense_decode.py) is HBM-bound at production
shapes: between the W-axis upsample matmul and the MLP matmuls, two
[B, slab, S, S, C] f32 intermediates (~1 GB each at 128^3/B=8/slab=8)
are materialized per slab — XLA fuses elementwise work into matmuls but
never matmul->matmul, so the decode pays ~4 reads+writes of the fine
lattice activations (~68 GB/batch, ~83 ms at v5e HBM bandwidth) for
~2.6 TFLOP of math. This kernel keeps the whole per-tile chain —
trilinear upsample (exact f32 VPU weighted sums), the post-upsample
affine, every hidden matmul (MXU), and the scalar output head (VPU
reduction) — in VMEM, so HBM sees only the coarse pre-activations in
and the final [B, S, S, S] field out.

Grid: (B, S/TD d-tiles, S/TH h-tiles); each step computes an output
tile [TD, TH, S] from a [wd, Hc, Wc, C1] window of the coarse volume
(pre-gathered per d-tile so BlockSpecs stay regular; the window block is
constant across the inner h-tile grid axis, so Mosaic skips the recopy).

Semantics are identical to ops/dense_decode.dense_decode (same
align_corners interp plan, same eval-mode g*relu(h@K+b)+s layer form,
reference components/gridding.py:45-98 + components/mlp.py:9-20);
exactness is tested in interpret mode against the XLA path. Interp
weighted sums here are exact f32 (the XLA path applies the matmul
`precision` to them), so at matched matmul precision the fused kernel
is at least as accurate.

Selection: dense_decode(backend=...) or GARMENTNETS_DENSE_DECODE=
{xla,pallas}; see ops/dense_decode.dense_decode.
"""
from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from garmentnets_tpu.ops.dense_decode import _slab_plan, interp_matrix


def _pick_tiles(S: int) -> tuple:
    """Output-tile shape (TD, TH): ~4096 rows per MXU matmul (the full
    W axis of S lanes is always in the tile), bounded so VMEM holds two
    [TD*TH*S, C] f32 activation buffers plus the window at C=256.
    GARMENTNETS_DECODE_TILE=TDxTH overrides for on-chip tuning (both
    must divide S)."""
    import os
    forced = os.environ.get("GARMENTNETS_DECODE_TILE")
    if forced:
        td, th = (int(v) for v in forced.lower().split("x"))
        if td <= 0 or th <= 0 or S % td or S % th:
            raise ValueError(
                f"GARMENTNETS_DECODE_TILE={forced!r}: both factors must be "
                f"positive divisors of the volume size {S} (a silently "
                "ignored override would corrupt a tuning sweep)")
        return td, th
    TD = next((t for t in (4, 2, 1) if S % t == 0), 1)
    target_rows = 4096
    TH = max(1, min(S, target_rows // max(TD * S, 1)))
    while TH > 1 and S % TH != 0:
        TH -= 1
    return TD, TH


def decode_tiles_pallas(zwin, wdw, h0s, whw, www, mids, kl_t, affl,
                        aff0, *, S: int, TD: int, TH: int,
                        mm_precision, interpret: bool = False):
    """pallas_call wrapper over pre-planned inputs (see dense_decode_fused).

    zwin: [B, n_dt, wd, Hc, Wc, C1] pre-gathered coarse windows
    wdw:  [n_dt, TD, wd]   D-axis interp weights per d-tile
    h0s:  [n_ht] i32       H-axis source-window starts (SMEM)
    whw:  [n_ht, TH, wh]   H-axis interp weights per h-tile
    www:  [S, Wc]          W-axis interp matrix (full)
    mids: flat sequence (K, b, g, s) per HIDDEN layer (each [C,C]/[C])
    kl_t: [O, C_last]      final-layer kernel, transposed
    affl: [3, O]           final-layer (b, g, s) rows
    aff0: [2, C1]          post-upsample (g0, s0) rows
    """
    B, n_dt, wd, Hc, Wc, C1 = zwin.shape
    n_ht = h0s.shape[0]
    wh = whw.shape[2]
    O = kl_t.shape[0]
    n_mid = len(mids) // 4
    # output spatial extents: D/H come from the tile counts (under spatial
    # sharding each shard owns a contiguous strip of d-tiles, so the local
    # D extent is n_dt*TD < S); W is always the full S lattice
    SD, SH = n_dt * TD, n_ht * TH

    def kernel(*refs):
        (zwin_ref, wdw_ref, h0s_ref, whw_ref, www_ref, *rest) = refs
        mid_refs = rest[:4 * n_mid]
        kl_ref, affl_ref, aff0_ref, out_ref = rest[4 * n_mid:]

        j = pl.program_id(2)
        h0 = h0s_ref[j]
        # H-window first (wh slices), then the D/H weighted sums (VPU,
        # exact f32; each window is 2-3 taps)
        zw = zwin_ref[0, 0, :, pl.ds(h0, wh)]        # [wd, wh, Wc, C1]
        wdw_t = wdw_ref[0]                           # [TD, wd]
        whw_t = whw_ref[0]                           # [TH, wh]
        zd = jnp.zeros((TD, wh, Wc, C1), jnp.float32)
        for k in range(wd):
            zd = zd + wdw_t[:, k][:, None, None, None] * zw[k][None]
        zh = jnp.zeros((TD, TH, Wc, C1), jnp.float32)
        for k in range(wh):
            zh = zh + whw_t[:, k][None, :, None, None] * zd[:, k][:, None]
        # W-axis upsample as one MXU matmul: [S, Wc] @ [Wc, TD*TH*C1]
        zh_t = jnp.transpose(zh, (2, 0, 1, 3)).reshape(Wc, TD * TH * C1)
        h = jnp.dot(www_ref[:], zh_t, precision=mm_precision,
                    preferred_element_type=jnp.float32)
        h = h.reshape(S * TD * TH, C1)               # rows: (w, td, th)
        a = jax.nn.relu(h) * aff0_ref[0][None, :] + aff0_ref[1][None, :]
        for li in range(n_mid):
            k_ref, b_ref, g_ref, s_ref = mid_refs[4 * li:4 * li + 4]
            h = jnp.dot(a, k_ref[:], precision=mm_precision,
                        preferred_element_type=jnp.float32) + b_ref[0]
            a = jax.nn.relu(h) * g_ref[0][None, :] + s_ref[0][None, :]
        # scalar head on the VPU (an MXU matmul at N=O<=8 would burn a
        # full 128-lane pass); per output channel: mul-broadcast + lane
        # reduction, then the final affine. Assembled so no value ever
        # lives in a lane-1 layout: [S, TD*TH] -> transpose -> S in lanes.
        a3 = a.reshape(S, TD * TH, a.shape[-1])
        outs = []
        for o in range(O):
            h3 = jnp.sum(a3 * kl_ref[o][None, None, :], axis=-1)  # [S,TDTH]
            v = (jax.nn.relu(h3 + affl_ref[0, o]) * affl_ref[1, o]
                 + affl_ref[2, o])
            outs.append(jnp.transpose(v, (1, 0)).reshape(TD, TH, S))
        if O == 1:
            out_ref[0] = outs[0]                     # [TD, TH, S], S lanes
        else:
            out_ref[0] = jnp.stack(outs, axis=-1)    # [TD, TH, S, O]

    mid_specs = []
    for li in range(n_mid):
        C_in, C_out = mids[4 * li].shape
        mid_specs += [
            pl.BlockSpec((C_in, C_out), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C_out), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C_out), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C_out), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    grid_spec = pl.GridSpec(
        grid=(B, n_dt, n_ht),
        in_specs=[
            pl.BlockSpec((1, 1, wd, Hc, Wc, C1),
                         lambda b, i, j: (b, i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TD, wd), lambda b, i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TH, wh), lambda b, i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, Wc), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            *mid_specs,
            pl.BlockSpec((O, kl_t.shape[1]), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, O), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C1), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, TD, TH, S),
                                lambda b, i, j: (b, i, j, 0),
                                memory_space=pltpu.VMEM)
                   if O == 1 else
                   pl.BlockSpec((1, TD, TH, S, O),
                                lambda b, i, j: (b, i, j, 0, 0),
                                memory_space=pltpu.VMEM)),
    )
    n_rows = S * TD * TH
    C_mid = mids[0].shape[0] if n_mid else C1
    cost = pl.CostEstimate(
        flops=2 * B * n_dt * n_ht * n_rows * (
            Wc * C1 // (TD * TH)  # W-stage amortized per row
            + sum(mids[4 * li].shape[0] * mids[4 * li].shape[1]
                  for li in range(n_mid)) + C_mid * O),
        bytes_accessed=zwin.nbytes + B * S * S * S * O * 4,
        transcendentals=0)
    out_dims = (B, SD, SH, S) if O == 1 else (B, SD, SH, S, O)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_dims, jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
    )(zwin, wdw, h0s, whw, www, *mids, kl_t, affl, aff0)


def dense_decode_fused(feature_volume: jax.Array, layers,
                       volume_size: int, precision=None,
                       interpret: bool = False,
                       mesh=None, space_axis: str = "space") -> jax.Array:
    """Drop-in fused equivalent of ops/dense_decode.dense_decode.
    feature_volume: [B, D, H, W, C]; layers from eval_layers(). Returns
    [B, S, S, S] (scalar head) or [..., O].

    With a mesh carrying `space_axis`, the d-tile axis is shard_map'ed
    over it (each device runs the fused kernel on its contiguous strip of
    d-tiles — the Pallas form of the XLA path's slab sharding, SURVEY.md
    §2.5 model-sharding row), composed with batch DP on a 'data' axis
    when it divides B."""
    B, D, Hc, Wc, C = feature_volume.shape
    S = volume_size
    TD, TH = _pick_tiles(S)
    assert S % TD == 0 and S % TH == 0

    # coarse first layer (commutes with interpolation; see dense_decode)
    k0, b0, g0, s0 = [jnp.asarray(a) for a in layers[0]]
    z = jnp.einsum("bdhwc,co->bdhwo", feature_volume, k0,
                   precision=precision) + b0
    C1 = z.shape[-1]

    # per-tile interp plans (the D plan is _slab_plan with slab=TD)
    d0, wdw, wd = _slab_plan(S, D, TD)
    h0, whw, wh = _slab_plan(S, Hc, TH)
    www = interp_matrix(S, Wc)
    n_dt = S // TD

    # pre-gather the per-d-tile coarse windows so kernel BlockSpecs are
    # regular ([B, n_dt, wd, Hc, Wc, C1]; ~2x the coarse volume, read
    # once per d-tile and held across the inner h-tile axis)
    zwin = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(z, int(d0[i]), wd, axis=1)
         for i in range(n_dt)], axis=1)

    mids = []
    for (k, b, g, s) in layers[1:-1]:
        mids += [jnp.asarray(k, jnp.float32),
                 jnp.asarray(b, jnp.float32).reshape(1, -1),
                 jnp.asarray(g, jnp.float32).reshape(1, -1),
                 jnp.asarray(s, jnp.float32).reshape(1, -1)]
    kl, bl, gl, sl = layers[-1]
    kl_t = jnp.asarray(kl, jnp.float32).T                     # [O, C_last]
    affl = jnp.stack([jnp.asarray(bl, jnp.float32),
                      jnp.asarray(gl, jnp.float32),
                      jnp.asarray(sl, jnp.float32)])          # [3, O]
    aff0 = jnp.stack([jnp.asarray(g0, jnp.float32),
                      jnp.asarray(s0, jnp.float32)])          # [2, C1]
    O = kl_t.shape[0]

    mm_precision = precision if precision is not None else (
        jax.lax.Precision.HIGHEST)
    h0 = jnp.asarray(h0, jnp.int32)
    whw = jnp.asarray(whw)
    www = jnp.asarray(www)
    mids = tuple(mids)
    run = functools.partial(
        decode_tiles_pallas, S=S, TD=TD, TH=TH,
        mm_precision=mm_precision, interpret=interpret)

    if mesh is not None:
        # ANY mesh goes through shard_map: a pallas_call inside a plain
        # GSPMD-partitioned jit is an opaque custom call the partitioner
        # can't split, so even the batch-DP-only ("data",) mesh needs the
        # explicit per-shard formulation.
        try:
            from jax import shard_map          # jax >= 0.4.35
        except ImportError:                    # pragma: no cover
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        has_space = space_axis in mesh.axis_names
        n_space = mesh.shape[space_axis] if has_space else 1
        space = space_axis if has_space else None
        assert n_dt % n_space == 0, (
            f"{n_dt} d-tiles must divide over the {n_space}-way "
            f"'{space_axis}' mesh axis")
        data_axis = next(
            (a for a in mesh.axis_names if a != space_axis and B > 1
             and B % mesh.shape[a] == 0), None)
        rep = P()

        def shard_run(zwin_s, wdw_s, h0_s, whw_s, www_s, kl_s, affl_s,
                      aff0_s, *mids_s):
            return run(zwin_s, wdw_s, h0_s, whw_s, www_s, tuple(mids_s),
                       kl_s, affl_s, aff0_s)

        out = shard_map(
            shard_run, mesh=mesh,
            in_specs=(P(data_axis, space), P(space), rep, rep,
                      rep, rep, rep, rep) + (rep,) * len(mids),
            out_specs=P(data_axis, space),
            # pallas_call carries no varying-mesh-axes metadata; shapes
            # are already per-shard correct, so skip the vma check
            check_vma=False)(
                zwin, wdw, h0, whw, www, kl_t, affl, aff0, *mids)
    else:
        out = run(zwin, wdw, h0, whw, www, mids, kl_t, affl, aff0)
    # O == 1 already comes back squeezed ([B, S, S, S]) — the kernel emits
    # the scalar head with S in the lane dimension, never a lane-1 layout
    return out


@functools.lru_cache(maxsize=1)
def fused_decode_available() -> tuple:
    """(ok, reason): probe-compile a tiny fused decode on the default
    backend. Mirrors ops/pointcloud's Pallas FPS autodetect; failures are
    recorded (not swallowed) so a silent fallback is diagnosable.

    Genuine can't-compile failures are cached for the process lifetime;
    TRANSIENT device errors (backend init / UNAVAILABLE — e.g. this
    host's axon tunnel wedge) clear the cache before returning so a later
    'auto' dispatch re-probes once the device recovers."""
    try:
        rs = np.random.RandomState(0)
        layers = [
            (rs.rand(4, 8).astype(np.float32) - 0.5,
             rs.rand(8).astype(np.float32),
             np.ones(8, np.float32), np.zeros(8, np.float32)),
            (rs.rand(8, 8).astype(np.float32) - 0.5,
             rs.rand(8).astype(np.float32),
             np.ones(8, np.float32), np.zeros(8, np.float32)),
            (rs.rand(8, 1).astype(np.float32) - 0.5,
             rs.rand(1).astype(np.float32),
             np.ones(1, np.float32), np.zeros(1, np.float32)),
        ]
        fv = jnp.asarray(rs.rand(1, 4, 4, 4, 4), jnp.float32)
        np.asarray(jax.jit(
            lambda v: dense_decode_fused(v, layers, 8))(fv))
        return True, ""
    except Exception as e:  # noqa: BLE001 — any backend failure
        msg = repr(e)
        if any(s in msg for s in
               ("UNAVAILABLE", "Unable to initialize", "DEADLINE")):
            fused_decode_available.cache_clear()
        return False, msg
