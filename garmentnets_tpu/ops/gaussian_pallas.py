"""Fused Pallas Gaussian gradient magnitude: one pass over the volume.

The XLA ggm (ops/gaussian.py) computes 3 directional responses as
separable shifted-sum convolutions; XLA fuses the taps of each 1D pass
but materializes every pass boundary, so the volume crosses HBM ~8
times (~8.5 GB/batch at 128^3 B=8 — the measured ~9 ms is already at
the bandwidth roof FOR THAT STRUCTURE). This kernel computes all three
responses and the final sqrt-of-sum-of-squares inside VMEM per D-slab
tile: HBM sees the halo'd volume in (~1.5x) and the magnitude out (1x).

Semantics match scipy.ndimage.gaussian_gradient_magnitude with
mode='nearest' exactly like the XLA path (same _gaussian_kernel1d taps,
edge-replicate borders); exactness is tested against both.

Selection: gaussian_gradient_magnitude(backend=...) or
GARMENTNETS_GGM={xla,pallas,auto}; 'auto' (the default) probe-picks
this kernel where it compiles (verified on chip,
tests/test_hw_chip.py::test_fused_ggm_on_chip; measured 9.4 -> 3.9 ms
at 128^3 B=8). The Pallas path is single-device (the predict engine
keeps XLA when running mesh-sharded — a pallas_call inside a
GSPMD-partitioned jit cannot be split by the partitioner).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from garmentnets_tpu.ops.gaussian import _gaussian_kernel1d


def _edge_pad(x, r: int, axis: int):
    """Edge-replicate pad by r on both sides of `axis` (in-kernel safe:
    static concats of repeated edge slices)."""
    sl_lo = [slice(None)] * x.ndim
    sl_lo[axis] = slice(0, 1)
    sl_hi = [slice(None)] * x.ndim
    sl_hi[axis] = slice(x.shape[axis] - 1, x.shape[axis])
    lo = jnp.concatenate([x[tuple(sl_lo)]] * r, axis=axis)
    hi = jnp.concatenate([x[tuple(sl_hi)]] * r, axis=axis)
    return jnp.concatenate([lo, x, hi], axis=axis)


def _conv_reduce(x, taps, axis: int, n_out: int):
    """Correlate along `axis` with static taps, producing n_out samples
    (input must carry n_out + len(taps) - 1 samples on that axis)."""
    out = None
    for i, w in enumerate(taps):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + n_out)
        term = jnp.asarray(w, x.dtype) * x[tuple(sl)]
        out = term if out is None else out + term
    return out


def _vmem_model(TD: int, TH: int, W: int, r: int) -> int:
    """Worst-case live VMEM bytes for one (TD, TH) tile of the fused ggm
    kernel: the W-padded window (plus Mosaic's concat copy), three
    directional conv chains, and the accumulator. Mosaic's measured
    stack allocation runs ~1.6x this sum (44.4 MB observed at 256^3 vs
    a 27.7 MB model), so _pick_ggm_tiles budgets at half the 16 MB
    scoped-vmem limit."""
    e = 2 * (TD + 2 * r) * (TH + 2 * r) * (W + 2 * r)
    e += 3 * (TD * (TH + 2 * r) * (W + 2 * r)
              + TD * TH * (W + 2 * r) + TD * TH * W)
    e += TD * TH * W
    return 4 * e


def _pick_ggm_tiles(D: int, H: int, W: int, r: int) -> tuple:
    """(TD, TH): largest D/H tile whose modeled live set fits the VMEM
    budget. At 128^3 this picks (8, 128) — the full-H slab the kernel
    always used; at 256^3 the full-H slab's Mosaic stack measured 44.4 MB
    against the 16 MB scoped limit (the round-3 on-chip OOM), so H tiles
    too. The tiny-shape availability probe can't catch shape-dependent
    OOM, which is why the tiling must adapt rather than the dispatch."""
    budget = 8_000_000
    for td in (8, 4, 2, 1):
        if D % td:
            continue
        for th in (H, 256, 128, 64, 32, 16, 8):
            if th > H or H % th:
                continue
            if _vmem_model(td, th, W, r) <= budget:
                return td, th
    return 1, min(H, 8)


def ggm_pallas(volume: jax.Array, sigma: float, truncate: float = 4.0,
               interpret: bool = False) -> jax.Array:
    """volume: [B, S, S, S] -> |grad| [B, S, S, S] (scipy 'nearest')."""
    B, D, H, W = volume.shape
    r = int(truncate * sigma + 0.5)
    k0 = tuple(float(v) for v in _gaussian_kernel1d(sigma, 0, r))
    k1 = tuple(float(v) for v in _gaussian_kernel1d(sigma, 1, r))

    TD, TH = _pick_ggm_tiles(D, H, W, r)
    n_dt, n_ht = D // TD, H // TH

    # D- and H-axis halo windows, edge-replicated at the volume boundary
    # (XLA pre-gather; ~(TD+2r)/TD x (TH+2r)/TH x the volume, read once
    # per tile). Interior tiles take true neighbor values through the
    # pad-then-slice, so only physical borders replicate.
    zpad = jnp.pad(volume, [(0, 0), (r, r), (r, r), (0, 0)], mode="edge")
    win = jnp.stack([
        jax.lax.dynamic_slice_in_dim(zpad, i * TD, TD + 2 * r, axis=1)
        for i in range(n_dt)], axis=1)       # [B, n_dt, D+2r->TD+2r, H+2r, W]
    win = jnp.stack([
        jax.lax.dynamic_slice_in_dim(win, j * TH, TH + 2 * r, axis=3)
        for j in range(n_ht)], axis=2)    # [B, n_dt, n_ht, TD+2r, TH+2r, W]

    def kernel(win_ref, out_ref):
        v = win_ref[0, 0, 0]                   # [TD+2r, TH+2r, W]
        vp = _edge_pad(v, r, 2)                # [TD+2r, TH+2r, W+2r]
        acc = None
        for d_axis in range(3):
            g = vp
            # conv D first (reduces the halo axis), then H, then W —
            # same kernels/axis assignment as the XLA path
            g = _conv_reduce(g, k1 if d_axis == 0 else k0, 0, TD)
            g = _conv_reduce(g, k1 if d_axis == 1 else k0, 1, TH)
            g = _conv_reduce(g, k1 if d_axis == 2 else k0, 2, W)
            acc = g * g if acc is None else acc + g * g
        out_ref[0] = jnp.sqrt(acc)

    grid_spec = pl.GridSpec(
        grid=(B, n_dt, n_ht),
        in_specs=[pl.BlockSpec((1, 1, 1, TD + 2 * r, TH + 2 * r, W),
                               lambda b, i, j: (b, i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TD, TH, W),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
    )
    taps = 2 * r + 1
    cost = pl.CostEstimate(
        flops=2 * B * D * H * W * 3 * 3 * taps,
        bytes_accessed=win.nbytes + volume.nbytes,
        transcendentals=B * D * H * W)  # sqrt
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D, H, W), volume.dtype),
        cost_estimate=cost, interpret=interpret,
    )(win)


@functools.lru_cache(maxsize=1)
def ggm_pallas_available() -> tuple:
    """(ok, reason): probe-compile a tiny fused ggm on the default backend
    (drives the 'auto' dispatch in ops/gaussian, mirroring
    dense_decode_pallas.fused_decode_available). Genuine can't-compile
    failures cache for the process lifetime; transient device errors clear
    the cache so a later 'auto' dispatch re-probes. Runs on a fresh
    thread (ops/probe.run_outside_trace) because the first 'auto'
    dispatch happens at trace time inside the jitted engine — there a
    nested jit returns an ambient-trace tracer, np.asarray raises, and a
    bogus "can't compile" is cached (see fused_decode_available)."""
    from garmentnets_tpu.ops.probe import run_outside_trace
    try:
        vol_host = np.random.RandomState(0).rand(1, 8, 8, 8)

        def body():
            vol = jnp.asarray(vol_host, jnp.float32)
            return np.asarray(jax.jit(lambda v: ggm_pallas(v, 0.5))(vol))

        run_outside_trace(body)
        return True, ""
    except Exception as e:  # noqa: BLE001 — any backend failure
        msg = repr(e)
        if any(s in msg for s in
               ("UNAVAILABLE", "Unable to initialize", "DEADLINE")):
            ggm_pallas_available.cache_clear()
        return False, msg
