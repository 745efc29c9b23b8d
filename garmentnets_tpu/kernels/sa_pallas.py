"""Fused Pallas SA kernel: PointConv MLP chain + max-over-K in VMEM.

Stage-1's set-abstraction path is the largest remaining speed-of-light gap
on the predict encode program (VERDICT r3 weak #5 / task #2): after the
decode/ggm fusions, SA neighbor gathers + conv-MLPs measure ~24 ms of the
151.7 ms encode at 128^3/B=8 (docs/PERF.md). Reference semantics:
components/pointnet2.py:11-33 — PointNetConv = MLP over concat(x_j,
p_j - p_i) followed by max over the <=K ball neighbors.

Work split, measured on the chip (2026-08-19):

- The neighbor GATHER stays in XLA. Its row-gather path costs ~11.6 ms at
  SA1 for the combined [x | pos] formulation (tools/bench_gather.py) —
  close to its indirection floor. An earlier design of this kernel pulled
  the gather into VMEM as a chunked lane-wise `tpu.dynamic_gather` with
  per-source-chunk selects; it compiled but measured 79.7 ms for SA1
  against XLA's 34.5 ms standalone — the (N/128)-pass select structure
  multiplies vreg work ~47x at N=6000 and the VPU gather issues nowhere
  near 1 op/cycle. Dead end, deleted.
- The MLP chain + masked max is what Pallas fuses. XLA materializes every
  [B, M, K, C] activation between layers in HBM (~3 GB of write+read at
  SA1) and can't keep the small-C matmuls weights-stationary. The kernel
  runs the whole eval-mode chain (BN folded, h -> relu(h@W + b)*g + s,
  identical folding to ops/dense_decode.eval_layers) on [TM, C] row tiles
  in VMEM, with K innermost in the grid and the max accumulated into the
  revisited output block — activations never touch HBM.

Layout: the gathered tensor is built k-major ([B, K, Mp, C], a free
transpose of the gather INDEX, not of the data), so each grid step
(b, m-tile, k) reads one contiguous [TM, C] row block; rows sit in
SUBLANES, channels in LANES (matmul rhs = [C_in, C_out] weights). The
ball-query mask never enters the kernel: invalid slots' indices are
substituted with a valid slot's index of the same row (sa_fused
pre-pass), so they score a duplicate of a valid neighbor and the plain
max equals the masked max.

MEASURED OUTCOME (2026-08-19, real chip, scalar-sync timing): SA1 fused
17.3 ms vs XLA 14.6, SA2 9.9 vs 7.5 — the fusion does NOT pay on this
hardware. The stage is gather-bound; XLA's post-gather chain is only
~3 ms, and the kernel's HBM round trip for the gathered k-major tensor
costs more than skipping XLA's inter-layer materializations saves. The
kernel is kept, tested (tests/test_sa_pallas.py, tests/test_hw_chip.py)
and selectable via GARMENTNETS_SA=pallas, but `auto` resolves to XLA
(see sa_backend). Eval-mode only (training keeps the XLA path: BN batch
stats need the full-batch reduction); the engine forces XLA under a
multi-device mesh (a pallas_call inside a GSPMD-partitioned jit is
opaque to the partitioner — same rule as the fused ggm).
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_SUB = 8                           # f32 sublane tile
_BACKEND_OVERRIDE: list = [None]   # trace-time override stack (engine/mesh)


@contextlib.contextmanager
def backend_override(backend):
    """Force the SA backend inside a trace (the predict engine pins 'xla'
    while tracing a mesh-sharded encode program — pallas_call cannot be
    partitioned by GSPMD)."""
    _BACKEND_OVERRIDE.append(backend)
    try:
        yield
    finally:
        _BACKEND_OVERRIDE.pop()


def _pick_tm(M: int, c_max: int, vmem_budget: int = 4 << 20) -> int:
    """Row-tile size: sublane-aligned, bounded so the widest activation
    tile stays within the VMEM budget (double-buffered by pallas)."""
    tm = max(_SUB, min(1024, vmem_budget // max(1, c_max * 4)))
    tm -= tm % _SUB
    return min(tm, -(-M // _SUB) * _SUB)


def _mm(a, w, precision):
    """Activation [TM, C_in] @ weight [C_in, C_out] kernel matmul.
    DEFAULT = native-bf16 MXU pass (the same error class as the XLA SA
    path's default-precision Dense); 'bf16_3x' emits XLA-HIGH's
    three-pass decomposition; HIGHEST = f32 (see
    ops/dense_decode_pallas._mm for the tier rationale)."""
    if precision == "bf16_3x":
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        wh = w.astype(jnp.bfloat16)
        wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(x, y):
            return jnp.dot(x, y, preferred_element_type=jnp.float32)

        return d(ah, wh) + d(al, wh) + d(ah, wl)
    return jnp.dot(a, w, precision=precision,
                   preferred_element_type=jnp.float32)


def _sa_kernel(h_ref, *rest, n_layers: int, precision):
    """One (b, m-tile, k) grid step.

    h_ref   [1, 1, TM, C_in]  gathered rows for neighbor slot k of this
                              m-tile (concat(x_j, rel_pos), k-major build)
    rest: per layer w [C_in, C_out] + bgs [3, C_out], then out_ref
    out_ref [1, 1, TM, C_out] — revisited across the K innermost grid
            steps; max-accumulated (k == 0 initializes).
    """
    w_refs = rest[:2 * n_layers]
    out_ref = rest[2 * n_layers]
    k = pl.program_id(2)

    a = h_ref[0, 0]                                    # [TM, C_in]
    for li in range(n_layers):
        w = w_refs[2 * li][:]                          # [C_in, C_out]
        bgs = w_refs[2 * li + 1]                       # [3, C_out] ref
        z = _mm(a, w, precision)                       # [TM, C_out]
        # row vectors broadcast over sublanes (probed OK on this Mosaic:
        # clean [1, C] ref loads + implicit arithmetic broadcast; what it
        # rejects is broadcasting a lane-OFFSET slice of a replicated row)
        a = (jax.nn.relu(z + bgs[0:1, :]) * bgs[1:2, :] + bgs[2:3, :])

    @pl.when(k == 0)
    def _init():
        out_ref[0, 0] = a

    @pl.when(k > 0)
    def _acc():
        out_ref[0, 0] = jnp.maximum(out_ref[0, 0], a)


def sa_layers_from_params(mlp_params: dict, mlp_batch_stats,
                          epsilon: float = 1e-5):
    """PointMLP params -> kernel-layout eval layers: per layer
    (w [C_in, C_out] kernel, bgs [3, C_out] = (b, g, s) rows); identical
    BN folding to ops/dense_decode.eval_layers. Works on traced values
    (called inside the flax apply)."""
    layers = []
    i = 0
    while f"dense_{i}" in mlp_params:
        k = mlp_params[f"dense_{i}"]["kernel"]
        b = mlp_params[f"dense_{i}"]["bias"]
        if mlp_batch_stats is not None and f"bn_{i}" in mlp_params:
            scale = mlp_params[f"bn_{i}"]["scale"]
            bias = mlp_params[f"bn_{i}"]["bias"]
            mean = mlp_batch_stats[f"bn_{i}"]["mean"]
            var = mlp_batch_stats[f"bn_{i}"]["var"]
            g = scale / jnp.sqrt(var + epsilon)
            s = bias - mean * g
        else:
            g = jnp.ones(k.shape[1], jnp.float32)
            s = jnp.zeros(k.shape[1], jnp.float32)
        bgs = jnp.stack([jnp.asarray(b, jnp.float32),
                         jnp.asarray(g, jnp.float32),
                         jnp.asarray(s, jnp.float32)])
        layers.append((jnp.asarray(k, jnp.float32), bgs))
        i += 1
    assert layers, "no dense layers found"
    return layers


def sa_fused(x, pos, centers, idx, mask, layers,
             precision=None, interpret: bool = False):
    """Fused SA neighborhood forward (eval mode).

    x [B, N, Cin], pos [B, N, 3], centers [B, M, 3], idx/mask [B, M, K],
    layers from sa_layers_from_params (first layer input dim Cin + 3).
    Returns [B, M, C_out] — identical semantics to the SAModule XLA path
    (gather -> PointMLP(eval) -> masked max) up to matmul precision,
    PROVIDED every center has >=1 valid neighbor (always true for ball
    query over centers drawn from the points: the center itself at
    distance 0 — ops/pointcloud.ball_query docstring). The mask never
    enters the kernel: invalid slots' indices are substituted with the
    row's first VALID slot's index, so they gather/score a duplicate of
    a valid neighbor and the plain max equals the masked max. (On an
    impossible all-invalid row the XLA path yields -inf; this path
    yields the nearest candidate's score instead.)
    """
    B, N, Cin = x.shape
    M, K = idx.shape[1], idx.shape[2]
    first_valid = jnp.argmax(mask, axis=-1)                     # [B, M]
    safe = jnp.take_along_axis(idx, first_valid[..., None], axis=-1)
    idx = jnp.where(mask, idx, safe)

    # k-major combined gather (transposing the INDEX is free; the gathered
    # data lands directly in the kernel's [B, K, Mp, C] layout). Combined
    # [x | pos] rows: one take_along_axis = half the row traffic of two
    # gathers (tools/bench_gather.py).
    src = jnp.concatenate([x.astype(jnp.float32),
                           pos.astype(jnp.float32)], axis=-1)
    idx_km = jnp.swapaxes(idx, 1, 2)                            # [B, K, M]
    nbr = jnp.take_along_axis(
        src[:, None], idx_km[..., None].astype(jnp.int32), axis=2)
    rel = nbr[..., Cin:] - centers.astype(jnp.float32)[:, None]
    h = jnp.concatenate([nbr[..., :Cin], rel], axis=-1)  # [B,K,M,Cin+3]

    c_max = max(w.shape[1] for w, _ in layers)
    c_in = Cin + 3
    TM = _pick_tm(M, max(c_max, c_in))
    pad_m = (-M) % TM
    if pad_m:
        h = jnp.pad(h, ((0, 0), (0, 0), (0, pad_m), (0, 0)))
    Mp = M + pad_m
    nt = Mp // TM

    n_layers = len(layers)
    C_out = layers[-1][0].shape[1]
    w_args = []
    w_specs = []
    for w, bgs in layers:
        w_args += [w, bgs]
        w_specs += [
            pl.BlockSpec(w.shape, lambda b, t, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bgs.shape, lambda b, t, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    if precision is None:
        precision = jax.lax.Precision.DEFAULT

    kernel = functools.partial(
        _sa_kernel, n_layers=n_layers, precision=precision)

    # K innermost: the output block (b, t) is revisited by K consecutive
    # grid steps, so the max accumulates in VMEM (standard reduction-grid
    # pattern); each step streams one [TM, c_in] row block in.
    grid_spec = pl.GridSpec(
        grid=(B, nt, K),
        in_specs=[
            pl.BlockSpec((1, 1, TM, c_in), lambda b, t, k: (b, k, t, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((1, 1, TM, C_out),
                               lambda b, t, k: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    flops_mlp = 2 * B * Mp * K * sum(
        w.shape[0] * w.shape[1] for w, _ in layers)
    cost = pl.CostEstimate(
        flops=flops_mlp,
        bytes_accessed=h.nbytes + B * Mp * C_out * 4,
        transcendentals=0)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nt, TM, C_out), jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
    )(h, *w_args)
    return out.reshape(B, Mp, C_out)[:, :M]


def sa_backend() -> str:
    """Resolve the SA neighborhood backend for the CURRENT trace:
    'pallas' or 'xla'. Order: backend_override context (the engine pins
    'xla' under a mesh) > GARMENTNETS_SA env.

    Unlike the decode/ggm autodetects, `auto` resolves to XLA: the fused
    kernel measured SLOWER than the XLA SA path on the real chip
    (2026-08-19, B=8 production shapes, scalar-sync timing — SA1 17.3 vs
    14.6 ms, SA2 9.9 vs 7.5 ms; docs/PERF.md "Rejected design: fused SA").
    The stage is gather-bound (~11.6 ms of SA1's 14.6 is the XLA row
    gather), XLA's post-gather matmul chain is already ~3 ms, and the
    kernel's extra HBM round trip for the k-major gathered tensor costs
    more than the fusion saves. The kernel stays available (and tested)
    for future toolchains/hardware where the tradeoff flips."""
    if _BACKEND_OVERRIDE[-1] is not None:
        return _BACKEND_OVERRIDE[-1]
    import os
    forced = os.environ.get("GARMENTNETS_SA", "auto")
    if forced in ("pallas", "xla"):
        return forced
    if forced != "auto":
        raise ValueError(
            f"GARMENTNETS_SA={forced!r}: expected pallas|xla|auto")
    return "xla"
