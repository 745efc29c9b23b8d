"""Furthest point sampling as a Pallas TPU kernel.

FPS is inherently sequential (each pick depends on the running min-distance
vector, SURVEY.md §7 "Hard parts"); the XLA fori_loop fallback in
ops/pointcloud.py re-materializes the [B, N] state through HBM-level
reductions every iteration. This kernel keeps positions and the running
min-distance entirely in VMEM (3 x 6000 floats = 72 KB/garment) and runs the
full selection loop in one program per batch row (grid over B).

Layout notes (TPU tiling): positions enter as [B, 3, N] so the long axis sits
on lanes; all intermediates are rank-2; argmax is expressed as max + iota
min-index (first-occurrence tie-break, identical to jnp.argmax), so the
kernel produces EXACTLY the same indices as the XLA fallback.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(pos_ref, out_ref, mind_ref, *, num_samples: int, n: int,
                m_total: int):
    """pos_ref: [1, 3, N] VMEM; out_ref: [1, 1, M] int32; mind: [1, N].

    The selected-index row is carried through the loop and written once at
    the end (Mosaic on this platform rejects dynamic VMEM stores; a masked
    select against an iota row replaces them)."""
    mind_ref[:] = jnp.full((1, n), jnp.inf, jnp.float32)
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    out_ids = jax.lax.broadcasted_iota(jnp.int32, (1, m_total), 1)

    def body(i, carry):
        out_row, last = carry
        # select the last-picked point via masked reduction (dynamic VMEM
        # indexing with a loop-carried scalar trips this platform's Mosaic)
        sel = (ids == last).astype(jnp.float32)        # [1, N]
        xs = pos_ref[0, 0:1, :]
        ys = pos_ref[0, 1:2, :]
        zs = pos_ref[0, 2:3, :]
        px = jnp.sum(xs * sel)
        py = jnp.sum(ys * sel)
        pz = jnp.sum(zs * sel)
        dx = xs - px                                   # [1, N]
        dy = ys - py
        dz = zs - pz
        d = dx * dx + dy * dy + dz * dz
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        m = jnp.max(mind)
        nxt = jnp.min(jnp.where(mind == m, ids, n)).astype(jnp.int32)
        out_row = jnp.where(out_ids == i, nxt, out_row)
        return out_row, nxt

    out_row0 = jnp.zeros((1, m_total), jnp.int32)
    out_row, _ = jax.lax.fori_loop(
        1, num_samples, body, (out_row0, jnp.int32(0)))
    out_ref[0] = out_row


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def furthest_point_sampling_pallas(pos: jax.Array, num_samples: int,
                                   interpret: bool = False) -> jax.Array:
    """pos: [B, N, 3] -> idx [B, M] int32. Start index fixed at 0 (matches
    the XLA fallback)."""
    B, N, _ = pos.shape
    # lane alignment: pad N and M to multiples of 128. Padding replicates
    # point 0, whose running min-distance is 0 after the first pick, so pads
    # are never selected and all produced indices are < N... except exact
    # duplicates of point 0 tie at 0 — ids order prefers the real index.
    n_pad = (-N) % 128
    m_pad = (-num_samples) % 128
    pos_t = jnp.swapaxes(pos.astype(jnp.float32), 1, 2)  # [B, 3, N]
    if n_pad:
        pos_t = jnp.concatenate(
            [pos_t, jnp.broadcast_to(pos_t[:, :, :1], (B, 3, n_pad))],
            axis=2)
    n_total = N + n_pad
    m_total = num_samples + m_pad

    out = pl.pallas_call(
        functools.partial(_fps_kernel, num_samples=num_samples, n=n_total,
                          m_total=m_total),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 3, n_total), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, m_total), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, m_total), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, n_total), jnp.float32)],
        interpret=interpret,
    )(pos_t)
    return out[:, 0, :num_samples]
