"""PointNet++ set-abstraction / feature-propagation modules, dense-batch form.

Capability parity with the reference `components/pointnet2.py` (SAModule,
GlobalSAModule, FPModule) re-designed TPU-first: the PyG ragged flat-concat
Batch is replaced by dense `[B, N, C]` arrays (SURVEY.md §7). Point counts are
static (6000 -> ratio 0.5 -> 3000 -> ratio 0.25 -> 750 -> 1), so every stage
is a fixed-shape XLA program; the only raggedness is the <=K ball-query
neighbor slots, handled by masked MLP/max (masked max is exact because every
center is its own neighbor at distance 0).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from garmentnets_tpu.ops.pointcloud import (
    furthest_point_sampling, ball_query, knn_interpolate)
from garmentnets_tpu.models.mlp import PointMLP


class SAModule(nn.Module):
    """Local set abstraction: FPS -> ball query -> PointConv (masked max).

    Reference components/pointnet2.py:11-33. `nn` there = MLP over
    concat(x_j, p_j - p_i) followed by max aggregation (PyG PointNetConv).
    """
    ratio: float
    radius: float
    mlp_channels: Sequence[int]
    max_neighbors: int = 64
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x, pos, train: bool = True):
        B, N, _ = pos.shape
        M = int(N * self.ratio)
        idx = furthest_point_sampling(pos, M)                    # [B,M]
        centers = jnp.take_along_axis(pos, idx[..., None], axis=1)
        nbr_idx, nbr_mask = ball_query(
            pos, centers, self.radius, k=self.max_neighbors)     # [B,M,K]
        # Fused Pallas SA path (eval only, OPT-IN via GARMENTNETS_SA=
        # pallas): MLP chain + max-over-K in one VMEM kernel
        # (kernels/sa_pallas.py). Measured SLOWER than this XLA path on
        # the real chip (the stage is gather-bound — see the kernel's
        # docstring), so `auto` resolves to XLA; the branch is kept for
        # toolchains where the tradeoff flips. Training always uses the
        # XLA path (masked-BN batch stats need the full-batch reduction),
        # as do init (params don't exist yet) and mesh-sharded traces
        # (the engine pins 'xla' via backend_override — pallas_call is
        # opaque to GSPMD).
        if (not train) and (x is not None) and (not self.is_initializing()):
            from garmentnets_tpu.kernels.sa_pallas import (
                sa_backend, sa_fused, sa_layers_from_params)
            if sa_backend() == "pallas":
                params = self.get_variable("params", "mlp")
                stats = (self.get_variable("batch_stats", "mlp")
                         if self.batch_norm else None)
                layers = sa_layers_from_params(params, stats)
                out = sa_fused(x, pos, centers, nbr_idx, nbr_mask, layers)
                return out, centers
        # Neighbor-feature gather. 'combined' (default) gathers the
        # pre-concatenated [x | pos] rows in ONE take_along_axis — same
        # values bit-for-bit as 'split' (one gather per source,
        # reference-shaped) and 2x faster on the chip: a TPU gather's
        # cost is per ROW it touches, so fusing the two gathers halves
        # the row traffic (tools/bench_gather.py 2026-08-19: SA1 11.6 vs
        # 22.1 ms, SA2 5.1 vs 6.6). Env is read at trace time, so set it
        # before the engine/jit is built.
        import os
        combined = (x is not None and os.environ.get(
            "GARMENTNETS_SA_GATHER", "combined") == "combined")
        if combined:
            src = jnp.concatenate([x, pos], axis=-1)
            nbr = jnp.take_along_axis(
                src[:, None], nbr_idx[..., None], axis=2)        # [B,M,K,C+3]
            nbr_pos = nbr[..., x.shape[-1]:]
            rel_pos = nbr_pos - centers[:, :, None, :]
            h = jnp.concatenate([nbr[..., :x.shape[-1]], rel_pos], axis=-1)
        else:
            nbr_pos = jnp.take_along_axis(
                pos[:, None], nbr_idx[..., None], axis=2)        # [B,M,K,3]
            rel_pos = nbr_pos - centers[:, :, None, :]
            feats = [rel_pos]
            if x is not None:
                nbr_x = jnp.take_along_axis(
                    x[:, None], nbr_idx[..., None], axis=2)      # [B,M,K,C]
                feats = [nbr_x, rel_pos]
            h = jnp.concatenate(feats, axis=-1)
        h = PointMLP(self.mlp_channels, self.batch_norm, name="mlp")(
            h, mask=nbr_mask, train=train)
        # masked max over neighbor slots (>=1 valid: self at distance 0)
        neg_inf = jnp.asarray(-jnp.inf, h.dtype)
        h = jnp.where(nbr_mask[..., None], h, neg_inf)
        out = jnp.max(h, axis=2)                                 # [B,M,C']
        return out, centers


class GlobalSAModule(nn.Module):
    """Global set abstraction: per-point MLP then global max pool.

    Reference components/pointnet2.py:36-52.
    """
    mlp_channels: Sequence[int]
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x, pos, train: bool = True):
        h = jnp.concatenate([x, pos], axis=-1)                   # [B,M,C+3]
        h = PointMLP(self.mlp_channels, self.batch_norm, name="mlp")(
            h, train=train)
        out = jnp.max(h, axis=1)                                 # [B,C']
        pos_out = jnp.zeros((pos.shape[0], 1, 3), pos.dtype)
        return out, pos_out


class FPModule(nn.Module):
    """Feature propagation: kNN interpolate -> skip concat -> MLP.

    Reference components/pointnet2.py:61-76.
    """
    k: int
    mlp_channels: Sequence[int]
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x, pos, x_skip, pos_skip, train: bool = True):
        # approx_min_k: TPU-optimized kNN (recall ~0.95); inverse-distance
        # weighting makes the occasional swapped 3rd neighbor negligible
        h = knn_interpolate(x, pos, pos_skip, k=self.k,
                            approx=True)                         # [B,T,C]
        if x_skip is not None:
            h = jnp.concatenate([h, x_skip], axis=-1)
        h = PointMLP(self.mlp_channels, self.batch_norm, name="mlp")(
            h, train=train)
        return h, pos_skip
