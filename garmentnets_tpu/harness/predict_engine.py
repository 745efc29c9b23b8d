"""Jitted end-to-end inference engine.

Device view of the reference predict loop (SURVEY.md §3.3), fused into TWO
device programs per batch instead of the reference's ~70 kernel launches:

  program 1 (`encode`): stage-1 PointNet++ -> NOCS + confidence -> volume
      aggregation -> 3D U-Net -> dense WNF evaluation over the full
      volume_size^3 lattice (lax.map over static chunks; the reference loops
      ArraySlicer on the host, predict.py:147-156) -> gaussian gradient
      magnitude ON DEVICE (reference does scipy on host, :162-163).
  program 2 (`warp`): surface-decoder query at marching-cubes vertices
      (padded to shape buckets to bound recompiles).

Host work between the two is exactly the variable-size marching cubes.
Batched multi-garment inference lifts the reference's bs==1 assert
(predict.py:62); with a multi-device mesh the batch axis shards over devices.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from garmentnets_tpu.models.pipeline import (
    ConvImplicitWNFPipeline, PipelineConfig)
from garmentnets_tpu.ops.gaussian import gaussian_gradient_magnitude


class PredictEngine:
    def __init__(self, cfg: PipelineConfig, variables: dict,
                 volume_size: int = 128, gradient_sigma: float = 0.5,
                 query_chunk_pts: int = 32768, mesh=None,
                 warp_bucket: int = 8192):
        self.cfg = cfg
        self.model = ConvImplicitWNFPipeline(cfg)
        self.variables = variables
        self.volume_size = volume_size
        self.gradient_sigma = gradient_sigma
        self.query_chunk_pts = query_chunk_pts
        self.warp_bucket = warp_bucket
        self.mesh = mesh

        total = volume_size ** 3
        assert total % query_chunk_pts == 0
        self.n_chunks = total // query_chunk_pts
        self._encode = jax.jit(self._encode_impl)
        self._warp = jax.jit(self._warp_impl)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            bs = NamedSharding(mesh, P("data"))
            rep = NamedSharding(mesh, P())
            self._encode = jax.jit(
                self._encode_impl,
                in_shardings=(rep, bs, bs), out_shardings=bs)
            self._warp = jax.jit(
                self._warp_impl,
                in_shardings=(rep, bs, bs), out_shardings=bs)

    # ------------------------------------------------------------------
    def _dense_grid(self, dtype=jnp.float32):
        """volume_size^3 lattice on [0,1], chunked [n_chunks, chunk, 3]."""
        s = self.volume_size
        idx = jnp.arange(s ** 3)
        ix = idx // (s * s)
        iy = (idx // s) % s
        iz = idx % s
        pts = jnp.stack([ix, iy, iz], axis=-1).astype(dtype) / (s - 1)
        return pts.reshape(self.n_chunks, self.query_chunk_pts, 3)

    def _encode_impl(self, variables, x, pos):
        model, cfg = self.model, self.cfg

        def run(mdl, batch_x, batch_pos):
            p2 = mdl.pointnet2_forward(batch_x, batch_pos)
            vol = mdl.unet3d_forward(p2["nocs_data"], train=False)
            return p2, vol

        (p2_result, feature_volume) = model.apply(
            variables, x, pos, method=run)

        B = x.shape[0]
        chunks = self._dense_grid()

        def decode_chunk(q):
            qb = jnp.broadcast_to(q[None], (B,) + q.shape)
            return model.apply(variables, feature_volume, qb, train=False,
                               method="volume_decoder_forward")

        wnf_flat = jax.lax.map(decode_chunk, chunks)      # [C, B, chunk]
        s = self.volume_size
        wnf = wnf_flat.transpose(1, 0, 2).reshape(B, s, s, s)
        ggm = gaussian_gradient_magnitude(wnf, self.gradient_sigma)

        nd = p2_result["nocs_data"]
        return {
            "wnf_volume": wnf,
            "wnf_ggm": ggm,
            "feature_volume": feature_volume,
            "pred_nocs": nd["pos"],
            "pred_nocs_confidence": nd["pred_confidence"],
            "per_point_logits": p2_result["per_point_logits"],
            "global_logits": p2_result["global_logits"],
            "global_feature": p2_result["global_feature"],
        }

    def _warp_impl(self, variables, feature_volume, query_points):
        model = self.model
        out = model.apply(variables, feature_volume, query_points,
                          train=False, method="surface_decoder_forward")
        res = {"warp_field": out}
        if self.cfg.has_mc_surface_decoder:
            res["mc_surface_logits"] = model.apply(
                variables, feature_volume, query_points, train=False,
                method="mc_surface_decoder_forward")[..., 0]
        return res

    # ------------------------------------------------------------------
    def encode(self, x: np.ndarray, pos: np.ndarray) -> dict:
        """x, pos: [B, N, 3] host arrays -> device result dict (async)."""
        return self._encode(self.variables, jnp.asarray(x), jnp.asarray(pos))

    def warp(self, feature_volume, mc_verts: np.ndarray) -> dict:
        """Query the warp field at MC vertices for ONE garment.

        mc_verts: [V, 3] variable length; padded to the next warp_bucket
        multiple (static shape buckets keep recompiles to a handful).
        feature_volume: [1, D, H, W, C] slice for this garment.
        """
        v = len(mc_verts)
        padded = -(-max(v, 1) // self.warp_bucket) * self.warp_bucket
        q = np.zeros((1, padded, 3), np.float32)
        q[0, :v] = mc_verts
        out = self._warp(self.variables, feature_volume, jnp.asarray(q))
        return {k: np.asarray(a)[0, :v] for k, a in out.items()}
