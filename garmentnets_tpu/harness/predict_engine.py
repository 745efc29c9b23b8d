"""Jitted end-to-end inference engine.

Device view of the reference predict loop (SURVEY.md §3.3), fused into TWO
device programs per batch instead of the reference's ~70 kernel launches:

  program 1 (`encode`): stage-1 PointNet++ -> NOCS + confidence -> volume
      aggregation -> 3D U-Net -> dense WNF over the full volume_size^3
      lattice via separable-interpolation MATMULS (ops/dense_decode — the
      reference loops host-side ArraySlicer chunks through grid_sample,
      predict.py:147-156) -> gaussian gradient magnitude on device ->
      active-brick extraction (ops/isosurface, int8, ~0.2 MB/garment
      instead of 17 MB over the slow device->host link).
  program 2 (`warp`): surface-decoder query at marching-cubes vertices for
      the WHOLE batch at once (+ gradient-magnitude gather at those verts),
      padded to shape buckets to bound recompiles; results leave as ONE
      channel-combined f16 buffer.

Host work between the two is exactly the variable-size marching cubes.
Batched multi-garment inference lifts the reference's bs==1 assert
(predict.py:62); with a multi-device mesh the batch axis shards over
devices.
"""
from __future__ import annotations

import threading
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from garmentnets_tpu.models.pipeline import (
    ConvImplicitWNFPipeline, PipelineConfig)
from garmentnets_tpu.ops.gaussian import gaussian_gradient_magnitude
from garmentnets_tpu.ops.dense_decode import dense_decode, eval_layers
from garmentnets_tpu.ops.isosurface import (
    extract_active_bricks, pack_brick_pages, unpack_brick_pages,
    read_page_counts)
from garmentnets_tpu.ops.marching_cubes import (
    marching_cubes_bricks, marching_cubes)


_MC_POOLS: dict = {}
_MC_POOLS_LOCK = threading.Lock()


def _shared_mc_pool():
    """Process-wide MC thread pool (or None for serial); see
    PredictEngine._mc_pool. GARMENTNETS_MC_THREADS is re-read per call
    (tests flip it), but pools are cached per resolved width — one pool per
    distinct width for the process lifetime, shut down atexit, instead of
    the per-engine pools that leaked 4 threads per instance. First pool
    creation pre-loads the C++ MC library on the calling thread so pool
    workers never race its compile-and-dlopen step."""
    import os
    raw = os.environ.get("GARMENTNETS_MC_THREADS", "auto")
    if raw == "auto":
        ncpu = os.cpu_count() or 1
        n = min(4, ncpu) if ncpu > 1 else 1
    else:
        n = max(1, int(raw))
    if n <= 1:
        return None
    pool = _MC_POOLS.get(n)
    if pool is None:
        with _MC_POOLS_LOCK:     # two engines can race first use
            pool = _MC_POOLS.get(n)
            if pool is None:
                import atexit
                from concurrent.futures import ThreadPoolExecutor
                from garmentnets_tpu.ops.marching_cubes import _load_lib
                _load_lib()
                pool = ThreadPoolExecutor(max_workers=n,
                                          thread_name_prefix="mc")
                atexit.register(pool.shutdown, wait=False)
                _MC_POOLS[n] = pool
    return pool


def decode_precision_from_str(name: str):
    """Maps the `prediction.decode_precision` config value ('high' |
    'default' | 'highest') to a jax.lax.Precision (single source of truth
    for the predict CLI and the benchmarks)."""
    table = {
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }
    key = str(name).lower()
    if key not in table:
        raise ValueError(
            f"decode_precision must be one of {sorted(table)}, got {name!r}")
    return table[key]


class PredictEngine:
    def __init__(self, cfg: PipelineConfig, variables: dict,
                 volume_size: int = 128, gradient_sigma: float = 0.5,
                 iso_level: float = 0.5, gradient_direction: str = "ascent",
                 mesh=None, warp_bucket: Optional[int] = None,
                 active_cap: Optional[int] = None,
                 # HIGH = bf16_3x matmuls: ~25% faster dense decode than
                 # HIGHEST at ~3e-5 absolute WNF error (sub-1e-4 vertex
                 # shifts, far below eval-metric resolution)
                 precision=jax.lax.Precision.HIGH,
                 return_volume: bool = False,
                 use_hole_prediction: bool = False,
                 task_aabb: Optional[np.ndarray] = None,
                 device_normals: Optional[bool] = None):
        self.cfg = cfg
        self.model = ConvImplicitWNFPipeline(cfg)
        # Pin the weights on device ONCE. Checkpoint loading hands numpy
        # arrays; passing those into the jitted programs re-uploads every
        # parameter each call — measured 778 vs 203 ms/batch end-to-end
        # encode (~29 MB h2d per batch through this link) in the predict
        # CLI/serve paths. Replicated across the mesh when one is given
        # (weights are small; batch/space axes shard activations only).
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self.variables = jax.device_put(
                variables, NamedSharding(mesh, P()))
        else:
            self.variables = jax.device_put(variables)
        self.volume_size = volume_size
        self.gradient_sigma = gradient_sigma
        self.iso_level = float(iso_level)
        self.gradient_direction = gradient_direction
        import os
        if warp_bucket is None:
            # warp query/result buffers pad every garment to
            # ceil(vmax/bucket)*bucket rows; at a ~33k-vert cloth mesh the
            # old 8192 bucket shipped 40960 rows (23% padding) over a
            # 30-50 MB/s tunnel where padding bytes are pure host pump
            # time. 4096 keeps compile-shape churn bounded (one warp
            # program per distinct padded size) while halving worst-case
            # padding. GARMENTNETS_WARP_BUCKET overrides for tuning.
            warp_bucket = int(os.environ.get("GARMENTNETS_WARP_BUCKET",
                                             "4096"))
        self.warp_bucket = warp_bucket
        if active_cap is None:
            # active cubes scale with iso-surface AREA ~ volume_size^2; the
            # 128^3 default (65536 ~ 2x a calibrated cloth load) scales
            # continuously (not floor-divided: 192^3 needs 2.25x, not 1x)
            # so larger grids don't hit the full-volume overflow fallback
            active_cap = int(65536 * max(1.0, (volume_size / 128) ** 2))
        self.active_cap = active_cap
        # extraction ships non-overlapping 4^3 int8 BRICKS (ops/isosurface
        # brick path): the compaction problem is 64x smaller than per-cube
        # and the value fetch is a contiguous 64-byte row gather (the 5^3
        # overlapping-support gather it replaces was the largest encode
        # component). The shipped set is the support-active blocks plus
        # their negative-face neighbors (~2.2x the active-block count); a
        # calibrated cloth shell averages ~20 active cubes per active block,
        # so cap/8 bricks keeps >= the cube-cap's headroom. Brick records
        # cross the link in fixed-size pages so only ceil(count/page) pages
        # are fetched (the cap costs HBM, not link bytes).
        brick_cap = max(64, active_cap // 8)
        self.brick_page = min(1024, brick_cap)
        self.brick_cap = -(-brick_cap // self.brick_page) * self.brick_page
        self.precision = precision
        self.return_volume = return_volume
        if device_normals is None:
            # MC vertex normals computed on DEVICE in the warp program
            # (ops/normals: trilinear-lerped central-difference gradients,
            # octahedral-packed into one extra f16 result lane) instead of
            # by the host C++ kernel — the normals pass is ~28% of host MC
            # at 256^3. Storage-only data downstream (reference
            # predict.py:195; eval never reads them), so the ~1 deg oct
            # quantization is safe; GARMENTNETS_DEVICE_NORMALS=0 restores
            # the exact host path.
            device_normals = os.environ.get(
                "GARMENTNETS_DEVICE_NORMALS", "0") == "1"
        self.device_normals = bool(device_normals)
        # ship per-brick cube-straddle masks (+8 B/brick) so the host MC
        # kernel skips its 64-cube rejection scan and all-empty support
        # fills (ops/isosurface with_masks / C++ _masked entry point).
        # Paired A/B (2026-08-20): +4.3% at 256^3 (scan is ~15 of ~60 ms
        # per-garment MC there), neutral at the default 128^3 load (0.993)
        # — auto mode enables them for large volumes only, keeping the
        # default-load encode program (and its warm XLA cache) unchanged.
        raw_masks = os.environ.get("GARMENTNETS_CUBE_MASKS", "auto")
        self.cube_masks = (volume_size >= 192 if raw_masks == "auto"
                           else raw_masks == "1")
        self.use_hole_prediction = (use_hole_prediction
                                    and cfg.has_mc_surface_decoder)
        # task-space variant (reference apply_volume_task_space :279-295):
        # the dataset-level sim AABB is a per-dataset constant, baked into
        # the jitted encode
        if cfg.volume_task_space and task_aabb is None:
            raise ValueError(
                "cfg.volume_task_space=True requires task_aabb "
                "(dataset.cloth_sim_aabb, shape [2,3])")
        self.task_aabb = (None if task_aabb is None
                          else np.asarray(task_aabb, np.float32))
        self.mesh = mesh

        vd = variables["params"]["volume_decoder"]["mlp"]
        vd_stats = variables["batch_stats"]["volume_decoder"]["mlp"]
        self._vd_layers = eval_layers(
            jax.tree_util.tree_map(np.asarray, vd),
            jax.tree_util.tree_map(np.asarray, vd_stats))

        # slab width for the dense decode's D-axis loop: largest of 8/4/2/1
        # dividing the volume, further constrained so the slab count divides
        # the mesh's 'space' axis when spatial sharding is active (each
        # device must own a whole number of slabs).
        # GARMENTNETS_DECODE_SLAB overrides for on-chip tuning experiments.
        n_space = (mesh.shape["space"]
                   if mesh is not None and "space" in mesh.axis_names else 1)
        import os
        forced = os.environ.get("GARMENTNETS_DECODE_SLAB")
        slab_choices = (int(forced),) if forced else (8, 4, 2, 1)
        self._slab = next(
            s for s in slab_choices
            if volume_size % s == 0 and (volume_size // s) % n_space == 0)
        self._encode = jax.jit(self._encode_impl)
        self._warp = jax.jit(self._warp_impl_devnorm
                             if self.device_normals else self._warp_impl)
        if mesh is not None:
            # mesh may be 1-D ("data",) — plain batch DP — or 2-D
            # ("data", "space"): batch DP composed with D-axis slab sharding
            # of the dense decode (see ops/dense_decode spatial sharding).
            # All host-facing outputs stay batch-sharded either way.
            from jax.sharding import NamedSharding, PartitionSpec as P
            data = "data" if "data" in mesh.axis_names else None
            bs = NamedSharding(mesh, P(data))
            rep = NamedSharding(mesh, P())
            self._encode = jax.jit(
                self._encode_impl,
                in_shardings=(rep, bs, bs), out_shardings=bs)

    # ------------------------------------------------------------------
    def _encode_impl(self, variables, x, pos):
        model = self.model

        def run(mdl, batch_x, batch_pos):
            p2 = mdl.pointnet2_forward(batch_x, batch_pos)
            if self.cfg.volume_task_space:
                aabb = jnp.broadcast_to(
                    jnp.asarray(self.task_aabb),
                    (batch_pos.shape[0], 2, 3))
                p2 = mdl.apply_volume_task_space(batch_pos, aabb, p2)
            vol = mdl.unet3d_forward(p2["nocs_data"], train=False)
            return p2, vol

        # mesh-sharded encode pins the XLA SA path while tracing: a
        # pallas_call inside this GSPMD-partitioned jit cannot be split by
        # the partitioner (same rule as the ggm backend below)
        from garmentnets_tpu.kernels.sa_pallas import backend_override
        with backend_override("xla" if self.mesh is not None else None):
            (p2_result, feature_volume) = model.apply(
                variables, x, pos, method=run)

        # swapaxes matches ImplicitWNFDecoder's reference axis-order quirk
        # (query zyx lookup): dense-decoding the transposed volume at the
        # xyz lattice equals decoding the volume at the flipped lattice.
        wnf = dense_decode(jnp.swapaxes(feature_volume, 1, 3),
                           self._vd_layers,
                           self.volume_size, slab=self._slab,
                           precision=self.precision, mesh=self.mesh)
        # mesh-sharded encode must keep the XLA ggm: a pallas_call inside
        # this GSPMD-partitioned jit cannot be split by the partitioner
        # (the env-selected 'pallas' backend is honored single-device only)
        ggm = gaussian_gradient_magnitude(
            wnf, self.gradient_sigma,
            backend="xla" if self.mesh is not None else None)
        base, vals, counts = extract_active_bricks(
            wnf, self.iso_level, self.brick_cap,
            with_masks=getattr(self, "cube_masks", False))

        # NOTE on a rejected design: evaluating the warp decoder ON DEVICE
        # at the crossing edges (ops/isosurface.extract_crossing_edges +
        # the C++ kernel's per-vertex edge ranks) would remove the host
        # vertex round trip entirely — but stream-compacting ~33k crossing
        # edges out of 1.6M candidate slots costs ~60 ms on TPU (scatter and
        # searchsorted both bottleneck on per-slot indirection, measured),
        # more than the ~25 ms of h2d query upload it saves. The machinery
        # remains available (and tested) for backends with cheap compaction.

        nd = p2_result["nocs_data"]
        out = {
            # page 0 carries the counts in a header row: the host learns
            # them from the page fetch it does anyway instead of a separate
            # ~20 ms active_counts round trip (profile_bench_loop 'counts')
            "active_pages": pack_brick_pages(base, vals, self.brick_page,
                                             counts=counts),
            "active_counts": counts,   # still exported for sharding tests
            "wnf_ggm": ggm,                      # stays on device
            "feature_volume": feature_volume,    # stays on device
            "pred_nocs": nd["pos"],    # f32: feeds eval's NOCS metrics
            # confidence feeds only visualization (reference eval.py:856)
            "pred_nocs_confidence": nd["pred_confidence"].astype(
                jnp.float16),
            # f16 on the wire: [B, 6000, 192] of raw bin logits is the
            # single largest predict-harness transfer (37 MB/batch at B=8
            # in f32 — more than every other output combined); they are
            # stored for schema parity but consumed by nothing downstream,
            # and f16 keeps softmax-confidence recomputation to ~1e-3.
            # The harness upcasts to f32 at the zarr write (schema dtype).
            "per_point_logits": p2_result["per_point_logits"].astype(
                jnp.float16),
            "global_logits": p2_result["global_logits"],
            "global_feature": p2_result["global_feature"],
        }
        if self.return_volume or self.device_normals:
            # device-resident; no link cost unless the host fetches it
            out["wnf_volume"] = wnf
        return out

    def _warp_impl(self, variables, feature_volume, ggm, query_points_f16):
        """query_points arrive float16 and results leave float16: the
        device<->host link is the predict bottleneck (~30 MB/s through the
        tunnel on this host) and vertex coordinates/warp values only need
        ~1e-3 relative precision (sub-voxel at 128^3). The voxel index for
        the gradient-magnitude gather is computed on device instead of
        being uploaded. (Per-vertex volume_value is NOT gathered here: the
        host MC kernel emits it for free from the brick corner values —
        keeping the dense WNF alive as an extra f16 encode output for a
        device-side gather measured ~12% off end-to-end throughput.)"""
        model = self.model
        query_points = query_points_f16.astype(jnp.float32)
        out = model.apply(variables, feature_volume, query_points,
                          train=False, method="surface_decoder_forward")
        B, S = ggm.shape[0], self.volume_size
        nn_idx = jnp.clip((query_points * (S - 1)).astype(jnp.int32),
                          0, S - 1)
        vert_voxel_idx = ((nn_idx[..., 0] * S + nn_idx[..., 1]) * S
                          + nn_idx[..., 2])
        ggm_flat = ggm.reshape(B, -1)
        ggm_at = jnp.take_along_axis(ggm_flat, vert_voxel_idx, axis=1)
        # ONE combined output buffer: the d2h link serializes transfers with
        # a ~27 ms per-transfer latency floor (docs/PERF.md link facts), so
        # warp + ggm (+ hole logits) leave as channels of a single f16 array
        cols = [out, ggm_at[..., None]]
        if self.use_hole_prediction:
            cols.append(model.apply(
                variables, feature_volume, query_points, train=False,
                method="mc_surface_decoder_forward")[..., :1])
        return jnp.concatenate(cols, axis=-1).astype(jnp.float16)

    def _warp_impl_devnorm(self, variables, feature_volume, ggm, wnf,
                           query_points_f16):
        """device_normals variant: the skimage-semantics MC vertex normals
        (trilinear lerp of central-difference gradients at the vertex,
        outward sign under 'ascent') ride the combined result buffer as ONE
        octahedral-packed f16 lane (ops/normals), and the host C++ kernel
        skips its normals pass (~28% of host MC at 256^3)."""
        from garmentnets_tpu.ops.normals import sample_gradient_normals_oct
        base = self._warp_impl(variables, feature_volume, ggm,
                               query_points_f16)
        oct = sample_gradient_normals_oct(
            wnf, query_points_f16.astype(jnp.float32),
            ascent=self.gradient_direction == "ascent")
        return jnp.concatenate([base, oct.astype(jnp.float16)], axis=-1)

    # ------------------------------------------------------------------
    # host-facing API
    # ------------------------------------------------------------------
    def encode(self, x: np.ndarray, pos: np.ndarray) -> dict:
        """x, pos: [B, N, 3] host arrays -> device result dict (async)."""
        return self._encode(self.variables,
                            jnp.asarray(np.asarray(x, np.float32)),
                            jnp.asarray(np.asarray(pos, np.float32)))

    # active_counts is NOT prefetched: the counts ride page 0's header row
    # (pack_brick_pages(counts=...)) which is always in the speculative
    # page prefix below, so the host never pays a separate d2h sync
    PREFETCH_KEYS = ()

    def prefetch(self, enc: dict, extra_keys=()):
        """Start async device->host copies for the arrays the host stage will
        read; overlaps the slow link with device compute and host MC.

        Brick records are paged: counts + a SPECULATIVE page prefix sized by
        the previous batch's true page count are fetched eagerly (batches in
        a run have similar surface area, so the speculation almost always
        covers the need; a miss just means extract_meshes waits for the
        remainder). The remaining ceil(count/page) pages are requested in
        extract_meshes once counts arrive, so link bytes track the true
        shipped count while the generous cap only costs HBM. (A device-side
        slice to the true count was measured far slower — 5.3 vs 18
        garments/sec — because it serializes a counts round-trip AND a fresh
        device dispatch onto the critical path; picking pre-materialized
        page buffers does neither. Speculative async copies issued at
        dispatch time begin streaming the moment the encode program
        finishes, hiding the page transfer under the host MC stage.)
        """
        for key in tuple(self.PREFETCH_KEYS) + tuple(extra_keys):
            arr = enc.get(key)
            if arr is not None and hasattr(arr, "copy_to_host_async"):
                arr.copy_to_host_async()
        pages = enc.get("active_pages")
        if pages:
            spec = max(1, min(getattr(self, "_spec_pages", 1), len(pages)))
            import os
            # default OFF: paired A/B at the default 128^3 load measured
            # the coalesced prefix LOSING (median ratio 0.920, 4/5 pairs
            # below 1 — the extra concat dispatch serializes against the
            # encode stream and costs more than the saved ~27 ms transfer
            # floors, which the async speculative prefetch already hides);
            # heavy-load A/B was neutral (1.005). Kept as an opt-in knob
            # for links with a higher per-transfer floor.
            concat_on = getattr(
                self, "page_concat_enabled",
                os.environ.get("GARMENTNETS_PAGE_CONCAT", "0") == "1")
            if (concat_on and spec > 1
                    and hasattr(pages[0], "copy_to_host_async")):
                # coalesce the speculative prefix into ONE device buffer:
                # each separate page fetch pays the link's ~27 ms
                # per-transfer floor (transfers serialize on this tunnel),
                # so a 4-page heavy load burns ~3 extra floors per batch.
                # The concat program is dispatched asynchronously here (off
                # the critical path — speculation means no counts wait) and
                # costs only an HBM copy; one tiny jit per distinct prefix
                # length (<= cap/page variants).
                enc["_page_prefix"] = (spec, self._page_concat(spec)(
                    *pages[:spec]))
                enc["_page_prefix"][1].copy_to_host_async()
            else:
                for p in pages[:spec]:
                    if hasattr(p, "copy_to_host_async"):
                        p.copy_to_host_async()

    def extract_meshes(self, enc: dict) -> list:
        """Fetch the shipped brick pages once for the batch and run the host
        C++ marching-cubes kernel per garment (it discovers the straddling
        cubes directly from the bricks). Returns a list of (verts, faces,
        values, normals) — values is the per-vertex skimage-semantics volume
        value the kernel emits from its corner values, normals the unit
        volume-gradient normals at the vertices (reference stores skimage's
        outputs at predict.py:172-197) — or None (no surface / NaN-sentinel
        case)."""
        from garmentnets_tpu.harness.linkguard import guarded_fetch
        pages = enc["active_pages"]
        prefix = enc.get("_page_prefix")   # (n_pages, concat buffer) or None
        if prefix is not None:
            p0 = guarded_fetch(lambda: np.asarray(prefix[1]),
                               "brick page prefix (coalesced)")
        else:
            p0 = guarded_fetch(lambda: np.asarray(pages[0]),
                               "brick page 0 (counts header)")
        header = p0.shape[1] % self.brick_page == 1
        if header:
            # counts ride page 0's header row — page 0 was already
            # speculatively prefetched at dispatch, so this costs no
            # extra round trip (vs ~20 ms for a separate counts sync)
            counts = read_page_counts(p0)
        else:   # legacy enc dicts without the header (e.g. older captures)
            if p0.shape[1] != self.brick_page:
                # a capture produced with a different brick_page than this
                # engine would otherwise be silently misparsed (the count
                # row decoded as a brick record, or vice versa)
                raise ValueError(
                    f"brick page size mismatch: pages carry rows of "
                    f"{p0.shape[1]} bricks, engine expects "
                    f"{self.brick_page} (+1 if a counts header row)")
            counts = np.asarray(enc["active_counts"])
        B = len(counts)
        kmax = int(counts.max()) if B else 0
        S = self.volume_size
        spacing = (1.0 / (S - 1),) * 3
        results: list = [None] * B
        if kmax == 0:
            return results
        if kmax > self.brick_cap:
            # capacity overflow: fall back to full-volume MC (rare). The
            # dense WNF is the engine's single largest d2h transfer —
            # guard it like every other fetch
            wnf = guarded_fetch(
                lambda: np.asarray(self._dense_wnf(enc)),
                "full WNF volume (brick-cap overflow fallback)")
            for b in range(B):
                try:
                    v, f, norms, vals = marching_cubes(
                        wnf[b], self.iso_level, spacing=spacing,
                        gradient_direction=self.gradient_direction)
                    results[b] = (v, f, vals, norms)
                except ValueError:
                    pass
            return results
        n_pages = max(1, -(-kmax // self.brick_page))
        self._spec_pages = n_pages       # speculation for the next prefetch
        if prefix is not None and prefix[0] >= n_pages:
            # speculation hit: the coalesced prefix (ONE transfer, already
            # fetched above for the counts) covers every needed page
            brick_idx, brick_vals = unpack_brick_pages([p0], header=True)
        else:
            # miss (or no prefetch ran): fall back to per-page fetches.
            # Re-issue copies for ALL needed pages, including page 0:
            # prefetch() normally started them, but callers that skip
            # prefetch() must not silently lose overlap — re-issuing an
            # in-flight/completed async copy is documented as harmless
            srcs = ([p0] + list(pages[prefix[0]:n_pages])
                    if prefix is not None else list(pages[:n_pages]))
            for p in srcs:
                if hasattr(p, "copy_to_host_async"):
                    p.copy_to_host_async()
            brick_idx, brick_vals = guarded_fetch(
                lambda: unpack_brick_pages(srcs, header=header),
                f"brick pages ..{n_pages - 1}" if n_pages > 1
                else "brick page unpack")

        devnorm = getattr(self, "device_normals", False)
        # payload may carry device-computed straddle masks (auto-detected
        # by record width; the C++ kernel then skips its rejection scan)
        from garmentnets_tpu.ops.isosurface import split_brick_payload
        brick_vals, masks = split_brick_payload(brick_vals)

        def run_one(b):
            n = int(counts[b])
            if n == 0:
                return None
            try:
                res = marching_cubes_bricks(
                    brick_idx[b, :n], brick_vals[b, :n], (S, S, S),
                    self.iso_level, spacing,
                    gradient_direction=self.gradient_direction,
                    return_values=True, return_normals=not devnorm,
                    cube_masks=None if masks is None else masks[b, :n])
                # device_normals: normals arrive in the warp result instead
                # (octahedral lane, see _warp_impl_devnorm); keep the
                # 4-tuple shape with a None placeholder
                return res if not devnorm else (*res, None)
            except ValueError:
                return None

        # Per-garment MC calls are independent (the C++ kernel keeps all
        # state per-call; its only statics are const tables) and ctypes
        # releases the GIL for the call's duration, so on multi-core hosts
        # they parallelize across a small thread pool. The sandbox host has
        # one core (auto resolves to serial there); on a production host
        # this overlaps the dominant host stage with itself AND with the
        # tunnel/PCIe transfer pumping (docs/PERF.md attribution table).
        pool = self._mc_pool()
        if pool is not None and B > 1:
            for b, r in enumerate(pool.map(run_one, range(B))):
                results[b] = r
        else:
            for b in range(B):
                results[b] = run_one(b)
        return results

    def _page_concat(self, n: int):
        """Jitted device-side concat of the first n brick pages into one
        [B, n*page+1, rec] buffer (page 0 keeps its header row), so the
        host's speculative prefix crosses the link as ONE transfer instead
        of n. Cached per prefix length (bounded by cap/page)."""
        if not hasattr(self, "_page_concat_fns"):
            self._page_concat_fns = {}
        fn = self._page_concat_fns.get(n)
        if fn is None:
            fn = jax.jit(lambda *ps: jnp.concatenate(ps, axis=1))
            self._page_concat_fns[n] = fn
        return fn

    def _mc_pool(self):
        """Thread pool for per-garment host MC; GARMENTNETS_MC_THREADS
        (default auto: min(4, cpu_count) when >1 core, serial otherwise).
        Returns None for serial execution. The pool is a module-level
        singleton shared by every engine (workers are stateless; per-engine
        pools leaked 4 threads per instance in long-lived multi-engine
        processes) and is shut down atexit."""
        return _shared_mc_pool()

    def _dense_wnf(self, enc):
        if "wnf_volume" in enc:
            return enc["wnf_volume"]
        if not hasattr(self, "_dense_wnf_fn"):
            self._dense_wnf_fn = jax.jit(
                lambda fv: dense_decode(jnp.swapaxes(fv, 1, 3),
                                        self._vd_layers,
                                        self.volume_size, slab=self._slab,
                                        precision=self.precision,
                                        mesh=self.mesh))
        return self._dense_wnf_fn(enc["feature_volume"])

    def warp_dispatch(self, enc: dict, meshes: list):
        """Dispatch one batched warp + ggm-gather program over all garments'
        MC verts; returns an opaque handle for warp_collect. Starts the
        async host copy of the (single, channel-combined) result buffer —
        with depth-2 collection it has a full pipeline iteration to stream
        over the link."""
        B = len(meshes)
        sizes = [0 if m is None else len(m[0]) for m in meshes]
        vmax = max(sizes) if sizes else 0
        if vmax == 0:
            return (None, sizes)
        padded = -(-vmax // self.warp_bucket) * self.warp_bucket
        q = np.zeros((B, padded, 3), np.float16)
        for b, m in enumerate(meshes):
            if m is not None:
                q[b, :len(m[0])] = m[0]
        if getattr(self, "device_normals", False):
            out = self._warp(self.variables, enc["feature_volume"],
                             enc["wnf_ggm"], enc["wnf_volume"],
                             jnp.asarray(q))
        else:
            out = self._warp(self.variables, enc["feature_volume"],
                             enc["wnf_ggm"], jnp.asarray(q))
        if hasattr(out, "copy_to_host_async"):
            out.copy_to_host_async()
        return (out, sizes)

    def _split_channels(self, rows):
        res = {"warp_field": rows[..., :3], "verts_ggm": rows[..., 3]}
        if self.use_hole_prediction:
            res["mc_surface_logits"] = rows[..., 4]
        if getattr(self, "device_normals", False):
            from garmentnets_tpu.ops.normals import oct_decode_np
            res["normals"] = oct_decode_np(rows[..., -1])
        return res

    def warp_collect(self, handle) -> list:
        from garmentnets_tpu.harness.linkguard import guarded_fetch
        out, sizes = handle
        if out is None:
            return [None] * len(sizes)
        out = guarded_fetch(lambda: np.asarray(out), "warp result buffer")
        return [None if n == 0 else self._split_channels(out[b, :n])
                for b, n in enumerate(sizes)]

    def warp_batch(self, enc: dict, meshes: list) -> list:
        """Dispatch + collect in one call (see warp_dispatch/warp_collect).

        meshes: list of (verts, faces) or None. Returns per-garment dicts
        {warp_field [V,3], verts_ggm [V] [, mc_surface_logits [V]]} or None.
        """
        return self.warp_collect(self.warp_dispatch(enc, meshes))

    # back-compat single-garment warp (tests)
    def warp(self, feature_volume, mc_verts: np.ndarray) -> dict:
        v = len(mc_verts)
        padded = -(-max(v, 1) // self.warp_bucket) * self.warp_bucket
        q = np.zeros((1, padded, 3), np.float16)
        q[0, :v] = mc_verts
        S = self.volume_size
        ggm_dummy = jnp.zeros((1, S, S, S), jnp.float32)
        if getattr(self, "device_normals", False):
            out = np.asarray(self._warp(self.variables, feature_volume,
                                        ggm_dummy, ggm_dummy,
                                        jnp.asarray(q)))
            res = self._split_channels(out[0, :v])
            # this back-compat API has no WNF volume to sample gradients
            # from (the dummy yields meaningless vectors) — drop them
            # rather than hand the caller junk; use warp_batch for normals
            res.pop("normals", None)
            return res
        out = np.asarray(self._warp(self.variables, feature_volume,
                                    ggm_dummy, jnp.asarray(q)))
        return self._split_channels(out[0, :v])
