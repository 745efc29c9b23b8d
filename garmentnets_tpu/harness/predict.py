"""Predict CLI: end-to-end inference -> prediction.zarr.

Capability parity with reference `predict.py` (call stack SURVEY.md §3.3):
per sample it writes the same prediction.zarr schema — marching_cubes_mesh
{verts, faces, normals, volume_value, volume_gradient_magnitude, warp_field
[, is_on_surface]}, point_cloud {pred/gt nocs + inputs}, copied
gt_marching_cubes_mesh, rot-augmented gt_mesh, misc grip-point data — and
preserves the NaN-sentinel protocol on marching-cubes failure
(reference predict.py:165-189).

TPU-native upgrades:
- batched multi-garment inference (the reference asserts batch_size==1),
- one fused device program per batch (see predict_engine),
- device/host pipelining: batch i+1's device program is dispatched before
  batch i's host marching cubes runs.
"""
from __future__ import annotations

import collections
import pathlib
import sys
import time

import numpy as np

from garmentnets_tpu.core import config as config_mod
from garmentnets_tpu.core.checkpoint import load_checkpoint
from garmentnets_tpu.core.builders import pipeline_config_from_hparams
from garmentnets_tpu.core.logging import make_logger
from garmentnets_tpu.data import zarrlite
from garmentnets_tpu.data.dataset import ConvImplicitWNFDataModule
from garmentnets_tpu.harness.predict_engine import PredictEngine


def load_pipeline_checkpoint(path):
    state, hparams = load_checkpoint(path)
    assert hparams is not None, "checkpoint missing embedded hparams"
    cfg = pipeline_config_from_hparams(hparams)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    return cfg, variables


def _nan_mc_placeholders():
    return {
        "verts": np.full((1, 3), np.nan, np.float32),
        "faces": np.zeros((1, 3), np.int32),
        "normals": np.full((1, 3), np.nan, np.float32),
        "volume_value": np.full((1,), np.nan, np.float32),
        "volume_gradient_magnitude": np.full((1,), np.nan, np.float32),
        "warp_field": np.full((1, 3), np.nan, np.float32),
    }


def _write_group(group, data: dict):
    for key, arr in data.items():
        arr = np.asarray(arr)
        # Blosc zstd-6 bitshuffle: the reference's prediction.zarr
        # compressor (predict.py:75-79), so outputs are byte-format
        # compatible with stock zarr+numcodecs consumers.
        group.array(name=key, data=arr,
                    chunks=arr.shape if arr.size else None,
                    compressor="blosc")


def process_item(engine, enc_np, item, batch_np, input_group, output_group,
                 pred_cfg, mesh, warp):
    """Host post-processing for one garment of a batch (writes)."""
    mc_data = _nan_mc_placeholders()
    if mesh is not None and warp is not None:
        mc_verts, mc_faces, mc_values, mc_normals = mesh
        if mc_normals is None:    # device_normals engines: normals ride the
            mc_normals = warp["normals"]        # warp result (ops/normals)
        mc_data = {
            "verts": mc_verts.astype(np.float32),
            "faces": mc_faces.astype(np.int32),
            # unit volume-gradient normals (skimage semantics: central
            # differences of the field lerped at the vertex; reference
            # stores skimage's gradient normals, predict.py:172-197) —
            # from the host MC kernel, or the device warp program when
            # engine.device_normals is on
            "normals": mc_normals.astype(np.float32),
            # true per-vertex volume value, emitted by the host MC kernel
            # from its corner values (skimage `values` semantics — max of
            # the vertex's crossing-edge endpoints; reference stores
            # skimage's output at predict.py:195-197)
            "volume_value": mc_values.astype(np.float32),
            "volume_gradient_magnitude":
                warp["verts_ggm"].astype(np.float32),
            "warp_field": warp["warp_field"].astype(np.float32),
        }
        if pred_cfg.get("use_hole_prediction"):
            logits = warp["mc_surface_logits"].astype(np.float32)
            mc_data["is_on_surface"] = logits > 0
            mc_data["is_on_surface_logits"] = logits

    _write_group(output_group.require_group("marching_cubes_mesh"), mc_data)

    pc_data = {
        "pred_nocs": enc_np["pred_nocs"][item],
        "pred_nocs_confidence": enc_np["pred_nocs_confidence"][item].astype(
            np.float32),
        "input_points": batch_np["pos"][item],
        "input_rgb": (batch_np["x"][item] * 255).astype(np.uint8),
        "gt_nocs": batch_np["y"][item],
    }
    if "per_point_logits" in enc_np:
        # f16 on the link; f32 in the zarr (schema dtype). Stored for
        # reference-schema parity (predict.py:211-236); nothing in eval
        # reads them — prediction.store_pred_nocs_logits=false skips the
        # fetch+write entirely (the [B,6000,192] logits are the largest
        # per-batch transfer and zarr write).
        pc_data["pred_nocs_logits"] = (
            enc_np["per_point_logits"][item].astype(np.float32))
    _write_group(output_group.require_group("point_cloud"), pc_data)

    # copy gt marching cube mesh + rot-augmented gt mesh
    zarrlite.copy(input_group["marching_cube_mesh"], output_group,
                  name="gt_marching_cubes_mesh")
    rot_mat = batch_np["input_aug_rot_mat"][item]
    gt_mesh_out = output_group.require_group("gt_mesh")
    for key, value in input_group["mesh"].arrays():
        data = value[:]
        if key == "cloth_verts":
            data = data @ rot_mat.T
        gt_mesh_out.array(name=key, data=data, compressor="blosc")

    # grip point predictions (reference predict.py:254-279)
    global_logits = enc_np["global_logits"][item]
    bins = global_logits.shape[-1] // 3
    gb = global_logits.reshape(bins, 3)
    grip_bin = np.argmax(gb, axis=0)
    # REFERENCE QUIRK preserved for output/metric parity: predict.py:145
    # builds its VirtualGrid with grid_shape=(volume_size,)*3 — the 128^3
    # PREDICTION grid, not the 64-bin NOCS grid — so idxs_to_points scales
    # the argmax bin by 1/(volume_size-1), NOT the training-consistent
    # 1/(bins-1). eval's grip_point_*_global metrics consume this value
    # (reference eval.py:152,163), so we reproduce the same mapping.
    pred_grip = grip_bin.astype(np.float32) / (pred_cfg["volume_size"] - 1)
    eg = np.exp(gb - gb.max(axis=0, keepdims=True))
    grip_conf = eg / eg.sum(axis=0, keepdims=True)

    pos = batch_np["pos"][item]
    grip_idx = int(np.argmin(np.linalg.norm(pos, axis=1)))
    pred_grip_nn = enc_np["pred_nocs"][item][grip_idx]

    misc = {
        "gt_nocs_grip_point": batch_np["nocs_grip_point"][item],
        "pred_nocs_grip_point": pred_grip_nn,
        "pred_global_nocs_grip_point": pred_grip,
        "pred_global_confidence": grip_conf,
        "global_feature": enc_np["global_feature"][item],
    }
    _write_group(output_group.require_group("misc"), misc)
    return mc_data


def main(cfg, run_dir=None) -> pathlib.Path:
    run_dir = config_mod.make_run_dir(run_dir=run_dir)
    logger = make_logger(run_dir, cfg.get("logger"))

    checkpoint_path = pathlib.Path(cfg["main"]["checkpoint_path"]).expanduser()
    assert checkpoint_path.exists(), checkpoint_path
    pipe_cfg, variables = load_pipeline_checkpoint(checkpoint_path)

    datamodule = ConvImplicitWNFDataModule(**cfg["datamodule"])
    datamodule.prepare_data()
    val_dataset = datamodule.val_dataset
    subset = cfg["prediction"]["subset"]
    dataloader = getattr(datamodule, f"{subset}_dataloader")()

    input_root = zarrlite.open(cfg["datamodule"]["zarr_path"], "r")
    input_samples_group = input_root["samples"]

    output_zarr_path = run_dir / "prediction.zarr"
    output_root = zarrlite.open(str(output_zarr_path), "a")
    output_samples = output_root.require_group("samples")
    output_root.attrs.put({"subset": subset})

    config_mod.dump_config(cfg, run_dir, extra={
        "meta": {"script_path": __file__},
        "wandb": {"run_name": logger.name, "run_id": logger.name},
    })

    pred_cfg = dict(cfg["prediction"])
    volume_size = pred_cfg["volume_size"]
    from garmentnets_tpu.harness.predict_engine import (
        decode_precision_from_str)
    precision = decode_precision_from_str(
        pred_cfg.get("decode_precision", "high"))
    engine = PredictEngine(
        pipe_cfg, variables, volume_size=volume_size,
        gradient_sigma=pred_cfg["gradient_sigma"],
        iso_level=pred_cfg["iso_surface_level"],
        gradient_direction=pred_cfg["gradient_direction"],
        precision=precision,
        use_hole_prediction=bool(pred_cfg.get("use_hole_prediction")),
        task_aabb=(val_dataset.cloth_sim_aabb
                   if pipe_cfg.volume_task_space else None),
        device_normals=pred_cfg.get("device_normals"))

    store_logits = bool(pred_cfg.get("store_pred_nocs_logits", True))
    fetch_keys = ["pred_nocs", "pred_nocs_confidence", "global_logits",
                  "global_feature"]
    if store_logits:
        fetch_keys.append("per_point_logits")

    t_start = time.time()
    n_done = 0

    def finalize(entry):
        """Collect one in-flight batch's warp results and write its zarr
        groups. Runs on the writer thread so Blosc compression + zarr IO
        overlap the next batches' device work and host marching cubes
        (measured: the schema output path, not the device programs,
        dominates the CLI on this 1-core host — docs/PERF.md)."""
        nonlocal n_done
        enc, batch_np, meshes, warp_handle, bidx = entry
        warps = engine.warp_collect(warp_handle)
        from garmentnets_tpu.harness.linkguard import guarded_fetch
        enc_np = guarded_fetch(
            lambda: {k: np.asarray(v) for k, v in enc.items()
                     if k in fetch_keys},
            "point-cloud output fetch")
        b = batch_np["x"].shape[0]
        for item in range(b):
            dataset_idx = int(batch_np["dataset_idx"][item])
            row = val_dataset.groups_df.iloc[dataset_idx]
            group_key = row.group_key
            attrs = {k: row[k] for k in
                     ("scale", "gender", "sample_id", "garment_name",
                      "grip_vertex_idx")}
            for k in ("gender", "grip_vertex_idx"):
                attrs[k] = int(attrs[k])
            attrs["batch_idx"] = bidx
            out_group = output_samples.require_group(group_key)
            out_group.attrs.put(attrs)
            process_item(engine, enc_np, item, batch_np,
                         input_samples_group[group_key], out_group,
                         pred_cfg, meshes[item], warps[item])
            n_done += 1
        logger.log({"prediction_batch_idx": bidx}, step=bidx)

    # Writer thread: zarr writes (Blosc compression + IO) run off the
    # dispatch thread so they overlap device compute AND host MC of later
    # batches (VERDICT r3 #6). The bounded queue caps in-flight host
    # buffers; an exception on the writer surfaces on the main thread.
    import queue
    import threading
    write_q: "queue.Queue" = queue.Queue(maxsize=4)
    writer_err: list = []

    def writer_loop():
        while True:
            entry = write_q.get()
            if entry is None:
                return
            try:
                finalize(entry)
            except BaseException as e:  # noqa: BLE001 — re-raised on main
                writer_err.append(e)
                return

    writer = threading.Thread(target=writer_loop, daemon=True)
    writer.start()

    def check_writer():
        if writer_err:
            raise writer_err[0]

    def writer_put(entry):
        # never block indefinitely on a full queue if the writer died
        while True:
            check_writer()
            try:
                write_q.put(entry, timeout=5)
                return
            except queue.Full:
                continue

    # 4-stage pipeline: device encode(i+1) overlaps host MC(i); warp results
    # are collected at depth 2 — the device executes warp(i) after
    # encode(i+1) (FIFO), so collecting one batch later gives the result
    # transfer a full iteration to stream over the slow d2h link.
    pending = None  # (enc_device, batch_np)
    inflight = collections.deque()
    batch_iter = iter(dataloader)
    batch_idx = 0
    while True:
        nxt = next(batch_iter, None)
        if nxt is not None:
            enc = engine.encode(nxt["x"], nxt["pos"])  # async dispatch
            # start async host copies (brick pages + point-cloud outputs)
            engine.prefetch(enc, extra_keys=tuple(fetch_keys))
            nxt_pending = (enc, nxt)
        else:
            nxt_pending = None

        if pending is not None:
            enc, batch_np = pending
            # host marching cubes for the batch (one brick-page fetch),
            # then dispatch one batched warp program
            meshes = engine.extract_meshes(enc)
            handle = engine.warp_dispatch(enc, meshes)
            inflight.append((enc, batch_np, meshes, handle, batch_idx))
            batch_idx += 1
            while len(inflight) > 2:
                writer_put(inflight.popleft())

        pending = nxt_pending
        if pending is None:
            break
    while inflight:
        writer_put(inflight.popleft())
    writer_put(None)
    writer.join()
    check_writer()

    elapsed = time.time() - t_start
    logger.summary["garments"] = n_done
    logger.summary["elapsed_sec"] = elapsed
    logger.summary["garments_per_sec"] = n_done / max(elapsed, 1e-9)
    logger.close()
    return run_dir


def cli():
    overrides = config_mod.parse_cli(sys.argv[1:])
    cfg = config_mod.load_config("predict_default", overrides)
    out = main(cfg)
    print(out)


if __name__ == "__main__":
    cli()
