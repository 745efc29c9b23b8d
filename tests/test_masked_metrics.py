"""Padded-row masking: val metrics must be exact for any split size.

The trainer pads partial batches by repeating row 0 (parallel/mesh.py) and
flags real rows with '_valid_mask'; every loss reduction must exclude padded
rows so val_loss (and hence checkpoint top-k selection) is identical to the
unpadded computation.
"""
import numpy as np
import jax.numpy as jnp

from garmentnets_tpu.models.losses import masked_mean
from garmentnets_tpu.models.pipeline import PipelineConfig, pipeline_loss
from garmentnets_tpu.models.pointnet2_nocs import (
    PointNet2NOCSConfig, get_metrics)
from garmentnets_tpu.parallel.mesh import pad_batch_to


def _pad_with_mask(batch, target):
    padded, real_b = pad_batch_to(batch, target)
    mask = np.zeros((target,), np.float32)
    mask[:real_b] = 1.0
    padded = dict(padded)
    padded["_valid_mask"] = mask
    return padded


def test_masked_mean_matches_unpadded():
    rng = np.random.RandomState(0)
    x = rng.rand(3, 5, 2).astype(np.float32)
    x_pad = np.concatenate([x, np.repeat(x[:1], 5, axis=0)], axis=0)
    mask = jnp.asarray([1, 1, 1, 0, 0, 0, 0, 0], jnp.float32)
    np.testing.assert_allclose(
        float(masked_mean(jnp.asarray(x_pad), mask)),
        float(np.mean(x)), rtol=1e-6)


def test_pipeline_loss_ignores_padding():
    rng = np.random.RandomState(1)
    cfg = PipelineConfig()
    B, nv, ns = 3, 16, 16
    result = {
        "pred_volume_value": rng.randn(B, nv).astype(np.float32),
        "pred_sim_points": rng.randn(B, ns, 3).astype(np.float32),
    }
    batch = {
        "gt_volume_value": rng.rand(B, nv).astype(np.float32),
        "gt_sim_points": rng.rand(B, ns, 3).astype(np.float32),
    }
    want = pipeline_loss(cfg, result, batch)

    pad_result = {k: np.concatenate(
        [v, rng.randn(5, *v.shape[1:]).astype(np.float32)])
        for k, v in result.items()}  # pad predictions are garbage on purpose
    pad_batch = _pad_with_mask(batch, 8)
    got = pipeline_loss(cfg, pad_result, pad_batch)
    for k in want:
        np.testing.assert_allclose(
            float(got[k]), float(want[k]), rtol=1e-5, err_msg=k)


def test_stage1_metrics_ignore_padding():
    rng = np.random.RandomState(2)
    cfg = PointNet2NOCSConfig(nocs_bins=8, feature_dim=16,
                              symmetry_axis=0)  # exercises min-over-mirror
    B, N = 3, 32
    result = {
        "per_point_logits": rng.randn(B, N, 8 * 3).astype(np.float32),
        "global_logits": rng.randn(B, 8 * 3).astype(np.float32),
        "per_point_features": rng.randn(B, N, 16).astype(np.float32),
    }
    batch = {
        "y": rng.rand(B, N, 3).astype(np.float32),
        "nocs_grip_point": rng.rand(B, 3).astype(np.float32),
    }
    want, _ = get_metrics(cfg, result, batch)

    pad_result = {k: np.concatenate(
        [v, rng.randn(1, *v.shape[1:]).astype(np.float32)])
        for k, v in result.items()}
    pad_batch = _pad_with_mask(batch, 4)
    got, _ = get_metrics(cfg, pad_result, pad_batch)
    for k in want:
        np.testing.assert_allclose(
            float(got[k]), float(want[k]), rtol=1e-5, err_msg=k)


def test_metric_flusher_batched_transfer(tmp_path):
    """MetricFlusher must log the same values a per-step float() sync would,
    in the same order, with the right prefixes/steps."""
    import json
    from garmentnets_tpu.core.logging import RunLogger
    from garmentnets_tpu.harness.training import (
        MetricFlusher, metrics_to_host)

    dicts = [{"loss": jnp.float32(i), "err": jnp.float32(10 * i)}
             for i in range(5)]
    rows = metrics_to_host(dicts)
    assert rows == [{"loss": float(i), "err": float(10 * i)}
                    for i in range(5)]
    # heterogeneous keys fall back without loss of data
    het = [{"a": jnp.float32(1)}, {"b": jnp.float32(2)}]
    assert metrics_to_host(het) == [{"a": 1.0}, {"b": 2.0}]

    logger = RunLogger(tmp_path / "run")
    fl = MetricFlusher(logger, flush_every=3)
    for i, m in enumerate(dicts):
        fl.add("train_", m, step=i)
    fl.flush()
    logger.close()
    recs = [json.loads(line) for line in
            (tmp_path / "run" / "metrics.jsonl").open()]
    assert [r["_step"] for r in recs] == list(range(5))
    assert [r["train_loss"] for r in recs] == [float(i) for i in range(5)]
    assert [r["train_err"] for r in recs] == [float(10 * i) for i in range(5)]
