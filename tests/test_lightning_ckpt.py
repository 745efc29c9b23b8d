"""Real-checkpoint ingestion + PyG-semantics sensitivity (VERDICT r1 #1/#3).

Two gaps closed here:

1. tools/convert_checkpoint.py was only ever fed in-memory state_dicts; the
   released checkpoints are PyTorch-Lightning FILES (torch.save payloads
   with `state_dict` / `hyper_parameters` / optimizer state, exactly what
   reference train_pointnet2.py:47-56's ModelCheckpoint writes and
   predict.py:101-105 loads). test_lightning_ckpt_file_ingest builds a
   faithful Lightning-format .ckpt on disk, pushes it through the converter
   CLI path (main()), and checks the loaded model's forward matches the
   torch source module.

2. The torch twin deliberately uses this repo's deterministic conventions
   (FPS start 0, K-nearest ball query) while the reference's torch_cluster
   uses random-start FPS and first-K-found-within-radius
   (components/pointnet2.py:26-29). test_pyg_semantics_nocs_delta runs the
   SAME weights under both semantics and quantifies how far the predicted
   NOCS move — bounding the parity risk named in SURVEY.md §7 ("parity must
   be measured at metric level, not index level"). Measured numbers are
   recorded in docs/PARITY.md.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import sys, pathlib  # noqa: E402
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
import convert_checkpoint as cc  # noqa: E402
import torch_twin as tw  # noqa: E402

from garmentnets_tpu.core.builders import build_pointnet2_config  # noqa: E402
from garmentnets_tpu.core.checkpoint import load_checkpoint  # noqa: E402
from garmentnets_tpu.models.pointnet2_nocs import PointNet2NOCS  # noqa: E402


def _lightning_ckpt_payload(module: torch.nn.Module, hparams: dict) -> dict:
    """A faithful PyTorch-Lightning checkpoint dict: the keys Lightning's
    ModelCheckpoint writes for `save_weights_only=False` (reference
    train_pointnet2.py:47-56). hyper_parameters carries the ctor kwargs
    captured by save_hyperparameters (networks/pointnet2_nocs.py:78)."""
    sd = module.state_dict()
    adam_state = {
        i: {"step": torch.tensor(100),
            "exp_avg": torch.zeros_like(p),
            "exp_avg_sq": torch.zeros_like(p)}
        for i, p in enumerate(module.parameters())
    }
    return {
        "epoch": 12,
        "global_step": 34567,
        "pytorch-lightning_version": "1.2.10",
        "state_dict": sd,
        "callbacks": {
            "ModelCheckpoint": {
                "monitor": "val_loss",
                "best_model_score": torch.tensor(0.0123),
                "best_model_path": "checkpoints/epoch=12-val_loss=0.0123.ckpt",
            }
        },
        "optimizer_states": [{
            "state": adam_state,
            "param_groups": [{"lr": 1e-4, "betas": (0.9, 0.999),
                              "eps": 1e-8, "weight_decay": 0,
                              "params": list(range(len(adam_state)))}],
        }],
        "lr_schedulers": [],
        "hyper_parameters": hparams,
    }


def _randomize_stats(module, seed=7):
    gen = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.data = 0.2 * torch.randn(
                m.running_mean.shape, generator=gen)
            m.running_var.data = 0.5 + torch.rand(
                m.running_var.shape, generator=gen)


def test_lightning_ckpt_file_ingest(tmp_path):
    """Lightning .ckpt FILE -> convert_checkpoint.main -> our checkpoint ->
    model rebuilt from embedded hparams -> forward matches the torch
    source."""
    torch.manual_seed(3)
    twin = tw.TwinPointNet2NOCS(sa1_r=0.2, sa2_r=0.4)
    _randomize_stats(twin)
    twin.eval()

    # the reference's full stage-1 hparam surface
    # (config/train_pointnet2_default.yaml:30-48 + batch_size kwarg)
    hparams = {
        "feature_dim": 128, "batch_norm": True, "dropout": True,
        "sa1_ratio": 0.5, "sa1_r": 0.2, "sa2_ratio": 0.25, "sa2_r": 0.4,
        "fp3_k": 1, "fp2_k": 3, "fp1_k": 3, "symmetry_axis": None,
        "nocs_bins": 64, "learning_rate": 1e-4, "nocs_loss_weight": 1,
        "grip_point_loss_weight": 1, "vis_per_items": 21,
        "max_vis_per_epoch_train": 10, "max_vis_per_epoch_val": 40,
        "batch_size": 8,
    }
    src = tmp_path / "epoch=12-val_loss=0.0123.ckpt"
    dst = tmp_path / "converted.ckpt"
    torch.save(_lightning_ckpt_payload(twin, hparams), src)

    cc.main(str(src), str(dst))

    state, hp = load_checkpoint(dst)
    assert hp is not None
    # training-irrelevant Lightning kwargs are stripped, model kwargs kept
    assert "vis_per_items" not in hp and "batch_size" not in hp
    assert hp["nocs_bins"] == 64 and hp["sa2_r"] == 0.4

    cfg = build_pointnet2_config(hp)
    model = PointNet2NOCS(cfg)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}

    rng = np.random.RandomState(11)
    x = rng.rand(2, 128, 3).astype(np.float32)
    pos = (rng.rand(2, 128, 3) - 0.5).astype(np.float32)
    out = model.apply(variables, jnp.asarray(x), jnp.asarray(pos),
                      train=False)
    with torch.no_grad():
        ref = twin(torch.from_numpy(x), torch.from_numpy(pos))
    np.testing.assert_allclose(
        np.asarray(out["per_point_logits"]),
        ref["per_point_logits"].numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["global_logits"]),
        ref["global_logits"].numpy(), rtol=1e-3, atol=2e-4)


def _set_pyg_mode(twin, on: bool, starts=None):
    for name in ("sa1_module", "sa2_module"):
        sa = getattr(twin, name)
        sa.pyg_mode = on
        sa.fps_start = None
    if on and starts is not None:
        twin.sa1_module.fps_start = starts


def test_pyg_semantics_nocs_delta():
    """Same weights, two neighbor-selection semantics, at a point density
    where the 64-neighbor cap SATURATES (so first-K-found and K-nearest
    genuinely pick different sets — the precondition is asserted, since at
    the repo's usual test densities the ball is under-full and the two
    semantics coincide). Reports and bounds:
    - SA1 feature delta: the raw injected divergence (~1% relative here)
    - logits delta / bin-flip fraction / mean |delta NOCS| end-to-end
    Measured result (recorded in docs/PARITY.md): the max-pool aggregation
    stages structurally attenuate the neighbor-set difference by ~3 orders
    of magnitude — final logits move ~2e-5 relative and ZERO argmax NOCS
    bins flip, across random-FPS-start seeds. The assertion rails are set
    10x above measurement to catch regressions, not noise."""
    torch.manual_seed(0)
    B, N = 2, 512
    SA1_R, SA2_R = 0.35, 0.6
    twin = tw.TwinPointNet2NOCS(nocs_bins=64, sa1_r=SA1_R, sa2_r=SA2_R)
    _randomize_stats(twin)
    twin.eval()

    rng = np.random.RandomState(42)
    x = torch.from_numpy(rng.rand(B, N, 3).astype(np.float32))
    pos = torch.from_numpy((rng.rand(B, N, 3) - 0.5).astype(np.float32))

    # precondition: the two ball-query semantics disagree for a sizable
    # fraction of centers at this density
    idx = tw.fps(pos, N // 2)
    centers = torch.gather(pos, 1, idx[..., None].expand(-1, -1, 3))
    k0, m0 = tw.ball_query(pos, centers, SA1_R, 64)
    k1, m1 = tw.ball_query_first_k(pos, centers, SA1_R, 64)
    n_diff = sum(
        set(k0[b, m][m0[b, m]].tolist()) != set(k1[b, m][m1[b, m]].tolist())
        for b in range(B) for m in range(N // 2))
    assert n_diff > 0.2 * B * (N // 2), (
        f"density too low to exercise the semantics difference: "
        f"{n_diff}/{B * (N // 2)} centers diverge")

    def forward():
        with torch.no_grad():
            out = twin(x, pos)
        bins = twin.nocs_bins
        logits = out["per_point_logits"]
        lb = logits.view(B, N, bins, 3)
        return logits.numpy(), lb.argmax(-2).numpy()

    _set_pyg_mode(twin, False)
    det_logits, det_bins = forward()
    with torch.no_grad():
        sa1_det = twin.sa1_module(x, pos)[0]
    # SA1 divergence with IDENTICAL centers (fps start 0 in both modes) so
    # the elementwise compare isolates the ball-query semantics change
    _set_pyg_mode(twin, True, None)
    with torch.no_grad():
        sa1_pyg = twin.sa1_module(x, pos)[0]

    flip_fracs, nocs_deltas, logit_deltas = [], [], []
    for seed in range(3):
        g = torch.Generator().manual_seed(seed)
        starts = torch.randint(0, N, (B,), generator=g)
        _set_pyg_mode(twin, True, starts)
        pyg_logits, pyg_bins = forward()
        flip_fracs.append(float((pyg_bins != det_bins).mean()))
        nocs_deltas.append(float(
            np.abs(pyg_bins - det_bins).mean() / (twin.nocs_bins - 1)))
        logit_deltas.append(float(np.abs(pyg_logits - det_logits).mean()))
    _set_pyg_mode(twin, False)

    sa1_delta = float((sa1_pyg - sa1_det).abs().mean()
                      / sa1_det.abs().mean())
    flip, dnocs = max(flip_fracs), max(nocs_deltas)
    dlogit = max(logit_deltas) / float(np.abs(det_logits).mean())
    print(f"\nneighbor-selection sensitivity ({n_diff} divergent centers, "
          f"3 seeds): SA1 rel delta {sa1_delta:.2e}, logits rel delta "
          f"{dlogit:.2e}, bin-flip fraction {flip:.4f}, "
          f"mean |dNOCS| {dnocs:.5f}")
    assert sa1_delta > 1e-4, "PyG mode changed nothing — mode plumbing broken"
    # measured: dlogit ~2e-5, flip = 0, dnocs = 0; rails at ~10x
    assert dlogit < 5e-3, dlogit
    assert flip < 0.02, flip
    assert dnocs < 0.005, dnocs
