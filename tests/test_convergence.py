"""Learning sanity: a small stage-1 model trained briefly on synthetic data
must reduce NOCS error well below the untrained baseline.

This is the strongest integration evidence that loss wiring, masked BN,
gradient flow, and the data pipeline are all correct together (the reference
has no equivalent test — SURVEY.md §4)."""
import numpy as np
import jax
import pytest

from garmentnets_tpu.data.synthetic import generate_dataset
from garmentnets_tpu.data.dataset import ConvImplicitWNFDataset, collate
from garmentnets_tpu.models.pointnet2_nocs import (
    PointNet2NOCS, PointNet2NOCSConfig, get_metrics)
from garmentnets_tpu.harness.training import make_train_fns


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    path = tmp_path_factory.mktemp("conv") / "synth.zarr"
    generate_dataset(str(path), num_instances=2, grips_per_instance=2,
                     volume_size=16, mesh_res=8, pts_per_view=400)
    return ConvImplicitWNFDataset(
        zarr_path=str(path), num_pc_sample=256, volume_size=None,
        enable_augumentation=False, static_epoch_seed=True)


def test_stage1_learns(ds):
    cfg = PointNet2NOCSConfig(feature_dim=32, nocs_bins=8, dropout=False,
                              sa1_r=0.15, sa2_r=0.3, learning_rate=1e-3)
    model = PointNet2NOCS(cfg)

    batch = collate([ds[i] for i in range(4)])

    def init_fn(rng, b):
        return model.init(rng, b["x"], b["pos"], train=False)

    def apply_fn(v, b, train, mutable, rngs):
        return model.apply(v, b["x"], b["pos"], train=train,
                           mutable=mutable, rngs=rngs)

    def loss_fn(out, b):
        return get_metrics(cfg, out, b)[0]

    init_state, train_step, eval_step = make_train_fns(
        init_fn, apply_fn, loss_fn, cfg.learning_rate)
    rng = jax.random.PRNGKey(0)
    state = init_state(rng, batch)

    # Assert on the TRAIN-mode loss trajectory, exactly as test_stage2_learns
    # does. Eval-mode NOCS error at this horizon is CHAOTIC: BN running
    # stats lag, and Adam turns rounding-level gradient differences across
    # equivalent XLA compilations into full-LR parameter flips (measured
    # round 3: one step from the same state differs by exactly lr=1e-3 in
    # ~11k of 7.4M params between bit-identical gather formulations), so a
    # fixed eval-error threshold flips red/green per host. The train CE loss
    # on a 4-sample memorization task is compilation-robust: measured
    # trajectory on this host is 9.17 -> 0.35 (step 20) -> 0.028 (step 100),
    # a 300x drop, so the 0.2x bar below has >20x margin.
    # Invariant guaranteed: gradients flow through the full SA/FP/head stack
    # and reduce the bin-CE loss — a broken gradient path (stop_gradient,
    # detached head, wrong label wiring) cannot cut the loss 5x.
    losses = []
    for i in range(100):
        rng, k = jax.random.split(rng)
        state, metrics = train_step(state, batch, k)
        losses.append(float(metrics["loss"]))
    start = float(np.mean(losses[:5]))
    end = float(np.mean(losses[-5:]))
    assert np.isfinite(end)
    assert end < start * 0.2, (start, end, losses[::10])


def test_stage2_learns(tmp_path_factory):
    """Stage-2 learning sanity: a small WNF pipeline trained briefly on a
    4-sample memorization task must substantially reduce the volume (WNF)
    loss below the untrained baseline — integration evidence for the
    aggregator scatter, U-Net, implicit decoders, and volume/surface GT
    sampling together."""
    from garmentnets_tpu.models.pipeline import (
        ConvImplicitWNFPipeline, PipelineConfig, pipeline_loss)

    path = tmp_path_factory.mktemp("conv2") / "synth.zarr"
    generate_dataset(str(path), num_instances=2, grips_per_instance=2,
                     volume_size=16, mesh_res=8, pts_per_view=400)
    ds2 = ConvImplicitWNFDataset(
        zarr_path=str(path), num_pc_sample=256, num_volume_sample=128,
        num_surface_sample=128, volume_size=16,
        volume_group="nocs_winding_number_field",
        enable_augumentation=False, static_epoch_seed=True)

    cfg = PipelineConfig(
        pointnet2=PointNet2NOCSConfig(feature_dim=32, nocs_bins=8,
                                      dropout=False, sa1_r=0.15, sa2_r=0.3),
        grid_shape=(8, 8, 8), unet_f_maps=8, unet_num_levels=2,
        unet_in_channels=128, unet_out_channels=16,
        volume_decoder_channels=(16, 32, 1),
        surface_decoder_channels=(16, 32, 3), learning_rate=3e-3)
    model = ConvImplicitWNFPipeline(cfg)

    batch = collate([ds2[i] for i in range(4)])

    def init_fn(rng, b):
        return model.init(rng, b, train=False)

    def apply_fn(v, b, train, mutable, rngs):
        return model.apply(v, b, train=train, mutable=mutable, rngs=rngs)

    def loss_fn(out, b):
        return pipeline_loss(cfg, out, b)

    init_state, train_step, eval_step = make_train_fns(
        init_fn, apply_fn, loss_fn, cfg.learning_rate)
    rng = jax.random.PRNGKey(0)
    state = init_state(rng, batch)

    # assert on the TRAIN-mode loss trajectory: eval-mode loss is unusable
    # at this horizon (BN running stats lag across the stacked stage-1 /
    # aggregator / decoder BNs — same caveat as test_stage1_learns)
    losses = []
    for i in range(150):
        rng, k = jax.random.split(rng)
        state, metrics = train_step(state, batch, k)
        losses.append(float(metrics["loss"]))
    start = float(np.mean(losses[:5]))
    end = float(np.mean(losses[-5:]))
    assert np.isfinite(end)
    # the frozen random stage-1 slows the fit (stop_gradient — as in real
    # stage-2 training); measured trajectory halves by ~step 90 and reaches
    # ~0.25x by step 150 at this lr
    assert end < start * 0.5, (start, end)
