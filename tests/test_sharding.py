"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    vol, surf = out
    assert vol.shape == (2, 64)
    assert surf.shape == (2, 64, 3)
    assert np.isfinite(np.asarray(vol)).all()


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)


def test_predict_engine_sharded():
    """Batched predict engine over a 4-device mesh: batch axis sharded."""
    from jax.sharding import Mesh
    from garmentnets_tpu.harness.predict_engine import PredictEngine

    cfg = graft._small_cfg()
    from garmentnets_tpu.models.pipeline import ConvImplicitWNFPipeline
    model = ConvImplicitWNFPipeline(cfg)
    batch = graft._make_batch(B=4)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    engine = PredictEngine(cfg, variables, volume_size=16,
                           mesh=mesh, warp_bucket=64, return_volume=True)
    out = engine.encode(batch["x"], batch["pos"])
    wnf = np.asarray(out["wnf_volume"])
    assert wnf.shape == (4, 16, 16, 16)
    assert np.isfinite(wnf).all()
    # unsharded engine agrees with sharded
    engine1 = PredictEngine(cfg, variables, volume_size=16,
                            warp_bucket=64, return_volume=True)
    out1 = engine1.encode(batch["x"], batch["pos"])
    np.testing.assert_allclose(
        wnf, np.asarray(out1["wnf_volume"]), rtol=1e-4, atol=1e-5)
    # mesh extraction + batched warp round-trip
    meshes = engine1.extract_meshes(out1)
    warps = engine1.warp_batch(out1, meshes)
    for m, w in zip(meshes, warps):
        assert (m is None) == (w is None)
        if m is not None:
            assert w["warp_field"].shape == (len(m[0]), 3)
            assert w["verts_ggm"].shape == (len(m[0]),)
    # single-garment warp helper
    verts = np.random.RandomState(0).rand(37, 3).astype(np.float32)
    w = engine1.warp(out1["feature_volume"][:1], verts)
    assert w["warp_field"].shape == (37, 3)
