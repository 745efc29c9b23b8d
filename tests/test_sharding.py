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
    # production=False keeps this a quick smoke of the toy-width sharding;
    # the production-shape phase (which the driver's dryrun_multichip(8)
    # call runs by default) is covered by the named slow test in
    # tests/test_sharding_production.py
    graft.dryrun_multichip(8, production=False)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2, production=False)


def test_engine_pins_weights_on_device():
    """Checkpoint loading hands numpy weight trees; the engine must
    device_put them ONCE at construction — passing numpy into the jitted
    programs re-uploads every parameter per call (measured 778 vs 210
    ms/batch through the device tunnel, docs/PERF.md 'Serving')."""
    import numpy as np
    import jax
    from garmentnets_tpu.harness.predict_engine import PredictEngine
    from garmentnets_tpu.models.pipeline import ConvImplicitWNFPipeline

    cfg = graft._small_cfg()
    model = ConvImplicitWNFPipeline(cfg)
    batch = graft._make_batch(B=2)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    host_vars = jax.tree_util.tree_map(np.asarray, variables)  # numpy tree
    engine = PredictEngine(cfg, host_vars, volume_size=16, warp_bucket=64)
    leaves = jax.tree_util.tree_leaves(engine.variables)
    assert leaves and all(isinstance(x, jax.Array) for x in leaves)


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


def test_predict_engine_overflow_fallback():
    """Brick-capacity overflow must fall back to full-volume marching cubes
    with a host-vertex warp query, and produce (approximately) the same
    meshes/warps as the brick fast path on the same inputs."""
    from garmentnets_tpu.harness.predict_engine import PredictEngine
    from garmentnets_tpu.models.pipeline import ConvImplicitWNFPipeline

    cfg = graft._small_cfg()
    model = ConvImplicitWNFPipeline(cfg)
    batch = graft._make_batch(B=2)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    normal = PredictEngine(cfg, variables, volume_size=16, warp_bucket=64)
    # active_cap=64 -> brick_cap 64 bricks; a 16^3 grid has 64 bricks, so a
    # surface touching more than 64 shipped bricks... force overflow harder:
    # cap 8 bricks, far below any real isosurface's shipped count
    tiny = PredictEngine(cfg, variables, volume_size=16, warp_bucket=64,
                         active_cap=64)
    tiny.brick_cap = 8
    tiny.brick_page = 8

    enc_n = normal.encode(batch["x"], batch["pos"])
    normal.prefetch(enc_n)
    meshes_n = normal.extract_meshes(enc_n)
    warps_n = normal.warp_batch(enc_n, meshes_n)

    enc_t = tiny.encode(batch["x"], batch["pos"])
    tiny.prefetch(enc_t)
    counts = np.asarray(enc_t["active_counts"])
    assert counts.max() > tiny.brick_cap, "test requires an overflow"
    meshes_t = tiny.extract_meshes(enc_t)
    warps_t = tiny.warp_batch(enc_t, meshes_t)

    for mn, mt, wn, wt in zip(meshes_n, meshes_t, warps_n, warps_t):
        assert (mn is None) == (mt is None)
        if mn is None:
            continue
        # fallback MC runs on the f32 volume; the fast path on int8
        # dequantized bricks — same surface within quantization tolerance
        assert abs(len(mn[0]) - len(mt[0])) <= 0.05 * len(mn[0]) + 8
        assert wt["warp_field"].shape == (len(mt[0]), 3)
        assert wt["verts_ggm"].shape == (len(mt[0]),)
        assert np.isfinite(wt["warp_field"]).all()
        # surfaces coincide: mean NN distance far below a voxel
        from scipy.spatial import cKDTree
        d = cKDTree(mn[0]).query(mt[0], k=1)[0]
        assert d.mean() < 0.25 / 15, d.mean()


def test_predict_engine_spatial_mesh():
    """PredictEngine on a ("data", "space") mesh: the dense decode slab loop
    shards over 'space' while the batch shards over 'data'; results must
    match the single-device engine (VERDICT r1 #2)."""
    from garmentnets_tpu.harness.predict_engine import PredictEngine
    from garmentnets_tpu.models.pipeline import ConvImplicitWNFPipeline
    from garmentnets_tpu.parallel.mesh import make_mesh_2d

    cfg = graft._small_cfg()
    model = ConvImplicitWNFPipeline(cfg)
    batch = graft._make_batch(B=2)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    mesh = make_mesh_2d(2, 4)
    eng_sp = PredictEngine(cfg, variables, volume_size=16,
                           mesh=mesh, warp_bucket=64, return_volume=True)
    eng_1 = PredictEngine(cfg, variables, volume_size=16,
                          warp_bucket=64, return_volume=True)
    out_sp = eng_sp.encode(batch["x"], batch["pos"])
    out_1 = eng_1.encode(batch["x"], batch["pos"])
    np.testing.assert_allclose(
        np.asarray(out_sp["wnf_volume"]), np.asarray(out_1["wnf_volume"]),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_sp["wnf_ggm"]), np.asarray(out_1["wnf_ggm"]),
        rtol=1e-4, atol=1e-5)
    # brick extraction agrees (same shipped set from identical fields)
    np.testing.assert_array_equal(np.asarray(out_sp["active_counts"]),
                                  np.asarray(out_1["active_counts"]))
    m_sp = eng_sp.extract_meshes(out_sp)
    m_1 = eng_1.extract_meshes(out_1)
    for a, b in zip(m_sp, m_1):
        assert (a is None) == (b is None)
        if a is not None:
            np.testing.assert_allclose(a[0], b[0], atol=1e-5)
            np.testing.assert_array_equal(a[1], b[1])
