"""Parity tests: separable dense decode == gather grid_sample + PointMLP,
and device active-cube extraction == full-volume marching cubes."""
import numpy as np
import jax
import jax.numpy as jnp

from garmentnets_tpu.models.mlp import PointMLP
from garmentnets_tpu.ops.grid_sample import grid_sample_trilinear
from garmentnets_tpu.ops.dense_decode import (
    dense_decode, eval_layers, interp_matrix)
from garmentnets_tpu.ops.isosurface import extract_active_cubes
from garmentnets_tpu.ops.marching_cubes import (
    marching_cubes, marching_cubes_active)


def test_interp_matrix_matches_grid_sample_1d():
    w = interp_matrix(9, 4)
    np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-6)
    src = np.random.RandomState(0).rand(4).astype(np.float32)
    out = w @ src
    # oracle: align_corners lattice query through the 3D sampler
    vol = jnp.asarray(src.reshape(1, 4, 1, 1, 1))
    q = np.zeros((1, 9, 3), np.float32)
    q[0, :, 0] = np.arange(9) / 8
    ref = np.asarray(grid_sample_trilinear(vol, jnp.asarray(q)))[0, :, 0]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_dense_decode_matches_gather_path():
    rng = np.random.RandomState(1)
    B, D, C, S = 2, 6, 8, 12
    fv = jnp.asarray(rng.rand(B, D, D, D, C), jnp.float32)

    mlp = PointMLP((C, 16, 1))
    q = jnp.asarray(rng.rand(B, 5, 3), jnp.float32)
    variables = mlp.init(jax.random.PRNGKey(0),
                         grid_sample_trilinear(fv, q), train=False)
    # randomize BN stats so the eval affine is non-trivial
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jnp.asarray(
            np.random.RandomState(2).rand(*a.shape), a.dtype),
        variables)

    # oracle: gather-sample the full lattice then apply the MLP in eval mode
    lat = np.stack(np.meshgrid(*([np.arange(S) / (S - 1)] * 3),
                               indexing="ij"), -1).reshape(-1, 3)
    latq = jnp.asarray(np.broadcast_to(lat[None], (B,) + lat.shape),
                       jnp.float32)
    feats = grid_sample_trilinear(fv, latq)
    ref = mlp.apply(variables, feats, train=False)
    ref = np.asarray(ref).reshape(B, S, S, S)

    layers = eval_layers(
        jax.tree_util.tree_map(np.asarray, variables["params"]),
        jax.tree_util.tree_map(np.asarray, variables["batch_stats"]))
    out = np.asarray(dense_decode(
        fv, layers, S, slab=4,
        precision=jax.lax.Precision.HIGHEST))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def _sphere(n=24, r=0.3):
    ax = np.linspace(0, 1, n)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return (0.5 + r - np.sqrt(
        (x - .5) ** 2 + (y - .5) ** 2 + (z - .5) ** 2)).astype(np.float32)


def test_active_cubes_match_full_mc():
    n = 24
    vol = _sphere(n)
    base, vals, counts = extract_active_cubes(
        jnp.asarray(vol[None]), 0.5, cap=8192)
    c = int(counts[0])
    assert 0 < c < 8192
    spacing = (1 / (n - 1),) * 3
    v_act, f_act = marching_cubes_active(
        np.asarray(base[0, :c]), np.asarray(vals[0, :c]).astype(np.float32),
        (n, n, n), 0.5, spacing)
    # oracle: full-volume MC on the same f16-quantized field (the active
    # path ships corner values as f16)
    vol16 = vol.astype(np.float16).astype(np.float32)
    v_full, f_full, _, _ = marching_cubes(vol16, 0.5, spacing=spacing)
    assert len(v_act) == len(v_full)
    assert len(f_act) == len(f_full)
    s1 = set(map(tuple, np.round(v_act, 4)))
    s2 = set(map(tuple, np.round(v_full, 4)))
    assert s1 == s2


def test_active_cubes_f16_precision():
    """f16 corner values keep vertex positions within ~1e-3 voxel units."""
    n = 24
    vol = _sphere(n)
    base, vals, counts = extract_active_cubes(
        jnp.asarray(vol[None]), 0.5, cap=8192)
    c = int(counts[0])
    spacing = (1 / (n - 1),) * 3
    v16, _ = marching_cubes_active(
        np.asarray(base[0, :c]), np.asarray(vals[0, :c]).astype(np.float32),
        (n, n, n), 0.5, spacing)
    d = np.linalg.norm(v16 - 0.5, axis=1)
    assert np.abs(d - 0.3).max() < 2.0 / (n - 1)


def test_active_cubes_int8_quantization_subvoxel():
    """int8-quantized corner values (the d2h transfer optimization) must
    move MC vertices by well under a voxel vs the f16 path."""
    from garmentnets_tpu.ops.isosurface import dequantize_vals
    n = 24
    vol = jnp.asarray(_sphere(n)[None])
    spacing = (1.0 / (n - 1),) * 3
    meshes = []
    for quant in (False, True):
        base, vals, counts = extract_active_cubes(vol, 0.5, 4096,
                                                  quantize=quant)
        k = int(np.asarray(counts)[0])
        v, f = marching_cubes_active(
            np.asarray(base)[0, :k],
            dequantize_vals(np.asarray(vals)[0, :k], 0.5),
            (n, n, n), 0.5, spacing)
        meshes.append((v, f))
    (v0, f0), (v1, f1) = meshes
    assert len(v0) == len(v1) and len(f0) == len(f1)
    # same welded topology -> same vertex ordering; compare directly
    d = np.abs(v0 - v1).max()
    assert d < 0.25 * spacing[0], d


def test_active_page_roundtrip():
    """pack_active_pages/unpack_active_pages must be an exact round trip for
    base indices (incl. the -1 pad sentinel) and int8 corner values."""
    from garmentnets_tpu.ops.isosurface import (
        pack_active_pages, unpack_active_pages, dequantize_vals)
    rng = np.random.RandomState(0)
    B, cap, page = 2, 1024, 256
    base = rng.randint(0, 128 ** 3, size=(B, cap)).astype(np.int32)
    base[0, 700:] = -1
    vals = rng.randint(-127, 128, size=(B, cap, 8)).astype(np.int8)
    pages = pack_active_pages(jnp.asarray(base), jnp.asarray(vals), page)
    assert len(pages) == cap // page
    assert pages[0].dtype == jnp.uint8 and pages[0].shape == (B, page, 12)
    got_base, got_vals = unpack_active_pages(pages, level=0.5)
    np.testing.assert_array_equal(got_base, base)
    np.testing.assert_allclose(got_vals, dequantize_vals(vals, 0.5))
    # prefix decode (what extract_meshes does when counts are small)
    got_base2, _ = unpack_active_pages(pages[:2], level=0.5)
    np.testing.assert_array_equal(got_base2, base[:, :2 * page])


def test_brick_page_count_header_roundtrip():
    """pack_brick_pages(counts=...) stamps a header row on page 0 whose
    first 4 bytes are the little-endian per-garment counts; read_page_counts
    recovers them exactly (incl. counts > cap, the overflow signal) and
    unpack(header=True) strips the row so record decode is unchanged."""
    from garmentnets_tpu.ops.isosurface import (
        pack_brick_pages, unpack_brick_pages, read_page_counts)
    rng = np.random.RandomState(1)
    B, cap, page = 3, 512, 128
    base = rng.randint(0, 64 ** 3, size=(B, cap)).astype(np.int32)
    vals = rng.randint(-127, 128, size=(B, cap, 64)).astype(np.int8)
    # counts may legally exceed cap (host falls back to full-volume MC)
    counts = np.array([37, cap + 999, 0], np.int32)
    pages = pack_brick_pages(jnp.asarray(base), jnp.asarray(vals), page,
                             counts=jnp.asarray(counts))
    assert pages[0].shape == (B, page + 1, 68)      # header row
    assert pages[1].shape == (B, page, 68)          # others unchanged
    np.testing.assert_array_equal(read_page_counts(pages[0]), counts)
    got_b, got_v = unpack_brick_pages(pages, header=True)
    np.testing.assert_array_equal(got_b, base)
    np.testing.assert_array_equal(got_v, vals)
    # prefix decode (header page only)
    got_b1, _ = unpack_brick_pages(pages[:1], header=True)
    np.testing.assert_array_equal(got_b1, base[:, :page])


def test_extract_meshes_reads_header_counts():
    """The engine must recover counts from the page-0 header (no separate
    active_counts sync): meshes from a header-stamped enc dict equal the
    legacy path's, and the header path works without an active_counts
    entry at all."""
    from garmentnets_tpu.ops.isosurface import (
        extract_active_bricks, pack_brick_pages)
    from garmentnets_tpu.harness.predict_engine import PredictEngine
    from garmentnets_tpu.models.pipeline import (
        ConvImplicitWNFPipeline, PipelineConfig)
    from garmentnets_tpu.models.pointnet2_nocs import PointNet2NOCSConfig
    cfg = PipelineConfig(pointnet2=PointNet2NOCSConfig())
    model = ConvImplicitWNFPipeline(cfg)
    eng = PredictEngine.__new__(PredictEngine)   # no weights needed
    eng.model, eng.cfg = model, cfg
    eng.volume_size, eng.iso_level = 16, 0.5
    eng.brick_cap, eng.brick_page = 64, 16
    eng.gradient_direction = "ascent"
    S = eng.volume_size
    x, y, z = np.mgrid[:S, :S, :S] / (S - 1.0)
    vol = 1.0 - 2.0 * np.sqrt((x - .5) ** 2 + (y - .5) ** 2 + (z - .5) ** 2)
    wnf = jnp.asarray(vol[None].astype(np.float32))
    base, vals, counts = extract_active_bricks(wnf, 0.5, eng.brick_cap)
    hdr_pages = pack_brick_pages(base, vals, eng.brick_page, counts=counts)
    legacy_pages = pack_brick_pages(base, vals, eng.brick_page)
    got_h = eng.extract_meshes({"active_pages": hdr_pages})
    got_l = eng.extract_meshes({"active_pages": legacy_pages,
                                "active_counts": counts})
    assert got_h[0] is not None and got_l[0] is not None
    for a, b in zip(got_h[0], got_l[0]):
        np.testing.assert_array_equal(a, b)


def test_extract_meshes_coalesced_prefix_matches():
    """prefetch() coalesces the speculative page prefix into ONE device
    buffer; extract_meshes must produce identical meshes through the
    prefix path (speculation hit), through a SHORT prefix (miss -> prefix
    + remaining pages), and with no prefix at all."""
    from garmentnets_tpu.ops.isosurface import (
        extract_active_bricks, pack_brick_pages)
    from garmentnets_tpu.harness.predict_engine import PredictEngine
    from garmentnets_tpu.models.pipeline import (
        ConvImplicitWNFPipeline, PipelineConfig)
    from garmentnets_tpu.models.pointnet2_nocs import PointNet2NOCSConfig
    cfg = PipelineConfig(pointnet2=PointNet2NOCSConfig())
    eng = PredictEngine.__new__(PredictEngine)
    eng.model, eng.cfg = ConvImplicitWNFPipeline(cfg), cfg
    eng.volume_size, eng.iso_level = 16, 0.5
    eng.brick_cap, eng.brick_page = 64, 16
    eng.gradient_direction = "ascent"
    S = eng.volume_size
    x, y, z = np.mgrid[:S, :S, :S] / (S - 1.0)
    vol = 1.0 - 2.0 * np.sqrt((x - .5) ** 2 + (y - .5) ** 2 + (z - .5) ** 2)
    wnf = jnp.asarray(vol[None].astype(np.float32))
    base, vals, counts = extract_active_bricks(wnf, 0.5, eng.brick_cap)
    n_pages = -(-int(np.asarray(counts)[0]) // eng.brick_page)
    assert n_pages >= 2, "test needs a multi-page load"
    pages = pack_brick_pages(base, vals, eng.brick_page, counts=counts)

    plain = eng.extract_meshes({"active_pages": pages})
    # coalescing is opt-in (paired A/B measured it losing on this host's
    # tunnel; see prefetch()); the test exercises the opt-in path
    eng.page_concat_enabled = True
    # speculation hit: prefix covers all needed pages
    eng._spec_pages = n_pages
    enc = {"active_pages": pages}
    eng.prefetch(enc)
    assert "_page_prefix" in enc and enc["_page_prefix"][0] == n_pages
    hit = eng.extract_meshes(enc)
    # speculation miss: prefix covers only 2 of the needed pages
    eng._spec_pages = 2
    enc2 = {"active_pages": pages}
    eng.prefetch(enc2)
    assert enc2["_page_prefix"][0] == 2 < n_pages
    miss = eng.extract_meshes(enc2)
    assert eng._spec_pages == n_pages      # speculation re-learned
    for got in (hit, miss):
        assert got[0] is not None
        for a, b in zip(got[0], plain[0]):
            np.testing.assert_array_equal(a, b)


def test_extract_meshes_threaded_matches_serial(monkeypatch):
    """GARMENTNETS_MC_THREADS>1 runs per-garment MC on a thread pool (the
    C++ kernel is per-call-state only and ctypes drops the GIL); outputs
    must be bitwise identical to the serial path for every garment."""
    from garmentnets_tpu.ops.isosurface import (
        extract_active_bricks, pack_brick_pages)
    from garmentnets_tpu.harness.predict_engine import PredictEngine
    from garmentnets_tpu.models.pipeline import (
        ConvImplicitWNFPipeline, PipelineConfig)
    from garmentnets_tpu.models.pointnet2_nocs import PointNet2NOCSConfig

    def mk_engine():
        eng = PredictEngine.__new__(PredictEngine)
        eng.model = ConvImplicitWNFPipeline(
            PipelineConfig(pointnet2=PointNet2NOCSConfig()))
        eng.volume_size, eng.iso_level = 16, 0.5
        eng.brick_cap, eng.brick_page = 64, 16
        eng.gradient_direction = "ascent"
        return eng

    S = 16
    x, y, z = np.mgrid[:S, :S, :S] / (S - 1.0)
    vols = np.stack([
        1.0 - 2.0 * np.sqrt((x - .5) ** 2 + (y - .5) ** 2 + (z - .5) ** 2),
        1.0 - 3.0 * np.maximum.reduce([abs(x - .5), abs(y - .4),
                                       abs(z - .6)]),
        np.zeros_like(x) - 1.0,                       # empty garment
    ]).astype(np.float32)
    base, vals, counts = extract_active_bricks(jnp.asarray(vols), 0.5, 64)
    enc = {"active_pages": pack_brick_pages(base, vals, 16, counts=counts)}

    monkeypatch.setenv("GARMENTNETS_MC_THREADS", "1")
    serial = mk_engine().extract_meshes(enc)
    monkeypatch.setenv("GARMENTNETS_MC_THREADS", "3")
    threaded = mk_engine().extract_meshes(enc)
    assert serial[2] is None and threaded[2] is None
    for s, t in zip(serial[:2], threaded[:2]):
        assert s is not None and t is not None
        for a, b in zip(s, t):
            np.testing.assert_array_equal(a, b)


def test_brick_extraction_matches_cube_extraction():
    """extract_active_bricks + host cube discovery must produce exactly the
    cube set (and corner values) of extract_active_cubes on the dequantized
    field, and the brick-mode mesh must match the active-list-mode mesh."""
    from garmentnets_tpu.ops.isosurface import (
        extract_active_cubes, extract_active_bricks, bricks_to_cube_list,
        dequantize_vals, pack_brick_pages, unpack_brick_pages)
    from garmentnets_tpu.ops.marching_cubes import marching_cubes_bricks
    rng = np.random.RandomState(3)
    S, B = 32, 2
    # smooth random field crossing the level + an exact-boundary plateau
    from scipy.ndimage import gaussian_filter
    vol = np.stack([
        gaussian_filter(rng.rand(S, S, S).astype(np.float32), 3) * 4.0,
        gaussian_filter(rng.rand(S, S, S).astype(np.float32), 2) * 4.0])
    level = float(np.median(vol))
    wnf = jnp.asarray(vol)

    cb, cv, cc = extract_active_cubes(wnf, level, 32768, quantize=True)
    bb, bv, bc = extract_active_bricks(wnf, level, 512)
    assert int(np.asarray(cc).max()) <= 32768
    assert int(np.asarray(bc).max()) <= 512
    # page round trip (68-byte brick records)
    pages = pack_brick_pages(bb, bv, 128)
    assert pages[0].shape == (B, 128, 68)
    got_b, got_v = unpack_brick_pages(pages)
    np.testing.assert_array_equal(got_b, np.asarray(bb))
    np.testing.assert_array_equal(got_v, np.asarray(bv))

    spacing = (1.0 / (S - 1),) * 3
    for b in range(B):
        n_cubes = int(np.asarray(cc)[b])
        assert n_cubes > 100
        ref_base = np.asarray(cb)[b, :n_cubes]
        ref_vals = dequantize_vals(np.asarray(cv)[b, :n_cubes], level)
        # side-preserving quantization makes the host's dequantized
        # inside-test identical to the device's float decision, so the two
        # paths must produce exactly the same cube set
        ref = {int(i): ref_vals[j] for j, i in enumerate(ref_base)}
        nb = int(np.asarray(bc)[b])
        got_base, got_vals = bricks_to_cube_list(
            np.asarray(bb)[b, :nb], np.asarray(bv)[b, :nb], level, S)
        assert len(got_base) == len(set(got_base.tolist()))  # no dup cubes
        got = {int(i): got_vals[j] for j, i in enumerate(got_base)}
        assert set(got.keys()) == set(ref.keys())
        for k in ref:
            np.testing.assert_allclose(got[k], ref[k], atol=1e-6)
        # the brick-mode mesh (C++ cube discovery, or the python fallback)
        # must equal the active-list mesh on the same dequantized values —
        # in BOTH gradient directions (cube discovery uses the direction-
        # independent v>level straddle; the per-cube triangulation applies
        # the ascent/descent in-test itself)
        for direction in ("ascent", "descent"):
            v_ref, f_ref = marching_cubes_active(
                ref_base, ref_vals, (S, S, S), level, spacing,
                gradient_direction=direction)
            v_brk, f_brk = marching_cubes_bricks(
                np.asarray(bb)[b, :nb], np.asarray(bv)[b, :nb], (S, S, S),
                level, spacing, gradient_direction=direction)
            assert len(v_brk) == len(v_ref), direction
            assert len(f_brk) == len(f_ref), direction
            s1 = set(map(tuple, np.round(v_brk, 4)))
            s2 = set(map(tuple, np.round(v_ref, 4)))
            assert s1 == s2, direction


def test_dense_decode_spatial_sharding_equality():
    """VERDICT r1 #2: the D-axis slab loop sharded over a 'space' mesh axis
    must be numerically identical to the single-device decode, for both a
    pure-spatial mesh and a composed ("data", "space") mesh."""
    from jax.sharding import Mesh
    from garmentnets_tpu.parallel.mesh import make_mesh_2d

    rng = np.random.RandomState(3)
    B, D, C, S = 2, 6, 8, 16
    fv = jnp.asarray(rng.rand(B, D, D, D, C), jnp.float32)
    mlp = PointMLP((C, 16, 1))
    q = jnp.asarray(rng.rand(B, 5, 3), jnp.float32)
    variables = mlp.init(jax.random.PRNGKey(0),
                         grid_sample_trilinear(fv, q), train=False)
    layers = eval_layers(
        jax.tree_util.tree_map(np.asarray, variables["params"]),
        jax.tree_util.tree_map(np.asarray, variables["batch_stats"]))

    kw = dict(slab=4, precision=jax.lax.Precision.HIGHEST)
    ref = np.asarray(dense_decode(fv, layers, S, **kw))

    space_only = Mesh(np.asarray(jax.devices()[:4]), ("space",))
    out_s = np.asarray(jax.jit(
        lambda v: dense_decode(v, layers, S, mesh=space_only, **kw))(fv))
    np.testing.assert_allclose(out_s, ref, rtol=1e-6, atol=1e-6)

    dp_sp = make_mesh_2d(2, 4)
    out_2d = np.asarray(jax.jit(
        lambda v: dense_decode(v, layers, S, mesh=dp_sp, **kw))(fv))
    np.testing.assert_allclose(out_2d, ref, rtol=1e-6, atol=1e-6)

    # a mesh without a space axis is a no-op passthrough
    data_only = Mesh(np.asarray(jax.devices()[:2]), ("data",))
    out_d = np.asarray(jax.jit(
        lambda v: dense_decode(v, layers, S, mesh=data_only, **kw))(fv))
    np.testing.assert_allclose(out_d, ref, rtol=1e-6, atol=1e-6)


def test_extract_meshes_auto_detects_straddle_masks():
    """Pages packed from extract_active_bricks(with_masks=True) carry
    76-byte records; extract_meshes must auto-detect the wider payload,
    route the masks to the C++ kernel's masked entry point, and produce
    meshes identical to the unmasked path."""
    from garmentnets_tpu.ops.isosurface import (
        extract_active_bricks, pack_brick_pages)
    from garmentnets_tpu.harness.predict_engine import PredictEngine
    from garmentnets_tpu.models.pipeline import (
        ConvImplicitWNFPipeline, PipelineConfig)
    from garmentnets_tpu.models.pointnet2_nocs import PointNet2NOCSConfig
    cfg = PipelineConfig(pointnet2=PointNet2NOCSConfig())
    eng = PredictEngine.__new__(PredictEngine)
    eng.model, eng.cfg = ConvImplicitWNFPipeline(cfg), cfg
    eng.volume_size, eng.iso_level = 16, 0.5
    eng.brick_cap, eng.brick_page = 64, 16
    eng.gradient_direction = "ascent"
    S = eng.volume_size
    x, y, z = np.mgrid[:S, :S, :S] / (S - 1.0)
    vol = 1.0 - 2.0 * np.sqrt((x - .5) ** 2 + (y - .5) ** 2 + (z - .6) ** 2)
    wnf = jnp.asarray(vol[None].astype(np.float32))
    outs = {}
    for wm in (False, True):
        b, v, c = extract_active_bricks(wnf, 0.5, eng.brick_cap,
                                        with_masks=wm)
        pages = pack_brick_pages(b, v, eng.brick_page, counts=c)
        assert pages[0].shape[-1] == (76 if wm else 68)
        outs[wm] = eng.extract_meshes({"active_pages": pages})
    assert outs[False][0] is not None and outs[True][0] is not None
    for a, bb in zip(outs[False][0], outs[True][0]):
        np.testing.assert_array_equal(a, bb)
