"""Opt-in on-chip kernel suite (VERDICT r1 #7): GARMENTNETS_HW_TESTS=1.

Everything else in tests/ runs on the virtual 8-device CPU platform, so a
Pallas/XLA regression on the real chip would only surface as a bench perf
drop (the FPS autodetect probe silently falls back to XLA). This suite runs
on the REAL accelerator (conftest leaves the platform untouched in HW mode)
and pins down:
  - the Pallas FPS kernel actually compiles + is index-identical to XLA FPS,
  - device brick extraction matches a numpy oracle bit-for-bit,
  - one engine encode -> marching-cubes -> warp round trip is sane.

Run:  GARMENTNETS_HW_TESTS=1 python -m pytest tests/test_hw_chip.py -v
(~2 min cold through the device tunnel; seconds warm via the XLA cache.)

NOTE (axon): jax.block_until_ready does not block on this platform — every
assertion goes through a real np.asarray host fetch.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("GARMENTNETS_HW_TESTS") != "1",
    reason="on-chip suite; set GARMENTNETS_HW_TESTS=1")


def test_platform_is_accelerator():
    import jax
    assert jax.default_backend() != "cpu", (
        "HW suite must run on a real accelerator; got CPU backend")


def test_pallas_fps_probe_active():
    """The production autodetect must pick the Pallas kernel on the chip —
    a silent fallback to XLA FPS is exactly the regression this suite
    exists to catch (ops/pointcloud.py probe)."""
    from garmentnets_tpu.ops import pointcloud
    if os.environ.get("GARMENTNETS_FPS"):
        pytest.skip("GARMENTNETS_FPS override set; probe not exercised")
    assert pointcloud._pallas_fps_available(), (
        "Pallas FPS probe failed on the real chip (see the logged warning "
        "for the reason); production predict would silently run XLA FPS")


def test_pallas_fps_matches_xla_indices():
    import jax.numpy as jnp
    from garmentnets_tpu.kernels.fps_pallas import (
        furthest_point_sampling_pallas)
    from garmentnets_tpu.ops.pointcloud import _furthest_point_sampling_xla
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.rand(2, 2048, 3).astype(np.float32))
    idx_p = np.asarray(furthest_point_sampling_pallas(pos, 512))
    idx_x = np.asarray(_furthest_point_sampling_xla(pos, 512))
    np.testing.assert_array_equal(idx_p, idx_x)
    # sanity: no duplicate samples within a batch item
    for b in range(2):
        assert len(np.unique(idx_p[b])) == 512


def _smooth_field(S=32, seed=3):
    rng = np.random.RandomState(seed)
    g = np.linspace(0, 1, S, dtype=np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    c = rng.rand(3) * 0.4 + 0.3
    return np.exp(-((X - c[0]) ** 2 * 7 + (Y - c[1]) ** 2 * 4
                    + (Z - c[2]) ** 2 * 9)).astype(np.float32)


def _quantize_oracle(v, level):
    """Numpy mirror of ops/isosurface._quantize_vals (side-preserving)."""
    from garmentnets_tpu.ops.isosurface import VAL_QUANT_SCALE
    q = np.round((v - level) * VAL_QUANT_SCALE)
    q = np.where(v > level, np.maximum(q, 1.0), np.minimum(q, 0.0))
    return np.clip(q, -127, 127).astype(np.int8)


def test_brick_extraction_matches_numpy_oracle():
    """Device extract_active_bricks vs a host oracle: shipped brick values
    are the exact int8 quantization of the field, and every straddling cube
    has all 8 corners covered by shipped bricks."""
    import jax.numpy as jnp
    from garmentnets_tpu.ops.isosurface import (
        extract_active_bricks, pack_brick_pages, unpack_brick_pages, BLOCK)
    S, level = 32, 0.5
    wnf = _smooth_field(S)
    base, vals, counts = extract_active_bricks(
        jnp.asarray(wnf[None]), level, 1024)
    bi, bv = unpack_brick_pages(pack_brick_pages(base, vals, 1024))
    n = int(np.asarray(counts)[0])
    assert 0 < n <= 1024
    bi, bv = np.asarray(bi[0, :n]), np.asarray(bv[0, :n])
    assert len(np.unique(bi)) == n, "duplicate shipped bricks"
    assert (np.asarray(bi) >= 0).all()

    nb = S // BLOCK
    q_full = _quantize_oracle(wnf, level)
    shipped = set()
    for row in range(n):
        b = int(bi[row])
        bz, by, bx = b % nb, (b // nb) % nb, b // (nb * nb)
        block = q_full[bx * 4:bx * 4 + 4, by * 4:by * 4 + 4,
                       bz * 4:bz * 4 + 4]
        np.testing.assert_array_equal(
            bv[row].reshape(4, 4, 4), block,
            err_msg=f"brick {b} values differ from quantized field")
        shipped.add((bx, by, bz))

    # coverage: every straddling cube's 8 corners live in shipped bricks
    inside = q_full >= 1
    c = inside
    straddle = np.zeros((S - 1, S - 1, S - 1), bool)
    agg_any = np.zeros_like(straddle)
    agg_all = np.ones_like(straddle)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                sub = c[dx:S - 1 + dx, dy:S - 1 + dy, dz:S - 1 + dz]
                agg_any |= sub
                agg_all &= sub
    straddle = agg_any & ~agg_all
    xs, ys, zs = np.nonzero(straddle)
    for x, y, z in zip(xs, ys, zs):
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    blk = ((x + dx) // 4, (y + dy) // 4, (z + dz) // 4)
                    assert blk in shipped, (
                        f"straddling cube ({x},{y},{z}) corner brick {blk} "
                        "not shipped")


def test_engine_roundtrip_small():
    """One encode -> brick MC -> warp round trip on the chip at 16^3 with a
    freshly initialized tiny pipeline: finite outputs, per-vertex values at
    or above the iso level, warp shapes consistent."""
    import jax
    import __graft_entry__ as graft
    from garmentnets_tpu.models.pipeline import ConvImplicitWNFPipeline
    from garmentnets_tpu.harness.predict_engine import PredictEngine

    cfg = graft._small_cfg()
    model = ConvImplicitWNFPipeline(cfg)
    batch = graft._make_batch(B=2)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    engine = PredictEngine(cfg, variables, volume_size=16, warp_bucket=64)
    enc = engine.encode(batch["x"], batch["pos"])
    engine.prefetch(enc)
    meshes = engine.extract_meshes(enc)
    warps = engine.warp_batch(enc, meshes)
    got_any = False
    for m, w in zip(meshes, warps):
        assert (m is None) == (w is None)
        if m is None:
            continue
        got_any = True
        verts, faces, values, normals = m
        assert np.isfinite(verts).all()
        assert faces.max() < len(verts)
        assert (values >= engine.iso_level - 5e-3).all()
        assert normals.shape == (len(verts), 3)
        # unit gradient normals (zero only if the local gradient vanishes)
        nn = np.linalg.norm(normals, axis=1)
        assert ((np.abs(nn - 1) < 1e-3) | (nn == 0)).all()
        assert w["warp_field"].shape == (len(verts), 3)
        assert np.isfinite(np.asarray(w["warp_field"], np.float32)).all()
        assert w["verts_ggm"].shape == (len(verts),)
    # an untrained net may genuinely produce no crossing; only require
    # the pipeline to have run, not a surface to exist
    assert len(meshes) == 2 or got_any is not None


def test_fused_dense_decode_on_chip():
    """The fused Pallas decode (ops/dense_decode_pallas) must compile on
    the real chip and agree with the XLA slab path at HIGHEST precision;
    autodetect failures log their reason via fused_decode_available."""
    import jax
    import jax.numpy as jnp
    from garmentnets_tpu.ops.dense_decode import dense_decode
    from garmentnets_tpu.ops.dense_decode_pallas import (
        dense_decode_fused, fused_decode_available)
    ok, why = fused_decode_available()
    assert ok, f"fused decode probe failed on the real chip: {why}"
    rs = np.random.RandomState(0)
    widths = (32, 64, 64, 1)
    layers = []
    for cin, cout in zip(widths[:-1], widths[1:]):
        layers.append((
            (rs.rand(cin, cout).astype(np.float32) - 0.5) / np.sqrt(cin),
            rs.rand(cout).astype(np.float32) - 0.5,
            0.5 + rs.rand(cout).astype(np.float32),
            rs.rand(cout).astype(np.float32) - 0.5))
    fv = jnp.asarray(rs.rand(2, 16, 16, 16, 32).astype(np.float32))
    hi = jax.lax.Precision.HIGHEST
    ref = np.asarray(jax.jit(lambda v: dense_decode(
        v, layers, 64, slab=4, precision=hi))(fv))
    out = np.asarray(jax.jit(lambda v: dense_decode_fused(
        v, layers, 64, precision=hi))(fv))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_fused_ggm_on_chip():
    """The fused Pallas ggm must compile on the real chip and agree with
    the XLA separable path (backend pinned: the default is 'auto', which
    would make this pallas-vs-pallas)."""
    import jax.numpy as jnp
    from garmentnets_tpu.ops.gaussian import gaussian_gradient_magnitude
    from garmentnets_tpu.ops.gaussian_pallas import ggm_pallas
    rs = np.random.RandomState(0)
    vol = jnp.asarray(rs.rand(2, 32, 32, 32).astype(np.float32))
    ref = np.asarray(gaussian_gradient_magnitude(vol, 0.5, backend="xla"))
    out = np.asarray(ggm_pallas(vol, 0.5))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_fused_sa_on_chip():
    """The fused SA kernel (kernels/sa_pallas, OPT-IN via GARMENTNETS_SA=
    pallas — measured slower than the XLA SA path, see its docstring) must
    still compile on the real chip and agree with the XLA formulation; a
    Mosaic regression here should fail loudly, not surface as a silent
    env-flag no-op."""
    import jax
    import jax.numpy as jnp
    from garmentnets_tpu.kernels.sa_pallas import sa_fused
    rs = np.random.RandomState(0)
    B, N, M, K, Cin = 2, 512, 96, 16, 3
    x = jnp.asarray(rs.rand(B, N, Cin).astype(np.float32) - 0.5)
    pos = jnp.asarray(rs.rand(B, N, 3).astype(np.float32))
    centers = jnp.asarray(np.asarray(pos[:, :M]))
    idx = jnp.asarray(rs.randint(0, N, (B, M, K)).astype(np.int32))
    mask = jnp.asarray(rs.rand(B, M, K) > 0.3).at[..., 0].set(True)
    dims = [Cin + 3, 8, 16]
    layers = []
    for cin, cout in zip(dims[:-1], dims[1:]):
        layers.append((
            jnp.asarray((rs.rand(cin, cout).astype(np.float32) - 0.5)
                        / np.sqrt(cin)),
            jnp.asarray(np.stack([
                rs.rand(cout).astype(np.float32) - 0.5,
                rs.rand(cout).astype(np.float32) + 0.5,
                rs.rand(cout).astype(np.float32) - 0.5]))))

    def xla_ref(x, pos, centers, idx, mask):
        src = jnp.concatenate([x, pos], -1)
        nbr = jnp.take_along_axis(src[:, None], idx[..., None], axis=2)
        rel = nbr[..., Cin:] - centers[:, :, None]
        a = jnp.concatenate([nbr[..., :Cin], rel], -1)
        for w, bgs in layers:
            a = jnp.maximum(a @ w + bgs[0], 0) * bgs[1] + bgs[2]
        return jnp.where(mask[..., None], a, -jnp.inf).max(axis=2)

    hi = jax.lax.Precision.HIGHEST
    out = np.asarray(jax.jit(lambda *a: sa_fused(
        *a, layers, precision=hi))(x, pos, centers, idx, mask))
    # pin the reference's matmuls to f32 too — at DEFAULT they run as
    # bf16 MXU passes (~1e-3 rel), which would swamp the kernel check
    with jax.default_matmul_precision("float32"):
        ref = np.asarray(jax.jit(xla_ref)(x, pos, centers, idx, mask))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_fused_ggm_256_on_chip():
    """256^3 stretch shape: the full-H slab's Mosaic stack measured
    44.4 MB against the 16 MB scoped-vmem limit (round-3 on-chip OOM in
    the BENCH_VOLUME=256 config), so _pick_ggm_tiles must tile H. This
    is the compile-and-parity regression for exactly that shape; spot
    parity is checked on a slab (full 256^3 d2h through the tunnel
    would dominate the suite's runtime)."""
    import jax
    import jax.numpy as jnp
    from garmentnets_tpu.ops.gaussian import gaussian_gradient_magnitude
    from garmentnets_tpu.ops.gaussian_pallas import ggm_pallas
    rs = np.random.RandomState(1)
    vol = jnp.asarray(rs.rand(1, 256, 256, 256).astype(np.float32))
    out = jax.jit(lambda v: ggm_pallas(v, 0.5))(vol)[0, 100:104]
    ref = jax.jit(lambda v: gaussian_gradient_magnitude(
        v, 0.5, backend="xla"))(vol)[0, 100:104]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)
