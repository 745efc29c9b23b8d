"""Fused Pallas dense decode vs the XLA slab path (interpret mode).

The fused kernel (ops/dense_decode_pallas) must reproduce the XLA
dense_decode bit-for-bit up to f32 matmul reassociation at every tile
geometry it will see: the production 32^3 -> 128^3 shape class, the
tiny test grids, non-equal D/H/W handling through the swapaxes call
site, and multi-channel output heads.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from garmentnets_tpu.ops.dense_decode import dense_decode
from garmentnets_tpu.ops.dense_decode_pallas import (
    _pick_tiles, dense_decode_fused)


def _rand_layers(rs, widths):
    layers = []
    for cin, cout in zip(widths[:-1], widths[1:]):
        k = (rs.rand(cin, cout).astype(np.float32) - 0.5) / np.sqrt(cin)
        b = (rs.rand(cout).astype(np.float32) - 0.5)
        g = 0.5 + rs.rand(cout).astype(np.float32)
        s = (rs.rand(cout).astype(np.float32) - 0.5)
        layers.append((k, b, g, s))
    return layers


@pytest.mark.parametrize("D,S,widths", [
    (4, 8, (6, 16, 16, 1)),       # minimal grid
    (8, 16, (8, 24, 24, 1)),      # production shape class, scaled
    (8, 32, (8, 16, 1)),          # two-layer MLP, S/D = 4 like 128/32
    (8, 16, (8, 16, 16, 3)),      # multi-channel head (warp-like)
])
def test_fused_matches_xla(D, S, widths):
    rs = np.random.RandomState(0)
    layers = _rand_layers(rs, widths)
    fv = jnp.asarray(rs.rand(2, D, D, D, widths[0]).astype(np.float32))
    ref = np.asarray(dense_decode(fv, layers, S, slab=2))
    out = np.asarray(dense_decode_fused(fv, layers, S, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_backend_dispatch_env(monkeypatch):
    rs = np.random.RandomState(1)
    layers = _rand_layers(rs, (6, 12, 1))
    fv = jnp.asarray(rs.rand(1, 4, 4, 4, 6).astype(np.float32))
    ref = np.asarray(dense_decode(fv, layers, 8, backend="xla"))
    # CPU runs the fused kernel through the Pallas interpreter only when
    # asked; the dispatch seam itself is what we pin here
    from jax.experimental.pallas import tpu as pltpu
    monkeypatch.setenv("GARMENTNETS_DENSE_DECODE", "pallas")
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(dense_decode(fv, layers, 8))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_tile_plan_divides():
    for S in (8, 16, 32, 64, 128, 256):
        TD, TH = _pick_tiles(S)
        assert S % TD == 0 and S % TH == 0
        assert TD * TH * S <= 8192  # two f32 [M, 256] buffers < 16 MB


def test_fused_sharded_matches_single_device():
    """Pallas backend under a ("data", "space") mesh: each device decodes
    its strip of d-tiles; result equals the single-device fused decode.
    Uses pallas_call(interpret=True) — the pure-JAX interpreter — NOT the
    Mosaic TPU interpret context, whose host callbacks were observed to
    deadlock under multi-device shard_map execution."""
    from garmentnets_tpu.parallel.mesh import make_mesh_2d
    rs = np.random.RandomState(2)
    layers = _rand_layers(rs, (8, 16, 16, 1))
    fv = jnp.asarray(rs.rand(4, 8, 8, 8, 8).astype(np.float32))
    S = 16
    ref = np.asarray(dense_decode_fused(fv, layers, S, interpret=True))
    mesh2d = make_mesh_2d(2, 4)
    out = np.asarray(jax.jit(lambda v: dense_decode_fused(
        v, layers, S, mesh=mesh2d, interpret=True))(fv))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_fused_data_only_mesh():
    """A batch-DP-only ("data",) mesh must still route through shard_map
    (GSPMD can't partition an opaque pallas_call)."""
    from jax.sharding import Mesh
    rs = np.random.RandomState(3)
    layers = _rand_layers(rs, (8, 16, 1))
    fv = jnp.asarray(rs.rand(8, 4, 4, 4, 8).astype(np.float32))
    S = 8
    ref = np.asarray(dense_decode_fused(fv, layers, S, interpret=True))
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    out = np.asarray(jax.jit(lambda v: dense_decode_fused(
        v, layers, S, mesh=mesh, interpret=True))(fv))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_fused_non_cubic_coarse_grid():
    """D/H/W extents may differ in the coarse volume; only the output
    lattice is cubic (dense_decode semantics)."""
    rs = np.random.RandomState(4)
    layers = _rand_layers(rs, (6, 12, 1))
    fv = jnp.asarray(rs.rand(2, 4, 6, 8, 6).astype(np.float32))
    S = 16
    ref = np.asarray(dense_decode(fv, layers, S, slab=2))
    out = np.asarray(dense_decode_fused(fv, layers, S, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_invalid_knobs_raise(monkeypatch):
    rs = np.random.RandomState(5)
    layers = _rand_layers(rs, (6, 12, 1))
    fv = jnp.asarray(rs.rand(1, 4, 4, 4, 6).astype(np.float32))
    with pytest.raises(ValueError, match="unknown dense-decode backend"):
        dense_decode(fv, layers, 8, backend="fused")
    monkeypatch.setenv("GARMENTNETS_DECODE_TILE", "3x8")  # 3 ∤ 8
    with pytest.raises(ValueError, match="DECODE_TILE"):
        _pick_tiles(8)
    monkeypatch.setenv("GARMENTNETS_DECODE_TILE", "0x8")
    with pytest.raises(ValueError, match="DECODE_TILE"):
        _pick_tiles(8)
