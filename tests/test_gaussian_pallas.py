"""Fused Pallas ggm vs the XLA path and scipy (interpret mode)."""
import numpy as np
import pytest
import jax.numpy as jnp

from garmentnets_tpu.ops.gaussian import gaussian_gradient_magnitude
from garmentnets_tpu.ops.gaussian_pallas import ggm_pallas


@pytest.mark.parametrize("S,sigma", [(16, 0.5), (24, 1.0), (8, 0.5)])
def test_ggm_pallas_matches_xla(S, sigma):
    rs = np.random.RandomState(0)
    vol = jnp.asarray(rs.rand(2, S, S, S).astype(np.float32))
    ref = np.asarray(gaussian_gradient_magnitude(vol, sigma, backend="xla"))
    out = np.asarray(ggm_pallas(vol, sigma, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_ggm_pallas_h_tiled_matches_xla():
    """A shape whose full-H slab exceeds the VMEM model budget, so
    _pick_ggm_tiles splits H (the 256^3 on-chip OOM regression, scaled
    to interpret-mode cost): halo exchange between H tiles must take
    true neighbor values, with edge replication only at volume borders."""
    from garmentnets_tpu.ops.gaussian_pallas import _pick_ggm_tiles
    rs = np.random.RandomState(3)
    vol = jnp.asarray(rs.rand(1, 8, 256, 256).astype(np.float32))
    td, th = _pick_ggm_tiles(8, 256, 256, 2)
    assert th < 256, (td, th)  # the tiled path must actually engage
    ref = np.asarray(gaussian_gradient_magnitude(vol, 0.5, backend="xla"))
    out = np.asarray(ggm_pallas(vol, 0.5, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_pick_ggm_tiles_model():
    """Tile picker invariants: divisors of the axes, full-H slab kept at
    128^3 (the measured-fast config), H tiled at 256^3 (where the full
    slab OOM'd on chip), and every pick fits the VMEM model budget."""
    from garmentnets_tpu.ops.gaussian_pallas import (
        _pick_ggm_tiles, _vmem_model)
    assert _pick_ggm_tiles(128, 128, 128, 2) == (8, 128)
    td, th = _pick_ggm_tiles(256, 256, 256, 2)
    assert th < 256
    for (d, h, w) in [(8, 8, 8), (128, 128, 128), (256, 256, 256),
                      (64, 512, 512), (16, 16, 16)]:
        td, th = _pick_ggm_tiles(d, h, w, 2)
        assert d % td == 0 and h % th == 0
        assert _vmem_model(td, th, w, 2) <= 8_000_000


def test_ggm_pallas_matches_scipy():
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    rs = np.random.RandomState(1)
    vol = rs.rand(1, 16, 16, 16).astype(np.float32)
    ref = scipy_ndimage.gaussian_gradient_magnitude(
        vol[0].astype(np.float64), 0.5, mode="nearest")
    out = np.asarray(ggm_pallas(jnp.asarray(vol), 0.5, interpret=True))[0]
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_ggm_backend_dispatch(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu
    rs = np.random.RandomState(2)
    vol = jnp.asarray(rs.rand(1, 8, 8, 8).astype(np.float32))
    ref = np.asarray(gaussian_gradient_magnitude(vol, 0.5, backend="xla"))
    monkeypatch.setenv("GARMENTNETS_GGM", "pallas")
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(gaussian_gradient_magnitude(vol, 0.5))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="unknown ggm backend"):
        gaussian_gradient_magnitude(vol, 0.5, backend="bogus")
