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
    ref = np.asarray(gaussian_gradient_magnitude(vol, sigma))
    out = np.asarray(ggm_pallas(vol, sigma, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


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
