"""Fused SA-neighborhood kernel (kernels/sa_pallas.py) parity tests.

All kernel runs use pallas_call(interpret=True) — the pure-JAX
interpreter — so these tests run on the CPU mesh; the real-chip compile
and timing live in tests/test_hw_chip.py::test_fused_sa_on_chip.

Reference semantics (components/pointnet2.py:11-33 in the upstream repo):
PointNetConv = eval-mode MLP over concat(x_j, p_j - p_i), masked max over
the <=K ball neighbors.
"""
import functools
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from garmentnets_tpu.kernels.sa_pallas import (
    sa_fused, sa_layers_from_params, _pick_tm)


def _xla_ref(x, pos, centers, idx, mask, layers):
    """Dense XLA formulation of the same math (gather -> folded eval MLP
    -> masked max), mirroring models/pointnet2.SAModule's eval path."""
    src = jnp.concatenate([x, pos], -1)
    nbr = jnp.take_along_axis(src[:, None], idx[..., None], axis=2)
    Cin = x.shape[-1]
    rel = nbr[..., Cin:] - centers[:, :, None]
    a = jnp.concatenate([nbr[..., :Cin], rel], -1)
    for w, bgs in layers:
        z = a @ w + bgs[0]
        a = jnp.maximum(z, 0) * bgs[1] + bgs[2]
    a = jnp.where(mask[..., None], a, -jnp.inf)
    return a.max(axis=2)


def _rand_case(seed, B, N, M, K, Cin, chans, full_mask=False):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.rand(B, N, Cin).astype(np.float32) - 0.5)
    pos = jnp.asarray(rs.rand(B, N, 3).astype(np.float32))
    centers = jnp.asarray(np.asarray(pos[:, :M]))
    idx = jnp.asarray(rs.randint(0, N, (B, M, K)).astype(np.int32))
    if full_mask:
        mask = jnp.ones((B, M, K), bool)
    else:
        # every row keeps >=1 valid slot (the sa_fused contract: centers
        # drawn from the points always have themselves as a neighbor)
        mask = jnp.asarray(rs.rand(B, M, K) > 0.4).at[..., 0].set(True)
    dims = [Cin + 3] + list(chans)
    layers = []
    for i in range(len(chans)):
        w = jnp.asarray(
            (rs.rand(dims[i], dims[i + 1]).astype(np.float32) - 0.5)
            / np.sqrt(dims[i]))
        bgs = jnp.asarray(np.stack(
            [rs.rand(dims[i + 1]).astype(np.float32) - 0.5,
             rs.rand(dims[i + 1]).astype(np.float32) + 0.5,
             rs.rand(dims[i + 1]).astype(np.float32) - 0.5]))
        layers.append((w, bgs))
    return x, pos, centers, idx, mask, layers


@pytest.mark.parametrize("B,N,M,K,Cin,chans", [
    (2, 256, 64, 8, 3, (8, 16)),        # TM == M (single m-tile)
    (1, 300, 96, 16, 5, (8,)),          # odd Cin, single layer
    (2, 200, 10, 8, 3, (8, 8)),         # M padded to the sublane tile
    (1, 512, 32, 32, 3, (8, 16, 8)),    # deeper chain, larger K
])
def test_sa_fused_matches_xla(B, N, M, K, Cin, chans):
    x, pos, centers, idx, mask, layers = _rand_case(0, B, N, M, K, Cin,
                                                    chans)
    ref = np.asarray(_xla_ref(x, pos, centers, idx, mask, layers))
    out = np.asarray(sa_fused(x, pos, centers, idx, mask, layers,
                              precision=jax.lax.Precision.HIGHEST,
                              interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_sa_fused_mask_substitution_equals_masked_max():
    """Heavily masked rows: the kernel's invalid-slot index substitution
    must reproduce the masked max exactly (duplicated valid slots cannot
    change a max)."""
    x, pos, centers, idx, mask, layers = _rand_case(
        3, 2, 128, 16, 8, 3, (8, 16))
    # leave exactly one valid slot on some rows
    mask = np.array(mask)
    mask[0, :4, 1:] = False
    mask = jnp.asarray(mask)
    ref = np.asarray(_xla_ref(x, pos, centers, idx, mask, layers))
    out = np.asarray(sa_fused(x, pos, centers, idx, mask, layers,
                              precision=jax.lax.Precision.HIGHEST,
                              interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_pick_tm_invariants():
    for M, c_max in [(3000, 128), (750, 256), (64, 16), (10, 8), (96, 512)]:
        tm = _pick_tm(M, c_max)
        assert tm % 8 == 0 and tm >= 8
        assert tm * c_max * 4 <= (4 << 20) or tm == 8


def test_sa_layers_from_params_bn_folding():
    """Folding must match PointMLP's eval-mode forward exactly (same
    contract as ops/dense_decode.eval_layers)."""
    from garmentnets_tpu.models.mlp import PointMLP
    rs = np.random.RandomState(1)
    h = jnp.asarray(rs.rand(2, 6, 4, 9).astype(np.float32))
    mlp = PointMLP((8, 16), batch_norm=True)
    variables = mlp.init(jax.random.PRNGKey(0), h, train=False)
    # make the folded stats non-trivial
    bs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rs.rand(*a.shape).astype(np.float32) + 0.5),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    ref = mlp.apply(variables, h, train=False)
    layers = sa_layers_from_params(variables["params"],
                                   variables["batch_stats"])
    a = h
    for w, bgs in layers:
        z = a @ w + bgs[0]
        a = jnp.maximum(z, 0) * bgs[1] + bgs[2]
    np.testing.assert_allclose(np.asarray(a), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_samodule_pallas_path_matches_xla_path(monkeypatch):
    """End-to-end through SAModule.__call__: force the pallas branch (with
    the interpreted kernel) and compare against the XLA branch at eval
    time — exercises sa_layers_from_params on real flax variables and the
    in-module wiring."""
    from garmentnets_tpu.models import pointnet2 as p2
    from garmentnets_tpu.kernels import sa_pallas

    rs = np.random.RandomState(2)
    B, N, Cin = 2, 128, 3
    x = jnp.asarray(rs.rand(B, N, Cin).astype(np.float32) - 0.5)
    pos = jnp.asarray(rs.rand(B, N, 3).astype(np.float32))
    mod = p2.SAModule(ratio=0.5, radius=0.2, mlp_channels=(8, 16),
                      max_neighbors=8)
    variables = mod.init(jax.random.PRNGKey(0), x, pos, train=False)
    bs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rs.rand(*a.shape).astype(np.float32) + 0.5),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}

    monkeypatch.setenv("GARMENTNETS_SA", "xla")
    ref, cref = mod.apply(variables, x, pos, train=False)
    monkeypatch.setenv("GARMENTNETS_SA", "pallas")
    monkeypatch.setattr(
        sa_pallas, "sa_fused",
        functools.partial(sa_fused,
                          precision=jax.lax.Precision.HIGHEST,
                          interpret=True))
    out, cout = mod.apply(variables, x, pos, train=False)
    np.testing.assert_array_equal(np.asarray(cout), np.asarray(cref))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_backend_override_pins_xla():
    from garmentnets_tpu.kernels.sa_pallas import backend_override, sa_backend
    os.environ["GARMENTNETS_SA"] = "pallas"
    try:
        with backend_override("xla"):
            assert sa_backend() == "xla"
        assert sa_backend() == "pallas"
    finally:
        del os.environ["GARMENTNETS_SA"]
