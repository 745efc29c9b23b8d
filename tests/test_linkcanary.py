"""Shared link canary (harness/linkcanary): verdict tiers, line format,
and printer routing — the single source of truth every benchmark prints
before its numbers."""
import numpy as np

from garmentnets_tpu.harness import linkcanary


def test_canary_runs_and_reports(capfd):
    cold, warm, verdict = linkcanary.run_link_canary()
    assert cold >= 0 and warm >= 0
    # the forced-CPU test backend is always healthy
    assert verdict == "healthy"
    err = capfd.readouterr().err
    assert "link canary:" in err and "healthy" in err
    # the printed criterion matches the module threshold
    assert f"< {linkcanary.HEALTHY_BELOW_S:g}s" in err


def test_canary_printer_override(capfd):
    lines = []
    linkcanary.run_link_canary(printer=lines.append)
    assert len(lines) == 1 and "link canary:" in lines[0]
    assert capfd.readouterr().err == ""      # nothing printed directly


def test_canary_line_verdict_tiers():
    assert "healthy" in linkcanary.canary_line(1.0, 0.03, "healthy")
    # tier boundaries are the module constants
    for warm, expect in ((linkcanary.HEALTHY_BELOW_S - 1e-3, "healthy"),
                         (linkcanary.HEALTHY_BELOW_S + 1e-3, "DEGRADED"),
                         (linkcanary.DEGRADED_BELOW_S + 1e-3,
                          "SEVERELY DEGRADED")):
        v = ("healthy" if warm < linkcanary.HEALTHY_BELOW_S else
             "DEGRADED" if warm < linkcanary.DEGRADED_BELOW_S
             else "SEVERELY DEGRADED")
        assert v == expect
        assert expect in linkcanary.canary_line(0.0, warm, v)


def test_oct_codec_fold_boundary():
    """Octahedral codec edge cases: vectors on the lower-hemisphere fold
    (z<0, |x|+|y| near 1) and near-axis vectors round-trip within the
    documented ~1 degree bound."""
    import jax.numpy as jnp
    from garmentnets_tpu.ops.normals import oct_encode_f16, oct_decode_np

    rng = np.random.RandomState(3)
    # fold-adjacent: small negative z, xy on the unit diamond
    theta = rng.rand(500) * 2 * np.pi
    xy = np.stack([np.cos(theta), np.sin(theta)], -1)
    xy /= np.abs(xy).sum(-1, keepdims=True)
    z = -np.abs(rng.rand(500)) * 0.05 - 1e-4
    n = np.concatenate([xy, z[:, None]], -1).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    # plus exact diagonal/fold corners and near-axis vectors
    extra = np.asarray([[1, 0, -1e-6], [0, -1, -1e-6],
                        [0.5, 0.5, -1e-6], [-0.5, 0.5, -1e-6],
                        [1e-5, 1e-5, -1.0], [1e-5, -1e-5, 1.0]],
                       np.float32)
    extra /= np.linalg.norm(extra, axis=-1, keepdims=True)
    n = np.concatenate([n, extra])
    dec = oct_decode_np(np.asarray(oct_encode_f16(jnp.asarray(n)))[..., 0])
    ang = np.degrees(np.arccos(
        np.clip(np.sum(n * dec, axis=-1), -1.0, 1.0)))
    assert ang.max() < 1.5, ang.max()
