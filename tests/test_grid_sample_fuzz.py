"""Property-based torch-oracle fuzzing of trilinear grid sampling.

Sweeps random volume shapes (incl. degenerate single-plane axes), channel
counts, and query distributions (interior / on-node / out-of-range) against
torch F.grid_sample with the reference's zyx-flip + align_corners + border
semantics (components/gridding.py:45-98) — the fixed-case oracle test
pins one configuration; this covers the space.
"""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from garmentnets_tpu.ops.grid_sample import grid_sample_trilinear  # noqa: E402


def _cases():
    return st.tuples(
        st.integers(0, 2 ** 31 - 1),
        st.integers(2, 7),   # D
        st.integers(2, 7),   # H
        st.integers(2, 7),   # W
        st.integers(1, 5),   # C
        st.sampled_from(["interior", "nodes", "wide"]),
    )


@settings(max_examples=30, deadline=None)
@given(_cases())
def test_matches_torch_grid_sample(args):
    seed, D, H, W, C, qmode = args
    rng = np.random.RandomState(seed)
    B, M = 2, 33
    vol = rng.rand(B, C, D, H, W).astype(np.float32)
    if qmode == "interior":
        q = rng.rand(B, M, 3).astype(np.float32)
    elif qmode == "nodes":
        # exactly on grid nodes: floor/ceil tie-break territory
        idx = np.stack([rng.randint(0, D, (B, M)),
                        rng.randint(0, H, (B, M)),
                        rng.randint(0, W, (B, M))], axis=-1)
        q = (idx / (np.asarray([D, H, W]) - 1)).astype(np.float32)
    else:
        q = (rng.rand(B, M, 3) * 1.6 - 0.3).astype(np.float32)  # clamped

    qn = torch.from_numpy(q) * 2.0 - 1.0
    grid = qn.view(B, M, 1, 1, 3).flip(-1)
    ref = F.grid_sample(torch.from_numpy(vol), grid, mode="bilinear",
                        padding_mode="border", align_corners=True)
    ref = ref.view(B, C, M).permute(0, 2, 1).numpy()

    vol_fl = np.moveaxis(vol, 1, -1)
    out = np.asarray(grid_sample_trilinear(
        jnp.asarray(vol_fl), jnp.asarray(q)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
