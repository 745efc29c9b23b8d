"""Pallas FPS kernel vs the XLA fallback (interpret mode on CPU).

On real TPU hardware the two can diverge after many iterations from
ULP-level reduction-ordering ties (both remain valid FPS selections);
interpret mode is bit-exact and is what we assert here."""
import numpy as np
import jax.numpy as jnp

from garmentnets_tpu.ops.pointcloud import furthest_point_sampling
from garmentnets_tpu.kernels.fps_pallas import furthest_point_sampling_pallas


def test_pallas_fps_matches_xla():
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.rand(3, 200, 3), jnp.float32)
    ref = np.asarray(furthest_point_sampling(pos, 32))
    out = np.asarray(furthest_point_sampling_pallas(pos, 32,
                                                    interpret=True))
    np.testing.assert_array_equal(out, ref)
