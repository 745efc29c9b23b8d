import numpy as np
import jax.numpy as jnp

from garmentnets_tpu.ops.pointcloud import (
    furthest_point_sampling, ball_query, knn_interpolate)


def _np_fps(pos, m, start=0):
    n = pos.shape[0]
    idxs = [start]
    mind = np.full(n, np.inf)
    for _ in range(1, m):
        d = np.sum((pos - pos[idxs[-1]]) ** 2, axis=-1)
        mind = np.minimum(mind, d)
        idxs.append(int(np.argmax(mind)))
    return np.array(idxs)


def test_fps_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    pos = rng.rand(2, 100, 3).astype(np.float32)
    out = np.asarray(furthest_point_sampling(jnp.asarray(pos), 16))
    for b in range(2):
        np.testing.assert_array_equal(out[b], _np_fps(pos[b], 16))


def test_fps_spread():
    # FPS picks well-spread points: min pairwise distance among selected
    # should exceed random selection's by a wide margin.
    rng = np.random.RandomState(1)
    pos = rng.rand(1, 500, 3).astype(np.float32)
    idx = np.asarray(furthest_point_sampling(jnp.asarray(pos), 32))[0]
    sel = pos[0, idx]
    d = np.linalg.norm(sel[:, None] - sel[None], axis=-1)
    d[np.arange(32), np.arange(32)] = np.inf
    assert d.min() > 0.1


def test_ball_query_vs_bruteforce():
    rng = np.random.RandomState(2)
    pts = rng.rand(2, 200, 3).astype(np.float32)
    ctr = pts[:, :50]
    r = 0.2
    idx, mask = ball_query(jnp.asarray(pts), jnp.asarray(ctr), r, k=16,
                           chunk=32)
    idx, mask = np.asarray(idx), np.asarray(mask)
    for b in range(2):
        for m in range(50):
            d = np.linalg.norm(pts[b] - ctr[b, m], axis=-1)
            true_in = set(np.where(d <= r + 1e-6)[0])
            got = idx[b, m][mask[b, m]]
            # all returned neighbors genuinely within radius
            assert set(got).issubset(true_in | set(
                np.where(d <= r + 1e-4)[0]))
            # count = min(K, #clearly-within radius), and self always present
            # (a 1e-3 band absorbs fp32 top-k ordering fuzz at the boundary)
            n_in = np.sum(d <= r - 1e-3)
            assert mask[b, m].sum() >= min(16, n_in)
            assert m in set(got)  # center is its own neighbor (dist 0)
            # returned are the nearest ones: max returned dist <= min excluded
            if mask[b, m].sum() == 16 and len(true_in) > 16:
                dr = np.sort(d[list(got)])
                excluded = sorted(true_in - set(got))
                assert dr.max() <= d[excluded].min() + 1e-5


def test_knn_interpolate_vs_oracle():
    rng = np.random.RandomState(3)
    src_pos = rng.rand(2, 40, 3).astype(np.float32)
    dst_pos = rng.rand(2, 70, 3).astype(np.float32)
    feat = rng.rand(2, 40, 5).astype(np.float32)
    out = np.asarray(knn_interpolate(
        jnp.asarray(feat), jnp.asarray(src_pos), jnp.asarray(dst_pos), k=3))
    for b in range(2):
        for t in range(70):
            d2 = np.sum((src_pos[b] - dst_pos[b, t]) ** 2, axis=-1)
            nn = np.argsort(d2)[:3]
            w = 1.0 / np.maximum(d2[nn], 1e-16)
            ref = (w[:, None] * feat[b, nn]).sum(0) / w.sum()
            np.testing.assert_allclose(out[b, t], ref, rtol=2e-4, atol=2e-5)


def test_knn_interpolate_k1_broadcast():
    # FP3 in the reference interpolates from ONE global point with k=1:
    # every target must receive exactly the source feature.
    feat = jnp.ones((2, 1, 8)) * jnp.arange(2).reshape(2, 1, 1)
    src = jnp.zeros((2, 1, 3))
    dst = jnp.asarray(np.random.RandomState(4).rand(2, 10, 3), jnp.float32)
    out = np.asarray(knn_interpolate(feat, src, dst, k=1))
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[1], 1.0)
