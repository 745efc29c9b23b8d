"""Device-side MC vertex normals (ops/normals): octahedral codec, gradient
semantics vs numpy, and engine-level parity vs the host C++ kernel's
normals (skimage gradient semantics) on a sphere field."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from garmentnets_tpu.ops.normals import (
    dense_gradient, sample_gradient_normals_oct, oct_encode_f16,
    oct_decode_np)


def _angles_deg(a, b):
    d = np.clip(np.sum(a * b, axis=-1), -1.0, 1.0)
    return np.degrees(np.arccos(d))


def test_oct_roundtrip_precision():
    rng = np.random.RandomState(0)
    n = rng.randn(5000, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    dec = oct_decode_np(np.asarray(oct_encode_f16(jnp.asarray(n)))[..., 0])
    ang = _angles_deg(n, dec)
    assert ang.max() < 1.2, ang.max()
    assert ang.mean() < 0.5, ang.mean()
    # axis-aligned vectors are exact-ish
    eye = np.eye(3, dtype=np.float32)
    axes = np.concatenate([eye, -eye])
    dec = oct_decode_np(
        np.asarray(oct_encode_f16(jnp.asarray(axes)))[..., 0])
    assert _angles_deg(axes, dec).max() < 0.5


def test_dense_gradient_matches_np_gradient():
    rng = np.random.RandomState(1)
    vol = rng.rand(2, 9, 10, 11).astype(np.float32)
    got = np.asarray(dense_gradient(jnp.asarray(vol)))
    for b in range(2):
        gx, gy, gz = np.gradient(vol[b])
        np.testing.assert_allclose(got[b, ..., 0], gx, atol=1e-6)
        np.testing.assert_allclose(got[b, ..., 1], gy, atol=1e-6)
        np.testing.assert_allclose(got[b, ..., 2], gz, atol=1e-6)


def _sphere(S):
    x, y, z = np.mgrid[:S, :S, :S] / (S - 1.0)
    return (1.0 - 2.0 * np.sqrt(
        (x - .5) ** 2 + (y - .5) ** 2 + (z - .55) ** 2)).astype(np.float32)


def test_device_normals_match_host_kernel():
    """sample_gradient_normals_oct at the host MC's vertices must agree
    with the C++ kernel's normals (same gradient-lerp semantics; the
    device reads the full-precision field where the host reads
    int8-dequantized bricks, so tolerance covers quantization noise)."""
    from garmentnets_tpu.ops.isosurface import extract_active_bricks
    from garmentnets_tpu.ops.marching_cubes import marching_cubes_bricks

    S = 32
    vol = _sphere(S)
    b, v, c = extract_active_bricks(jnp.asarray(vol[None]), 0.5, 512)
    n = int(np.asarray(c)[0])
    verts, faces, vals, host_n = marching_cubes_bricks(
        np.asarray(b)[0, :n], np.asarray(v)[0, :n], (S, S, S), 0.5,
        (1.0 / (S - 1),) * 3, gradient_direction="ascent",
        return_values=True, return_normals=True)
    oct = sample_gradient_normals_oct(
        jnp.asarray(vol[None]), jnp.asarray(verts[None], jnp.float32),
        ascent=True)
    dev_n = oct_decode_np(np.asarray(oct)[0, :, 0])
    ang = _angles_deg(host_n, dev_n)
    assert ang.mean() < 3.0, ang.mean()
    assert np.percentile(ang, 95) < 8.0, np.percentile(ang, 95)
    # outward orientation: normals point away from the sphere center
    out_dir = verts - np.array([0.5, 0.5, 0.55], np.float32)
    out_dir /= np.linalg.norm(out_dir, axis=-1, keepdims=True)
    assert (np.sum(dev_n * out_dir, axis=-1) > 0).mean() > 0.99


def test_engine_device_normals_end_to_end():
    """A device_normals engine must produce meshes whose normals ride the
    warp result (host kernel runs without its normals pass) and agree with
    the host-mode engine's normals."""
    from garmentnets_tpu.ops.isosurface import (
        extract_active_bricks, pack_brick_pages)
    from garmentnets_tpu.harness.predict_engine import PredictEngine
    from garmentnets_tpu.models.pipeline import (
        ConvImplicitWNFPipeline, PipelineConfig)
    from garmentnets_tpu.models.pointnet2_nocs import PointNet2NOCSConfig

    cfg = PipelineConfig(
        pointnet2=PointNet2NOCSConfig(nocs_bins=8, feature_dim=16),
        volume_agg_nn_channels=(25, 16),
        grid_shape=(8, 8, 8), unet_in_channels=16, unet_out_channels=16,
        unet_f_maps=8, unet_num_levels=2,
        volume_decoder_channels=(16, 1), surface_decoder_channels=(16, 3))
    model = ConvImplicitWNFPipeline(cfg)
    B, N = 1, 64
    rng = np.random.RandomState(0)
    batch = {"x": rng.rand(B, N, 3).astype(np.float32),
             "pos": (rng.rand(B, N, 3) - .5).astype(np.float32),
             "volume_query_points": rng.rand(B, 8, 3).astype(np.float32),
             "surf_query_points": rng.rand(B, 8, 3).astype(np.float32)}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    S = 16
    vol = _sphere(S)
    eng_h = PredictEngine(cfg, variables, volume_size=S,
                          device_normals=False)
    eng_d = PredictEngine(cfg, variables, volume_size=S,
                          device_normals=True)
    base, valsq, counts = extract_active_bricks(
        jnp.asarray(vol[None]), 0.5, eng_h.brick_cap)

    def run(eng):
        enc = eng.encode(batch["x"], batch["pos"])
        enc = dict(enc)
        enc["active_pages"] = pack_brick_pages(
            base, valsq, eng.brick_page, counts=counts)
        # substitute the sphere for BOTH the bricks and the volume the
        # device normals sample (in production they are the same field)
        enc["wnf_volume"] = jnp.asarray(vol[None])
        meshes = eng.extract_meshes(enc)
        warps = eng.warp_batch(enc, meshes)
        return meshes, warps

    mh, wh = run(eng_h)
    md, wd = run(eng_d)
    assert mh[0] is not None and md[0] is not None
    np.testing.assert_array_equal(mh[0][0], md[0][0])   # same verts
    assert mh[0][3] is not None and md[0][3] is None    # host vs device
    assert "normals" not in wh[0] and "normals" in wd[0]
    dev_n = wd[0]["normals"]
    assert dev_n.shape == mh[0][3].shape
    ang = _angles_deg(mh[0][3], dev_n)
    assert ang.mean() < 4.0, ang.mean()
    # warp field itself is unchanged by the extra lane
    np.testing.assert_allclose(wh[0]["warp_field"], wd[0]["warp_field"],
                               atol=1e-3)
    np.testing.assert_allclose(wh[0]["verts_ggm"], wd[0]["verts_ggm"],
                               atol=1e-3)
