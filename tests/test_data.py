import numpy as np
import pytest

from garmentnets_tpu.data import zarrlite
from garmentnets_tpu.data.synthetic import generate_dataset
from garmentnets_tpu.data.dataset import (
    ConvImplicitWNFDataset, ConvImplicitWNFDataModule, collate, Loader)


@pytest.fixture(scope="module")
def synth_zarr(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "synth.zarr"
    generate_dataset(str(path), num_instances=3, grips_per_instance=2,
                     volume_size=16, mesh_res=8, pts_per_view=500)
    return str(path)


def test_zarrlite_roundtrip(tmp_path):
    root = zarrlite.open(str(tmp_path / "t.zarr"), "w")
    g = root.require_group("samples").require_group("a")
    g.attrs.put({"scale": 1.5, "name": "x"})
    rng = np.random.RandomState(0)
    arr = rng.rand(10, 3).astype(np.float32)
    g.array("pts", arr, chunks=(4, 3))
    ints = rng.randint(0, 100, (7,))
    g.array("ints", ints, compressor=None)

    r2 = zarrlite.open(str(tmp_path / "t.zarr"), "r")
    g2 = r2["samples/a"]
    assert g2.attrs["scale"] == 1.5
    np.testing.assert_array_equal(g2["pts"][:], arr)
    np.testing.assert_array_equal(g2["ints"][:], ints)
    assert "pts" in g2 and "nope" not in g2
    names = [k for k, _ in r2["samples"].groups()]
    assert names == ["a"]


def test_zarrlite_copy(tmp_path):
    src_root = zarrlite.open(str(tmp_path / "src.zarr"), "w")
    g = src_root.require_group("mesh")
    g.attrs.put({"k": 1})
    g.array("v", np.arange(6).reshape(2, 3))
    dst_root = zarrlite.open(str(tmp_path / "dst.zarr"), "w")
    zarrlite.copy(src_root["mesh"], dst_root, name="mesh_copy")
    assert dst_root["mesh_copy"].attrs["k"] == 1
    np.testing.assert_array_equal(
        dst_root["mesh_copy/v"][:], np.arange(6).reshape(2, 3))


def test_dataset_shapes_and_determinism(synth_zarr):
    ds = ConvImplicitWNFDataset(
        zarr_path=synth_zarr, num_pc_sample=256, num_volume_sample=64,
        num_surface_sample=64, volume_size=16, static_epoch_seed=True)
    assert len(ds) == 6
    s1 = ds[0]
    s2 = ds[0]
    assert s1["x"].shape == (256, 3)
    assert s1["pos"].shape == (256, 3)
    assert s1["y"].shape == (256, 3)
    assert s1["volume_query_points"].shape == (1, 64, 3)
    assert s1["gt_volume_value"].shape == (1, 64)
    assert s1["surf_query_points"].shape == (1, 64, 3)
    assert s1["gt_sim_points"].shape == (1, 64, 3)
    assert s1["input_aug_rot_mat"].shape == (1, 3, 3)
    # static epoch seed -> identical draws
    for k in s1:
        np.testing.assert_array_equal(s1[k], s2[k])
    # different idx -> different sample
    s3 = ds[1]
    assert not np.array_equal(s1["pos"], s3["pos"])


def test_dataset_non_static_varies(synth_zarr):
    ds = ConvImplicitWNFDataset(
        zarr_path=synth_zarr, num_pc_sample=128, volume_size=None,
        static_epoch_seed=False)
    a, b = ds[0], ds[0]
    assert not np.array_equal(a["pos"], b["pos"])


def test_rotation_augmentation_is_z_rotation(synth_zarr):
    ds = ConvImplicitWNFDataset(
        zarr_path=synth_zarr, num_pc_sample=128,
        num_surface_sample=32, volume_size=None,
        enable_augumentation=True, random_rot_range=(-180, 180),
        static_epoch_seed=True)
    s = ds[0]
    R = s["input_aug_rot_mat"][0]
    # proper z-rotation
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(R[2], [0, 0, 1], atol=1e-6)
    # gt_sim_points rotated consistently with pos: rotating back aligns with
    # the unaugmented dataset
    ds0 = ConvImplicitWNFDataset(
        zarr_path=synth_zarr, num_pc_sample=128,
        num_surface_sample=32, volume_size=None,
        enable_augumentation=False, static_epoch_seed=True)
    s0 = ds0[0]
    np.testing.assert_allclose(s["pos"] @ R, s0["pos"], atol=1e-5)
    np.testing.assert_allclose(
        s["gt_sim_points"][0] @ R, s0["gt_sim_points"][0], atol=1e-5)


def test_gt_volume_values_match_wnf(synth_zarr):
    """GT volume lookups must interpolate the stored WNF volume."""
    ds = ConvImplicitWNFDataset(
        zarr_path=synth_zarr, num_pc_sample=64, num_volume_sample=128,
        volume_size=16, static_epoch_seed=True, enable_augumentation=False)
    s = ds[0]
    v = s["gt_volume_value"][0]
    assert np.isfinite(v).all()
    # WNF of an open surface: mostly in [-0.5, 1.5]-ish range
    assert v.min() > -2 and v.max() < 3
    # near-surface values differ from far-field zeros
    assert v.std() > 1e-3


def test_collate_and_loader(synth_zarr):
    ds = ConvImplicitWNFDataset(
        zarr_path=synth_zarr, num_pc_sample=64, num_volume_sample=16,
        num_surface_sample=16, volume_size=16, static_epoch_seed=True)
    batch = collate([ds[0], ds[1]])
    assert batch["x"].shape == (2, 64, 3)
    assert batch["volume_query_points"].shape == (2, 16, 3)
    assert batch["nocs_grip_point"].shape == (2, 3)

    loader = Loader(ds, np.arange(5), batch_size=2, shuffle=True,
                    drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert all(b["x"].shape == (2, 64, 3) for b in batches)


def test_datamodule_split(synth_zarr):
    dm = ConvImplicitWNFDataModule(
        zarr_path=synth_zarr, num_pc_sample=64, volume_size=None,
        batch_size=2, dataset_split=[1, 1, 1], split_seed=0)
    dm.prepare_data()
    # 3 instances x 2 grips: each split gets one full instance (2 grips)
    assert len(dm.train_idxs) == 2
    assert len(dm.val_idxs) == 2
    assert len(dm.test_idxs) == 2
    # instance-level: grips of one instance never straddle splits
    df = dm.groups_df
    for idxs in (dm.train_idxs, dm.val_idxs, dm.test_idxs):
        ids = set(df.iloc[idxs].sample_id)
        for other in (dm.train_idxs, dm.val_idxs, dm.test_idxs):
            if other is idxs:
                continue
            assert ids.isdisjoint(set(df.iloc[other].sample_id))
    # seeded split is reproducible
    dm2 = ConvImplicitWNFDataModule(
        zarr_path=synth_zarr, num_pc_sample=64, volume_size=None,
        batch_size=2, dataset_split=[1, 1, 1], split_seed=0)
    dm2.prepare_data()
    np.testing.assert_array_equal(dm.train_idxs, dm2.train_idxs)


def test_multi_category_generator(tmp_path):
    """Second garment category (SynthSkirt tube topology): closed mesh,
    meshable WNF, and mixed-category datasets load through the dataset."""
    from garmentnets_tpu.data.synthetic import (
        make_tube_mesh, generate_dataset, GARMENT_MAKERS)
    from garmentnets_tpu.ops import geometry

    verts, faces = make_tube_mesh(10, np.random.RandomState(3))
    # closed 2-manifold: every edge shared by exactly 2 faces
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e.sort(axis=1)
    key = e[:, 0].astype(np.int64) * (1 << 32) + e[:, 1]
    _, counts = np.unique(key, return_counts=True)
    assert set(counts.tolist()) == {2}
    # WNF ~1 inside the wall, ~0 well outside, so the 0.5 iso crosses
    inside = verts.mean(axis=0, keepdims=True)  # tube axis: OUTSIDE wall
    w_axis = float(geometry.winding_number(
        inside.astype(np.float32), verts, faces, backend="numpy")[0])
    assert abs(w_axis) < 0.3  # hollow center is outside the material
    # between the walls at mid-height (same i,theta on outer+inner rings)
    n = len(verts) // 2
    ntheta = n // 10
    mid = (10 // 2) * ntheta
    probe = 0.5 * (verts[mid] + verts[n + mid])
    w_wall = float(geometry.winding_number(
        probe[None].astype(np.float32), verts, faces, backend="numpy")[0])
    assert w_wall > 0.7

    path = tmp_path / "mixed.zarr"
    generate_dataset(str(path), num_instances=2, grips_per_instance=1,
                     volume_size=16, mesh_res=8, pts_per_view=300,
                     garment_types=("SynthCloth", "SynthSkirt"))
    root = zarrlite.open(str(path), "r")
    names = {g.attrs.asdict()["garment_name"]
             for _, g in root["samples"].groups()}
    assert names == {"SynthCloth", "SynthSkirt"}
    ds = ConvImplicitWNFDataset(
        zarr_path=str(path), metadata_cache_dir=None, num_pc_sample=64,
        num_volume_sample=16, num_surface_sample=16,
        num_mc_surface_sample=0, surface_sample_ratio=0,
        surface_sample_std=0.05, surface_normal_noise_ratio=0,
        surface_normal_std=0.01, enable_augumentation=True,
        random_rot_range=[-180, 180], num_views=4, pc_noise_std=0,
        volume_size=16, volume_group="nocs_winding_number_field",
        tsdf_clip_value=None, volume_absolute_value=False,
        include_volume=False, static_epoch_seed=True)
    for i in range(len(ds)):
        s = ds[i]
        assert np.isfinite(s["pos"]).all()
        assert np.isfinite(s["gt_volume_value"]).all()
    assert set(GARMENT_MAKERS) == {"SynthCloth", "SynthSkirt"}
