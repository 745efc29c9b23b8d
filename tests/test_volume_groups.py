"""Dataset volume-group transform branches (reference data_io,
conv_implicit_wnf_dataset.py:134-180): tsdf clipping, absolute value, and
occupancy binarization — previously untested knobs of the config schema."""
import numpy as np
import pytest

from garmentnets_tpu.data import zarrlite
from garmentnets_tpu.data.dataset import ConvImplicitWNFDataset
from garmentnets_tpu.data.synthetic import generate_dataset

VS = 12

COMMON = dict(metadata_cache_dir=None, num_pc_sample=64,
              num_volume_sample=32, num_surface_sample=0,
              num_mc_surface_sample=0, surface_sample_ratio=0,
              surface_sample_std=0.05, surface_normal_noise_ratio=0,
              surface_normal_std=0.01, enable_augumentation=False,
              random_rot_range=[0, 0], num_views=4, pc_noise_std=0,
              volume_size=VS, include_volume=False, static_epoch_seed=True)


@pytest.fixture(scope="module")
def zarr_with_groups(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vg") / "s.zarr")
    generate_dataset(path, num_instances=1, grips_per_instance=1,
                     volume_size=VS, mesh_res=6, pts_per_view=100)
    root = zarrlite.open(path, "a")
    rng = np.random.RandomState(0)
    for key, g in root["samples"].groups():
        vol = g["volume"]
        sdf = rng.randn(VS, VS, VS).astype(np.float32) * 0.2
        vol.require_group("nocs_signed_distance_field").array(str(VS), sdf)
        occ = (rng.rand(VS, VS, VS) > 0.5).astype(np.float32)
        vol.require_group("nocs_occupancy_grid").array(str(VS), occ)
    return path


def _gt_values(path, **overrides):
    ds = ConvImplicitWNFDataset(zarr_path=path, tsdf_clip_value=None,
                                volume_absolute_value=False,
                                **dict(COMMON, **overrides))
    return ds[0]["gt_volume_value"]


def test_tsdf_clip_and_absolute(zarr_with_groups):
    raw = _gt_values(zarr_with_groups,
                     volume_group="nocs_signed_distance_field")
    assert raw.min() < 0  # signed field passes through untransformed

    ds = ConvImplicitWNFDataset(
        zarr_path=zarr_with_groups, tsdf_clip_value=0.1,
        volume_absolute_value=True,
        **dict(COMMON, volume_group="nocs_signed_distance_field"))
    vals = ds[0]["gt_volume_value"]
    assert vals.min() >= 0 and vals.max() <= 1.0 + 1e-6
    # clipping saturates most of the volume (|sdf| >= 0.1 is common for
    # sigma=0.2 noise); trilinear sampling blurs but stays near 1
    assert vals.max() > 0.9


def test_occupancy_binarized(zarr_with_groups):
    vals = _gt_values(zarr_with_groups, volume_group="nocs_occupancy_grid")
    assert set(np.unique(vals)).issubset({0.0, 1.0})


def test_wnf_untouched(zarr_with_groups):
    vals = _gt_values(zarr_with_groups,
                      volume_group="nocs_winding_number_field")
    assert 0 < vals.mean() < 1 and not set(
        np.unique(vals)).issubset({0.0, 1.0})
