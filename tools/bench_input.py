"""Input-pipeline throughput at stage-2 production settings.

Answers VERDICT round-1 item 7's "is the device input-starved?" question:
measures Loader samples/sec (zarr read + view subsampling + volume GT
trilinear lookups + barycentric surface sampling + augmentation, B=24,
6000 pts / 6000 volume / 6000 surface samples) for several num_workers
values, and compares against the measured device step rate (~31 samples/s
stage-2 on one v5e chip, README).

Usage: python tools/bench_input.py [num_instances]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from garmentnets_tpu.data.synthetic import generate_dataset  # noqa: E402
from garmentnets_tpu.data.dataset import (  # noqa: E402
    ConvImplicitWNFDataset, Loader)


def main():
    n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    tmp = tempfile.mkdtemp()
    zp = f"{tmp}/synth.zarr"
    print(f"generating synthetic dataset ({n_inst} instances)...",
          file=sys.stderr)
    generate_dataset(zp, num_instances=n_inst, grips_per_instance=3,
                     volume_size=128, mesh_res=24, pts_per_view=3000,
                     include_task_space=False)

    ds = ConvImplicitWNFDataset(
        zarr_path=zp, metadata_cache_dir=None,
        num_pc_sample=6000, num_volume_sample=6000, num_surface_sample=6000,
        num_mc_surface_sample=0, surface_sample_ratio=0,
        surface_sample_std=0.05, surface_normal_noise_ratio=0,
        surface_normal_std=0.01, enable_augumentation=True,
        random_rot_range=[-180, 180], num_views=4, pc_noise_std=0,
        volume_size=128, volume_group="nocs_winding_number_field",
        tsdf_clip_value=None, volume_absolute_value=False,
        include_volume=False, static_epoch_seed=False)
    idxs = np.arange(len(ds))
    B = 24

    for workers in (0, 2, 4):
        loader = Loader(ds, idxs, B, shuffle=True, num_workers=workers)
        # warm one batch (zarr page cache, thread pool spin-up)
        next(iter(loader))
        t0 = time.time()
        n = 0
        for _ in range(3):
            for batch in loader:
                n += len(batch["pos"])
        dt = time.time() - t0
        print(f"num_workers={workers}: {n / dt:7.1f} samples/sec "
              f"({n} samples in {dt:.2f}s)")


if __name__ == "__main__":
    main()
