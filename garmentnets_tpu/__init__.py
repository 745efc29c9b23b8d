"""GarmentNets-TPU: a TPU-native (JAX/XLA/Pallas/pjit) re-implementation of the
GarmentNets category-level garment pose estimation framework.

Capability parity target: real-stanford/garmentnets (ICCV 2021).
Reference layer map: see SURVEY.md. This package is a ground-up TPU-first
design, not a port:

- `ops/`      device kernels (Pallas + XLA): FPS, ball query, kNN interp,
              voxel scatter, trilinear grid sampling, gaussian gradient,
              plus host-side geometry (marching cubes C++, geodesics).
- `models/`   flax modules: PointNet++ NOCS (stage 1), volume aggregator,
              3D U-Net, implicit WNF decoders, the full pipeline (stage 2).
- `data/`     zarr-v2 compatible store, dataset sampling, instance split,
              synthetic data generation (reference schema).
- `parallel/` jax.sharding Mesh helpers; DP/spatial sharding for train+predict.
- `harness/`  CLI entry points: train_pointnet2, train_pipeline, predict, eval.
- `core/`     config system, checkpointing, logging.
"""

__version__ = "0.1.0"
