"""Device mesh + sharding helpers.

The reference has no distributed machinery at all (SURVEY.md §2.5); this is
the TPU-native scaling layer designed in its place:

- data parallelism: batch sharded over a 1-D 'data' mesh axis, params
  replicated; XLA inserts the psum for gradient reduction (jit/GSPMD).
- spatial parallelism for dense prediction: the 128^3 (or 256^3) WNF query
  grid is embarrassingly parallel over chunks; chunks shard over the same
  mesh axis for batched multi-garment inference.

Collectives ride ICI within a pod; jax.distributed extends the same program
across hosts over DCN without code changes.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host initialization (SURVEY.md §2.5 'Multi-host DCN'): after
    this, jax.devices() spans all hosts and the same pjit programs scale
    across DCN. No-op when env provides the cluster config (GKE/TPU-VM)."""
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(num_devices: int = -1, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is None or num_devices < 0:
        num_devices = len(devices)
    return Mesh(np.asarray(devices[:num_devices]), (axis_name,))


def make_mesh_2d(n_data: int, n_space: int,
                 data_axis: str = "data",
                 space_axis: str = "space") -> Mesh:
    """("data", "space") mesh composing batch DP with the dense decode's
    D-axis slab sharding (ops/dense_decode). The space axis is the INNER
    (fastest-varying) dimension so slab-neighbor devices are ICI-adjacent
    — slab sharding has no cross-slab traffic, but the post-decode gather
    back to batch sharding rides the shorter links."""
    devices = jax.devices()
    assert n_data * n_space <= len(devices), (
        n_data, n_space, len(devices))
    grid = np.asarray(devices[:n_data * n_space]).reshape(n_data, n_space)
    return Mesh(grid, (data_axis, space_axis))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """device_put a host batch with axis 0 sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sh), batch)


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def pad_batch_to(batch: dict, target_b: int) -> tuple[dict, int]:
    """Pad batch axis 0 to target_b (divisible by mesh size); returns
    (padded_batch, real_b). Padding repeats row 0 — results sliced off."""
    any_leaf = next(iter(batch.values()))
    real_b = any_leaf.shape[0]
    if real_b == target_b:
        return batch, real_b
    assert real_b < target_b

    def pad(a):
        reps = np.repeat(a[:1], target_b - real_b, axis=0)
        return np.concatenate([a, reps], axis=0)
    return {k: pad(np.asarray(v)) for k, v in batch.items()}, real_b
