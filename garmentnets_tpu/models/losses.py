"""Shared loss reduction helpers.

The trainer pads partial validation batches up to a device-divisible size by
repeating rows (parallel/mesh.py pad_batch_to) and marks real rows with a
``_valid_mask`` [B] batch entry. Every loss/metric reduction goes through
masked_mean so padded rows contribute zero weight — val_loss and checkpoint
top-k selection are exact for any split size. (The reference never needs
this: Lightning feeds whole batches to one GPU.)
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean of x over all elements, excluding batch rows where mask==0.

    x: [B, ...] with the same number of elements per row (static shapes).
    mask: [B] float/bool, or None for a plain mean.
    """
    if mask is None:
        return jnp.mean(x)
    mask = mask.astype(x.dtype)
    w = mask.reshape(mask.shape + (1,) * (x.ndim - 1))
    elems_per_row = x.size // x.shape[0]
    denom = jnp.maximum(jnp.sum(mask) * elems_per_row, 1)
    return jnp.sum(x * w) / denom
