"""Point MLP + masked batch normalization.

Parity with the reference `components/mlp.py` (Linear -> ReLU -> BatchNorm1d
stacks, `PointBatchNorm1D` flattens leading dims before BN) — with one
TPU-native extension: the dense ball-query formulation introduces padded
neighbor slots, so BN statistics must be computed over *valid* entries only
(SURVEY.md §7 "Hard parts": masks must not perturb BN statistics).

Conventions chosen for checkpoint-conversion parity with torch BatchNorm1d:
- normalization uses biased batch variance,
- running_var stores the *unbiased* variance,
- running = (1 - momentum) * running + momentum * batch with momentum=0.1.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all leading axes, with optional validity mask.

    x: [..., C]; mask: broadcastable to x.shape[:-1] (True = valid).
    """
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            xf = x.astype(jnp.float32)
            if mask is None:
                n = 1
                for s in x.shape[:-1]:
                    n *= s
                mean = jnp.mean(xf, axis=tuple(range(x.ndim - 1)))
                var = jnp.mean(
                    (xf - mean) ** 2, axis=tuple(range(x.ndim - 1)))
                n_arr = jnp.asarray(float(n), jnp.float32)
            else:
                w = jnp.broadcast_to(
                    mask.astype(jnp.float32)[..., None], x.shape)
                n_arr = jnp.maximum(
                    jnp.sum(w, axis=tuple(range(x.ndim - 1)))[0], 1.0)
                mean = (jnp.sum(xf * w, axis=tuple(range(x.ndim - 1)))
                        / n_arr)
                var = (jnp.sum(((xf - mean) ** 2) * w,
                               axis=tuple(range(x.ndim - 1))) / n_arr)
            if not self.is_initializing():
                unbiased = var * n_arr / jnp.maximum(n_arr - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jnp.asarray(1.0, jnp.float32) / jnp.sqrt(var + self.epsilon)
        y = (x - mean) * (inv * scale) + bias
        return y.astype(x.dtype)


class PointMLP(nn.Module):
    """(Dense -> ReLU -> BatchNorm) per layer, reference MLP parity."""
    channels: Sequence[int]  # includes input dim at index 0 (for doc parity)
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        for i, ch in enumerate(self.channels[1:]):
            x = nn.Dense(ch, name=f"dense_{i}")(x)
            x = nn.relu(x)
            if self.batch_norm:
                x = MaskedBatchNorm(name=f"bn_{i}")(x, mask=mask, train=train)
        return x
