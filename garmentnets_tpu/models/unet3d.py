"""3D U-Net (flax, feature-last layout).

Capability parity with reference `components/unet3d.py` (vendored
pytorch-3dunet): configurable conv-order string ('gcr' = GroupNorm + Conv3d +
ReLU), DoubleConv blocks, max-pool encoders, nearest-upsample + concat
decoders, final 1x1x1 conv. The pipeline config uses DoubleConv, f_maps=32,
4 levels, order 'gcr', groups 8 (config/train_pipeline_default.yaml:49-55).

TPU-first design: volumes are [B, D, H, W, C] (channels on the lane dim) and
convs lower to XLA conv_general_dilated — the MXU sweet spot (SURVEY.md §2.3
#7). No torch layout gymnastics survive.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from garmentnets_tpu.models.mlp import MaskedBatchNorm


def number_of_features_per_level(init: int, num_levels: int):
    return [init * 2 ** k for k in range(num_levels)]


class SingleConv(nn.Module):
    """One conv layer assembled from an order string (reference create_conv
    :19-76). Supported chars: c(onv) g(roupnorm) b(atchnorm) r(elu)
    l(eaky relu) e(lu)."""
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    order: str = "gcr"
    num_groups: int = 8

    @nn.compact
    def __call__(self, x, train: bool = True):
        order = self.order
        assert "c" in order, "conv layer must be present"
        assert order[0] not in "rle", "non-linearity cannot be first"
        conv_pos = order.index("c")
        for i, ch in enumerate(order):
            if ch == "c":
                use_bias = not ("g" in order or "b" in order)
                x = nn.Conv(
                    self.out_channels,
                    kernel_size=(self.kernel_size,) * 3,
                    padding="SAME", use_bias=use_bias,
                    name=f"conv_{i}")(x)
            elif ch == "g":
                num_channels = (self.in_channels if i < conv_pos
                                else self.out_channels)
                groups = self.num_groups
                if num_channels < groups:
                    groups = 1
                assert num_channels % groups == 0
                # epsilon=1e-5 matches torch GroupNorm (flax defaults to
                # 1e-6); the difference dominates on near-empty volume
                # regions where group variance << eps
                x = nn.GroupNorm(num_groups=groups, epsilon=1e-5,
                                 name=f"gn_{i}")(x)
            elif ch == "b":
                x = MaskedBatchNorm(name=f"bn_{i}")(x, train=train)
            elif ch == "r":
                x = nn.relu(x)
            elif ch == "l":
                x = nn.leaky_relu(x, negative_slope=0.1)
            elif ch == "e":
                x = nn.elu(x)
            else:
                raise ValueError(f"unsupported layer type {ch!r}")
        return x


class DoubleConv(nn.Module):
    """Two SingleConvs; encoder halves-then-expands channels with the
    reference's clamp rule (unet3d.py:125-144)."""
    in_channels: int
    out_channels: int
    encoder: bool
    kernel_size: int = 3
    order: str = "gcr"
    num_groups: int = 8

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.encoder:
            c1_out = self.out_channels // 2
            if c1_out < self.in_channels:
                c1_out = self.in_channels
            c1_in, c2_in, c2_out = self.in_channels, c1_out, self.out_channels
        else:
            c1_in, c1_out = self.in_channels, self.out_channels
            c2_in, c2_out = self.out_channels, self.out_channels
        x = SingleConv(c1_in, c1_out, self.kernel_size, self.order,
                       self.num_groups, name="conv1")(x, train=train)
        x = SingleConv(c2_in, c2_out, self.kernel_size, self.order,
                       self.num_groups, name="conv2")(x, train=train)
        return x


class ExtResNetBlock(nn.Module):
    """Residual block variant (reference unet3d.py:147-192)."""
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    order: str = "cge"
    num_groups: int = 8

    @nn.compact
    def __call__(self, x, train: bool = True):
        n_order = self.order
        for c in "rel":
            n_order = n_order.replace(c, "")
        out = SingleConv(self.in_channels, self.out_channels,
                         self.kernel_size, self.order, self.num_groups,
                         name="conv1")(x, train=train)
        residual = out
        out = SingleConv(self.out_channels, self.out_channels,
                         self.kernel_size, self.order, self.num_groups,
                         name="conv2")(out, train=train)
        out = SingleConv(self.out_channels, self.out_channels,
                         self.kernel_size, n_order, self.num_groups,
                         name="conv3")(out, train=train)
        out = out + residual
        if "l" in self.order:
            return nn.leaky_relu(out, negative_slope=0.1)
        if "e" in self.order:
            return nn.elu(out)
        return nn.relu(out)


def _max_pool3d(x):
    return nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))


def _upsample_nearest(x, target_spatial: Tuple[int, int, int]):
    """Nearest-neighbor upsample to the skip connection's spatial dims.

    Spatial dims here are always exact x2 of the input (32/16/8/4 ladder), so
    jnp.repeat reproduces torch F.interpolate(mode='nearest') exactly.
    """
    B, D, H, W, C = x.shape
    td, th, tw = target_spatial
    assert td % D == 0 and th % H == 0 and tw % W == 0, (
        "non-integer upsample factor")
    x = jnp.repeat(x, td // D, axis=1)
    x = jnp.repeat(x, th // H, axis=2)
    x = jnp.repeat(x, tw // W, axis=3)
    return x


class ResidualUNet3D(nn.Module):
    """Residual variant (reference unet3d.py:494-509): ExtResNetBlock basic
    module, transposed-conv upsampling, summation joining."""
    in_channels: int
    out_channels: int
    f_maps: int | Sequence[int] = 32
    layer_order: str = "cge"
    num_groups: int = 8
    num_levels: int = 5

    @nn.compact
    def __call__(self, x, train: bool = True):
        f_maps = self.f_maps
        if isinstance(f_maps, int):
            f_maps = number_of_features_per_level(f_maps, self.num_levels)
        enc_feats = []
        in_ch = self.in_channels
        for i, out_ch in enumerate(f_maps):
            if i > 0:
                x = _max_pool3d(x)
            x = ExtResNetBlock(in_ch, out_ch, order=self.layer_order,
                               num_groups=self.num_groups,
                               name=f"encoder_{i}")(x, train=train)
            enc_feats.insert(0, x)
            in_ch = out_ch
        rev = list(reversed(f_maps))
        for i in range(len(rev) - 1):
            skip = enc_feats[i + 1]
            # torch ConvTranspose3d(k=3, s=2, p=1) + output_size plumbing
            # (reference unet3d.py:320-327, effective output_padding=1)
            # maps to lax padding (1,2) per spatial dim; transpose_kernel
            # matches torch's adjoint-convolution weight convention so
            # converted checkpoints are numerically exact.
            x = nn.ConvTranspose(
                rev[i + 1], kernel_size=(3, 3, 3), strides=(2, 2, 2),
                padding=[(1, 2)] * 3, transpose_kernel=True,
                name=f"upsample_{i}")(x)
            x = skip + x
            x = ExtResNetBlock(rev[i + 1], rev[i + 1],
                               order=self.layer_order,
                               num_groups=self.num_groups,
                               name=f"decoder_{i}")(x, train=train)
        return nn.Conv(self.out_channels, kernel_size=(1, 1, 1),
                       name="final_conv")(x)


class UNet3D(nn.Module):
    """Abstract3DUNet parity (reference unet3d.py:361-474) with DoubleConv
    basic module, max-pool encoders, nearest-upsample + concat decoders."""
    in_channels: int
    out_channels: int
    f_maps: int | Sequence[int] = 32
    layer_order: str = "gcr"
    num_groups: int = 8
    num_levels: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        f_maps = self.f_maps
        if isinstance(f_maps, int):
            f_maps = number_of_features_per_level(f_maps, self.num_levels)

        # encoder path
        enc_feats = []
        in_ch = self.in_channels
        for i, out_ch in enumerate(f_maps):
            if i > 0:
                x = _max_pool3d(x)
            x = DoubleConv(in_ch, out_ch, encoder=True,
                           order=self.layer_order,
                           num_groups=self.num_groups,
                           name=f"encoder_{i}")(x, train=train)
            enc_feats.insert(0, x)
            in_ch = out_ch

        # decoder path (skip the deepest feature = current x)
        rev = list(reversed(f_maps))
        for i in range(len(rev) - 1):
            skip = enc_feats[i + 1]
            x = _upsample_nearest(x, skip.shape[1:4])
            x = jnp.concatenate([skip, x], axis=-1)
            x = DoubleConv(rev[i] + rev[i + 1], rev[i + 1], encoder=False,
                           order=self.layer_order,
                           num_groups=self.num_groups,
                           name=f"decoder_{i}")(x, train=train)

        x = nn.Conv(self.out_channels, kernel_size=(1, 1, 1),
                    name="final_conv")(x)
        return x
