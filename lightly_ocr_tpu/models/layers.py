"""Shared NN building blocks (flax.linen, NHWC, MXU-friendly dtypes).

Param-tree naming convention: every layer is given an explicit ``name``
matching the reference PyTorch state-dict key segment it corresponds to
(e.g. torch ``basenet.slice1.3.weight`` <-> flax path
``basenet/slice1/3/kernel``), so checkpoint import
(:mod:`lightly_ocr_tpu.utils.torch_import`) is a mechanical path+layout
transform rather than a hand-written mapping table.

Torch-semantics notes:
* BatchNorm: eps 1e-5, momentum 0.1 (flax ``momentum=0.9``).
* MaxPool with padding pads -inf on both sides (torch ``nn.MaxPool2d``).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def max_pool(
    x: jax.Array,
    window: tuple[int, int],
    strides: tuple[int, int],
    padding: tuple[tuple[int, int], tuple[int, int]] = ((0, 0), (0, 0)),
) -> jax.Array:
    """NHWC max pool with explicit -inf padding (torch MaxPool2d)."""
    return nn.max_pool(
        x, window_shape=window, strides=strides, padding=padding
    )


class ConvBN(nn.Module):
    """Conv2d followed by BatchNorm (+ optional ReLU), torch layouts.

    ``conv_name``/``bn_name`` mirror the reference module names so the
    param tree lines up with the torch state dict.
    """

    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: Any = ((1, 1), (1, 1))
    use_bias: bool = False
    relu: bool = True
    conv_name: str = "conv"
    bn_name: str = "bn"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name=self.conv_name,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=self.bn_name,
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


def conv(
    features: int,
    kernel: tuple[int, int] = (3, 3),
    strides: tuple[int, int] = (1, 1),
    padding: Any = ((1, 1), (1, 1)),
    use_bias: bool = True,
    name: str | None = None,
    dtype: Dtype = jnp.float32,
) -> nn.Conv:
    return nn.Conv(
        features,
        kernel,
        strides=strides,
        padding=padding,
        use_bias=use_bias,
        dtype=dtype,
        name=name,
    )


def batch_norm(train: bool, name: str, dtype: Dtype = jnp.float32) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


def adaptive_avg_pool_1(x: jax.Array) -> jax.Array:
    """AdaptiveAvgPool2d(1) over NHWC -> [B, C] (global mean)."""
    return jnp.mean(x, axis=(1, 2))
