"""FAN-style ResNet feature extractor for text recognition (NHWC, flax).

Topology parity with ``ocr/modules/resnet50v1.py:5-135``: stem of two 3x3
convs, four BasicBlock stages with counts [1, 2, 5, 3], inter-stage convs,
and the load-bearing *asymmetric* pooling/strides — pool3 and conv4_1 use
stride (2, 1) with width padding so height collapses 32->1 while width
becomes the 26-step sequence axis (for the 32x100 input).

Param names mirror the torch state dict (``FeatureExtraction.ConvNet.*``)
so import is mechanical.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightly_ocr_tpu.models.layers import batch_norm, conv, max_pool

Dtype = Any


class BasicBlock(nn.Module):
    planes: int
    downsample: bool = False
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        y = conv(
            self.planes, use_bias=False, name="conv1", dtype=self.dtype,
            quant=self.quant,
        )(x)
        y = batch_norm(train, "bn1", self.dtype)(y)
        y = nn.relu(y)
        y = conv(
            self.planes, use_bias=False, name="conv2", dtype=self.dtype,
            quant=self.quant,
        )(y)
        y = batch_norm(train, "bn2", self.dtype)(y)
        if self.downsample:
            residual = DownsampleShortcut(
                self.planes, dtype=self.dtype, quant=self.quant,
                name="downsample",
            )(x, train)
        return nn.relu(y + residual)


class DownsampleShortcut(nn.Module):
    planes: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = conv(
            self.planes,
            kernel=(1, 1),
            padding="VALID",
            use_bias=False,
            name="0",
            dtype=self.dtype,
            quant=self.quant,
        )(x)
        return batch_norm(train, "1", self.dtype)(y)


class Stage(nn.Module):
    """A _make_layer stage: first block may carry a 1x1 downsample."""

    planes: int
    blocks: int
    in_planes: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = BasicBlock(
            self.planes,
            downsample=self.in_planes != self.planes,
            dtype=self.dtype,
            quant=self.quant,
            name="0",
        )(x, train)
        for i in range(1, self.blocks):
            x = BasicBlock(
                self.planes, dtype=self.dtype, quant=self.quant, name=str(i)
            )(x, train)
        return x


class ResNetFeatures(nn.Module):
    """The ConvNet inside ResNet50v2 (``resnet50v1.py:51-135``)."""

    output_channel: int = 512
    layers: Sequence[int] = (1, 2, 5, 3)
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        oc = self.output_channel
        blocks = [oc // 4, oc // 2, oc, oc]

        x = conv(oc // 16, use_bias=False, name="conv0_1", dtype=self.dtype,
                 quant=self.quant)(x)
        x = nn.relu(batch_norm(train, "bn0_1", self.dtype)(x))
        x = conv(oc // 8, use_bias=False, name="conv0_2", dtype=self.dtype,
                 quant=self.quant)(x)
        x = nn.relu(batch_norm(train, "bn0_2", self.dtype)(x))

        x = max_pool(x, (2, 2), (2, 2))
        x = Stage(blocks[0], self.layers[0], oc // 8, self.dtype,
                  self.quant, name="layer1")(
            x, train
        )
        x = conv(blocks[0], use_bias=False, name="conv1", dtype=self.dtype,
                 quant=self.quant)(x)
        x = nn.relu(batch_norm(train, "bn1", self.dtype)(x))

        x = max_pool(x, (2, 2), (2, 2))
        x = Stage(blocks[1], self.layers[1], blocks[0], self.dtype,
                  self.quant, name="layer2")(
            x, train
        )
        x = conv(blocks[1], use_bias=False, name="conv2", dtype=self.dtype,
                 quant=self.quant)(x)
        x = nn.relu(batch_norm(train, "bn2", self.dtype)(x))

        # Asymmetric: height halves, width preserved (+1 pad both sides).
        x = max_pool(x, (2, 2), (2, 1), padding=((0, 0), (1, 1)))
        x = Stage(blocks[2], self.layers[2], blocks[1], self.dtype,
                  self.quant, name="layer3")(
            x, train
        )
        x = conv(blocks[2], use_bias=False, name="conv3", dtype=self.dtype,
                 quant=self.quant)(x)
        x = nn.relu(batch_norm(train, "bn3", self.dtype)(x))

        x = Stage(blocks[3], self.layers[3], blocks[2], self.dtype,
                  self.quant, name="layer4")(
            x, train
        )
        x = conv(
            blocks[3],
            kernel=(2, 2),
            strides=(2, 1),
            padding=((0, 0), (1, 1)),
            use_bias=False,
            name="conv4_1",
            dtype=self.dtype,
            quant=self.quant,
        )(x)
        x = nn.relu(batch_norm(train, "bn4_1", self.dtype)(x))
        x = conv(
            blocks[3],
            kernel=(2, 2),
            strides=(1, 1),
            padding="VALID",
            use_bias=False,
            name="conv4_2",
            dtype=self.dtype,
            quant=self.quant,
        )(x)
        x = nn.relu(batch_norm(train, "bn4_2", self.dtype)(x))
        return x  # [B, 1, W', C] for 32-high inputs


class ResNet50v2(nn.Module):
    """Wrapper matching the reference class of the same name
    (``resnet50v1.py:5-13``); param path ``ConvNet.*``."""

    output_channel: int = 512
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return ResNetFeatures(
            self.output_channel, dtype=self.dtype, quant=self.quant,
            name="ConvNet",
        )(x, train)
