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


class QuantConv(nn.Module):
    """w8a8 dynamically-quantized conv for the v5e int8 MXU (2x bf16 peak).

    Same parameter tree as ``nn.Conv`` (float master ``kernel``/``bias``,
    identical initializers) so checkpoints import unchanged and the flag
    flips implementation only.  At apply time:

    * weights: symmetric per-output-channel int8 (scale = amax over
      kh/kw/cin / 127) — computed from the float32 master each dispatch;
      weights are tiny next to activations so this costs ~nothing and
      XLA keeps the requantize out of the hot loop's critical path;
    * activations: symmetric PER-BATCH-ELEMENT dynamic int8 (scale =
      amax over H/W/C per sample / 127, one fused VPU reduction) — no
      offline calibration pass, which keeps ``load()`` identical to the
      float engines.  Per-sample (not per-tensor) scales make each
      image's quantization independent of its batchmates, so a given
      request's OCR output does not depend on batch composition;
    * conv accumulates int32 on the MXU, then one fused epilogue
      dequantizes (sx*sw per channel) and adds the float bias.

    The reference runs fp32 cuDNN convs; this is the TPU-native serving
    speed path and is parity-gated by tests (score-map tolerance +
    box-IoU vs the float program).
    """

    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: Any = ((1, 1), (1, 1))
    use_bias: bool = True
    dilation: tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features),
            jnp.float32,
        )
        b = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.use_bias
            else None
        )

        # Narrow layers are lane-starved, not MXU-bound: int8 measured
        # NIL gain below 128 channels on v5e (scripts/profile_int8.py),
        # so they keep the float path (identical params either way).
        if min(cin, self.features) < 128:
            dn = jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
            )
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                w.astype(self.dtype),
                window_strides=self.strides,
                padding=self.padding,
                rhs_dilation=self.dilation,
                dimension_numbers=dn,
            )
            if b is not None:
                y = y + b.astype(self.dtype)
            return y

        sw = jnp.maximum(
            jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12
        ) / 127.0  # [Cout]
        wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)

        xf = x.astype(jnp.float32)
        sx = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True), 1e-12
        ) / 127.0  # [B,1,1,1]: each sample quantizes independently
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)

        dn = jax.lax.conv_dimension_numbers(
            xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            xq,
            wq,
            window_strides=self.strides,
            padding=self.padding,
            rhs_dilation=self.dilation,
            dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        out = y.astype(jnp.float32) * (sx * sw)
        if b is not None:
            out = out + b
        return out.astype(self.dtype)


def conv(
    features: int,
    kernel: tuple[int, int] = (3, 3),
    strides: tuple[int, int] = (1, 1),
    padding: Any = ((1, 1), (1, 1)),
    use_bias: bool = True,
    name: str | None = None,
    dtype: Dtype = jnp.float32,
    quant: bool = False,
) -> nn.Module:
    if quant:
        return QuantConv(
            features,
            kernel,
            strides=strides,
            padding=padding,
            use_bias=use_bias,
            dtype=dtype,
            name=name,
        )
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


def torch_rnn_init(hidden: int):
    """torch ``nn.LSTM``/``nn.LSTMCell`` reset_parameters: every weight
    and bias ~ U(-1/sqrt(H), +1/sqrt(H)).

    NOT ``nn.initializers.uniform(scale)``: flax's uniform samples from
    **[0, scale)** — one-sided.  All-positive recurrent weights/biases
    fed by positive-mean (post-ReLU) CNN features drive every gate hard
    positive, the cell state accumulates monotonically, and the hidden
    output saturates at tanh ~= +0.93 for every input — the whole
    recognizer then trains to a constant (CTC blank collapse at loss ~=
    log(num_class)).  Found by the round-4 train-from-scratch demo;
    torch-import parity never sees self-init so the parity suite could
    not catch it.
    """
    k = 1.0 / float(hidden) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -k, k)

    return init
