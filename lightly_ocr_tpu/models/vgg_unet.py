"""CRAFT text detector: VGG16-BN encoder + U-Net decoder (NHWC, flax).

Topology parity with ``ocr/model.py:9-61`` + ``ocr/modules/vgg_bn.py``:

* The encoder is torchvision's VGG16-BN `features` sliced at indices
  12/19/29/39 — each slice therefore ENDS on a BatchNorm; the ReLU that
  torch would apply next lives at the START of the following slice, and
  conv5_3 + the final pool are dropped entirely.  slice5 is maxpool(3,s1,
  p1) + dilated 3x3 conv (rate 6, 512->1024) + 1x1 conv (1024->1024).
* Decoder: cat(fc7, bn5_2-out) -> UpConv(1024,512,256), then three
  bilinear-upsample+concat+UpConv stages down to 32 channels, then the
  5-conv classification head emitting 2 maps (region score, affinity
  score) at input/2 resolution.

Output: ([B, H/2, W/2, 2] score maps, [B, H/2, W/2, 32] feature) — NHWC
already, so no final permute is needed (the torch code permutes NCHW ->
NHWC at ``model.py:61``).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightly_ocr_tpu.models.layers import batch_norm, conv, max_pool

Dtype = Any

# VGG16-BN feature slices as explicit op sequences using torchvision layer
# indices for conv/bn names ("C", idx, channels | "P" pool | "R" relu).
#
# SUBTLE PARITY POINT: the reference slices the torchvision Sequential so
# each slice ends on a BatchNorm (``vgg_bn.py:44-51``), and the *next*
# slice begins with ``ReLU(inplace=True)``.  Because those ReLUs are
# in-place, they MUTATE the tensors the reference saved as slice outputs —
# so by the time the U-Net decoder reads them, slice1/2/3 outputs are
# effectively POST-ReLU, while slice4's output stays pre-ReLU (slice5
# starts with a MaxPool, no in-place op touches it).  The op lists below
# encode that *effective* dataflow: trailing R on slices 1-3, none on
# slice4.
_VGG_SLICES = {
    "slice1": [  # features[0:12] (+ the mutating relu at index 12)
        ("C", 0, 64), ("R",), ("C", 3, 64), ("R",), ("P",),
        ("C", 7, 128), ("R",), ("C", 10, 128), ("R",),
    ],
    "slice2": [  # features[13:19] (+ relu at 19)
        ("P",), ("C", 14, 256), ("R",), ("C", 17, 256), ("R",),
    ],
    "slice3": [  # features[20:29] (+ relu at 29)
        ("C", 20, 256), ("R",), ("P",),
        ("C", 24, 512), ("R",), ("C", 27, 512), ("R",),
    ],
    "slice4": [  # features[30:39] — ends pre-ReLU (bn5_2)
        ("C", 30, 512), ("R",), ("P",),
        ("C", 34, 512), ("R",), ("C", 37, 512),
    ],
}


class _VggSlice(nn.Module):
    ops: tuple
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for op in self.ops:
            if op[0] == "R":
                x = nn.relu(x)
            elif op[0] == "P":
                x = max_pool(x, (2, 2), (2, 2))
            else:
                _, idx, ch = op
                x = conv(
                    ch, use_bias=True, name=str(idx), dtype=self.dtype,
                    quant=self.quant,
                )(x)
                x = batch_norm(train, str(idx + 1), self.dtype)(x)
        return x


class VggBackbone(nn.Module):
    """VGG16-BN sliced per the reference (``vgg_bn.py:34-82``)."""

    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        outs = {}
        for name in ("slice1", "slice2", "slice3", "slice4"):
            x = _VggSlice(
                tuple(_VGG_SLICES[name]), self.dtype, self.quant, name=name
            )(x, train)
            outs[name] = x
        outs["fc7"] = _Slice5(self.dtype, self.quant, name="slice5")(x)
        return outs


# slice1 split around conv1_2 (torch idx 3) for the fused Pallas stem:
# prefix = conv0+BN+ReLU (runs in XLA), the Pallas kernel covers
# conv3+BN+ReLU, and the post ops resume from the pool.
_SLICE1_PREFIX = (("C", 0, 64), ("R",))
_SLICE1_POST = (("P",), ("C", 7, 128), ("R",), ("C", 10, 128), ("R",))
# resume AFTER the pool (the fused conv1_2+pool kernel already pooled)
_SLICE1_FROMPOOL = (("C", 7, 128), ("R",), ("C", 10, 128), ("R",))
# resume AFTER conv2_1 (the fused conv1_2+pool+conv2_1 kernel)
_SLICE1_FROMC21 = (("C", 10, 128), ("R",))


class VggStemPrefix(nn.Module):
    """conv1_1 + BN + ReLU only (``basenet/slice1/{0,1}`` params) — the
    XLA-side prefix feeding :func:`~lightly_ocr_tpu.ops.pallas_stem.
    fused_stem_conv`.  Shares the full model's variable tree."""

    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        class _B(nn.Module):
            dtype: Dtype
            quant: bool

            @nn.compact
            def __call__(self, x, train):
                return _VggSlice(
                    _SLICE1_PREFIX, self.dtype, self.quant, name="slice1"
                )(x, train)

        return _B(self.dtype, self.quant, name="basenet")(x, train)


class _ResumeBasenet(nn.Module):
    """Backbone resuming mid-slice1 from a fused-kernel activation:
    ``slice1_ops`` is the remaining slice1 tail, then slices 2-5.
    Param names coincide with :class:`VggBackbone` so one variable tree
    serves both (flax ignores the prefix params this module never
    reads).  The three resume points:

    * ``_SLICE1_POST``     — after fused conv1_2 (``fused_stem_conv``)
    * ``_SLICE1_FROMPOOL`` — after fused conv1_2+pool
      (``fused_conv12_pool``)
    * ``_SLICE1_FROMC21``  — after fused conv1_2+pool+conv2_1
      (``fused_conv12_pool_conv21``)
    """

    dtype: Dtype = jnp.float32
    quant: bool = False
    slice1_ops: tuple = ()

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        outs = {}
        x = _VggSlice(self.slice1_ops, self.dtype, self.quant,
                      name="slice1")(x, train)
        outs["slice1"] = x
        for name in ("slice2", "slice3", "slice4"):
            x = _VggSlice(
                tuple(_VGG_SLICES[name]), self.dtype, self.quant, name=name
            )(x, train)
            outs[name] = x
        outs["fc7"] = _Slice5(self.dtype, self.quant, name="slice5")(x)
        return outs


class _Slice5(nn.Module):
    """fc6/fc7 head: maxpool(3,s1,p1) + dilated 3x3 conv (rate 6,
    512->1024) + 1x1 conv (``vgg_bn.py:54-55``); children named 1/2 to
    mirror the torch Sequential (0 is the pool)."""

    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from lightly_ocr_tpu.models.layers import QuantConv

        x = max_pool(x, (3, 3), (1, 1), ((1, 1), (1, 1)))
        if self.quant:
            x = QuantConv(
                1024,
                (3, 3),
                padding=((6, 6), (6, 6)),
                dilation=(6, 6),
                dtype=self.dtype,
                name="1",
            )(x)
            return QuantConv(
                1024, (1, 1), padding="VALID", dtype=self.dtype, name="2"
            )(x)
        x = nn.Conv(
            1024,
            (3, 3),
            padding=((6, 6), (6, 6)),
            kernel_dilation=(6, 6),
            dtype=self.dtype,
            name="1",
        )(x)
        return nn.Conv(1024, (1, 1), padding="VALID", dtype=self.dtype, name="2")(x)


class UpConv(nn.Module):
    """U-Net decoder block (``vgg_bn.py:23-31``): 1x1 conv-BN-ReLU then
    3x3 conv-BN-ReLU."""

    mid: int
    out: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        class _Seq(nn.Module):
            mid: int
            out: int
            dtype: Dtype
            quant: bool

            @nn.compact
            def __call__(self, x, train):
                x = conv(
                    self.mid, (1, 1), padding="VALID", name="0",
                    dtype=self.dtype, quant=self.quant,
                )(x)
                x = nn.relu(batch_norm(train, "1", self.dtype)(x))
                x = conv(
                    self.out, (3, 3), name="3", dtype=self.dtype,
                    quant=self.quant,
                )(x)
                x = nn.relu(batch_norm(train, "4", self.dtype)(x))
                return x

        return _Seq(self.mid, self.out, self.dtype, self.quant, name="conv")(
            x, train
        )


class _Split1x1(nn.Module):
    """The 1x1 of an :class:`UpConv`, applied ACROSS the concat seam:

        conv1x1(concat([up(y), t])) == up(conv1x1_a(y)) + conv1x1_b(t)

    (both maps are linear).  Parameter tree identical to the joint conv
    (one ``kernel [1, 1, cy+ct, mid]`` + ``bias``), split at apply
    time, so the same variable tree serves :class:`UpConv` and
    :class:`UpConvSeam`.  The y-half contracts at y's native (lower)
    resolution; when the resolutions already match (upconv1) no
    upsample is inserted.

    Quant mode mirrors :class:`~lightly_ocr_tpu.models.layers.QuantConv`
    (same int8 gate on the JOINT channel counts, same per-out-channel
    weight scale computed from the joint kernel); each half's
    activations quantize independently per-sample — a finer grouping
    than the joint concat's single amax, covered by the int8 parity
    gates."""

    cy: int
    mid: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, y: jax.Array, t: jax.Array) -> jax.Array:
        cin = self.cy + t.shape[-1]
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, cin, self.mid),
            jnp.float32,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.mid,), jnp.float32
        )
        kf = k[0, 0]
        ka, kb = kf[: self.cy], kf[self.cy :]

        if self.quant and min(cin, self.mid) >= 128:
            sw = (
                jnp.maximum(jnp.max(jnp.abs(kf), axis=0), 1e-12) / 127.0
            )  # [mid] — joint per-out-channel scale (QuantConv parity)

            def qdot(x, kk):
                xf = x.astype(jnp.float32)
                sx = (
                    jnp.maximum(
                        jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True),
                        1e-12,
                    )
                    / 127.0
                )
                xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
                kq = jnp.clip(jnp.round(kk / sw), -127, 127).astype(jnp.int8)
                o = jax.lax.dot_general(
                    xq, kq,
                    (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return o.astype(jnp.float32) * (sx * sw)

            a, bb = qdot(y, ka), qdot(t, kb)
        else:

            def fdot(x, kk):
                return jax.lax.dot_general(
                    x.astype(self.dtype), kk.astype(self.dtype),
                    (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            a, bb = fdot(y, ka), fdot(t, kb)

        if y.shape[1:3] != t.shape[1:3]:
            a = _upsample_to(a, t.shape[1], t.shape[2])
        return (a + bb + b).astype(self.dtype)


class UpConvSeam(nn.Module):
    """Seam-split U-Net decoder block: same parameter tree as
    :class:`UpConv` (``conv/{0,1,3,4}``) but consumes the PRE-concat
    (y, skip) pair — the concat buffer never materializes and the
    1x1's y-half runs at y's resolution (see :class:`_Split1x1`).
    Serving-path counterpart of ``vgg_bn.py:23-31``; used by
    :class:`VGG_UNetTrunk` with ``seam=True``."""

    cy: int
    mid: int
    out: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(
        self, y: jax.Array, t: jax.Array, train: bool = False
    ) -> jax.Array:
        class _Seq(nn.Module):
            cy: int
            mid: int
            out: int
            dtype: Dtype
            quant: bool

            @nn.compact
            def __call__(self, y, t, train):
                x = _Split1x1(
                    self.cy, self.mid, self.dtype, self.quant, name="0"
                )(y, t)
                x = nn.relu(batch_norm(train, "1", self.dtype)(x))
                x = conv(
                    self.out, (3, 3), name="3", dtype=self.dtype,
                    quant=self.quant,
                )(x)
                x = nn.relu(batch_norm(train, "4", self.dtype)(x))
                return x

        return _Seq(self.cy, self.mid, self.out, self.dtype, self.quant,
                    name="conv")(y, t, train)


def _upsample_to(x: jax.Array, h: int, w: int) -> jax.Array:
    """Bilinear upsample (torch interpolate align_corners=False ==
    half-pixel-center resize)."""
    return jax.image.resize(
        x, (x.shape[0], h, w, x.shape[3]), method="bilinear", antialias=False
    )


class VGG_UNet(nn.Module):
    """CRAFT detector graph (``ocr/model.py:9-61``).

    ``quant=True`` runs every backbone/decoder conv as a w8a8
    :class:`~lightly_ocr_tpu.models.layers.QuantConv` on the int8 MXU;
    the 5-conv classification head stays in ``dtype`` (small channels,
    and the score maps feed threshold comparisons directly).
    """

    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        if self.quant and train:
            raise ValueError(
                "quant=True is an inference-only mode: QuantConv's "
                "jnp.round has zero gradient, so training would silently "
                "freeze every backbone conv.  Train in float and enable "
                "quant_int8 only for serving."
            )
        s = VggBackbone(self.dtype, self.quant, name="basenet")(x, train)

        y = jnp.concatenate([s["fc7"], s["slice4"]], axis=-1)  # H/16
        y = UpConv(512, 256, self.dtype, self.quant, name="upconv1")(y, train)

        t = s["slice3"]  # H/8
        y = _upsample_to(y, t.shape[1], t.shape[2])
        y = jnp.concatenate([y, t], axis=-1)
        y = UpConv(256, 128, self.dtype, self.quant, name="upconv2")(y, train)

        t = s["slice2"]  # H/4
        y = _upsample_to(y, t.shape[1], t.shape[2])
        y = jnp.concatenate([y, t], axis=-1)
        y = UpConv(128, 64, self.dtype, self.quant, name="upconv3")(y, train)

        t = s["slice1"]  # H/2
        y = _upsample_to(y, t.shape[1], t.shape[2])
        y = jnp.concatenate([y, t], axis=-1)
        feature = UpConv(64, 32, self.dtype, self.quant, name="upconv4")(y, train)

        class _Head(nn.Module):
            dtype: Dtype

            @nn.compact
            def __call__(self, x):
                x = nn.relu(conv(32, (3, 3), name="0", dtype=self.dtype)(x))
                x = nn.relu(conv(32, (3, 3), name="2", dtype=self.dtype)(x))
                x = nn.relu(conv(16, (3, 3), name="4", dtype=self.dtype)(x))
                x = nn.relu(
                    conv(16, (1, 1), padding="VALID", name="6", dtype=self.dtype)(x)
                )
                return conv(2, (1, 1), padding="VALID", name="8", dtype=self.dtype)(x)

        y = _Head(self.dtype, name="conv_cls")(feature)
        return y, feature  # NHWC score maps [B, H/2, W/2, 2]


class VGG_UNetTrunk(nn.Module):
    """VGG_UNet cut just before the tail: returns the H/2-resolution
    concat (upsampled upconv3 output + slice1, 192 channels) that feeds
    upconv4.  Same explicitly-named submodules as :class:`VGG_UNet`, so
    the full model's variable tree applies verbatim (upconv4/conv_cls
    params are simply not read).  Pairs with
    :func:`lightly_ocr_tpu.ops.pallas_tail.fused_tail_scores` on TPU.

    With ``from_stem=True`` the input is the fused Pallas conv1_2
    activation (``[B, H, W, 64]``, see :mod:`~lightly_ocr_tpu.ops.
    pallas_stem`) instead of the canvas, and the backbone resumes from
    the slice1 pool.  With ``from_pool=True`` the input is the fused
    conv1_2+POOL activation (``[B, H/2, W/2, 64]``,
    :func:`~lightly_ocr_tpu.ops.pallas_stem.fused_conv12_pool`) and the
    backbone resumes at conv2_1.

    With ``seam=True`` the final upsample+concat is SKIPPED and the
    pre-seam pair ``(upconv3_out [B, H/4, W/4, 64], slice1 [B, H/2,
    W/2, 128])`` is returned for
    :func:`~lightly_ocr_tpu.ops.pallas_tail.fused_tail_scores_cs_seam`,
    which folds the seam into upconv4's (linear) 1x1 — the 192-channel
    H/2 concat is 943 MB bf16 at b16 960x640 and never needs to exist.
    """

    dtype: Dtype = jnp.float32
    quant: bool = False
    from_stem: bool = False
    from_pool: bool = False
    from_c21: bool = False
    seam: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.quant and train:
            raise ValueError(
                "quant=True is an inference-only mode (zero-gradient "
                "rounding); train in float."
            )
        import functools

        if self.from_c21:
            bb = functools.partial(_ResumeBasenet, slice1_ops=_SLICE1_FROMC21)
        elif self.from_pool:
            bb = functools.partial(
                _ResumeBasenet, slice1_ops=_SLICE1_FROMPOOL
            )
        elif self.from_stem:
            bb = functools.partial(_ResumeBasenet, slice1_ops=_SLICE1_POST)
        else:
            bb = VggBackbone
        s = bb(self.dtype, self.quant, name="basenet")(x, train)

        if self.seam:
            # seam-split decoder: every upsample+concat folds into its
            # UpConv's linear 1x1 (see _Split1x1) — no concat buffer
            # ever materializes, and each 1x1's y-half contracts at the
            # LOWER resolution.  Same variable tree as the concat form.
            y = UpConvSeam(1024, 512, 256, self.dtype, self.quant,
                           name="upconv1")(s["fc7"], s["slice4"], train)
            y = UpConvSeam(256, 256, 128, self.dtype, self.quant,
                           name="upconv2")(y, s["slice3"], train)
            y = UpConvSeam(128, 128, 64, self.dtype, self.quant,
                           name="upconv3")(y, s["slice2"], train)
            return y, s["slice1"]  # pair for fused_tail_scores_cs_seam

        y = jnp.concatenate([s["fc7"], s["slice4"]], axis=-1)  # H/16
        y = UpConv(512, 256, self.dtype, self.quant, name="upconv1")(y, train)

        t = s["slice3"]  # H/8
        y = _upsample_to(y, t.shape[1], t.shape[2])
        y = jnp.concatenate([y, t], axis=-1)
        y = UpConv(256, 128, self.dtype, self.quant, name="upconv2")(y, train)

        t = s["slice2"]  # H/4
        y = _upsample_to(y, t.shape[1], t.shape[2])
        y = jnp.concatenate([y, t], axis=-1)
        y = UpConv(128, 64, self.dtype, self.quant, name="upconv3")(y, train)

        t = s["slice1"]  # H/2
        y = _upsample_to(y, t.shape[1], t.shape[2])
        return jnp.concatenate([y, t], axis=-1)  # [B, H/2, W/2, 192]
