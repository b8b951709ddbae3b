"""Batched on-device image preprocessing (jnp / jax.image).

Rebuilds the reference's host-side cv2/PIL glue as jittable device ops:

* ``normalize_mean_variance`` / ``denormalize_mean_variance`` — ImageNet
  mean/var x255 normalization (``ocr/tools/imgproc.py:19-35``).
* ``plan_aspect_resize`` + ``make_detector_input`` — the
  ``resizeAspectRatio`` semantics (``imgproc.py:38-65``): scale by
  ``mag_ratio`` capped at ``square_size``, paste top-left onto a canvas
  padded to a multiple of 32.  On TPU the canvas is a *static bucket* so
  one XLA program serves all input sizes (the reference's
  variable-multiple-of-32 canvases would trigger a recompile per shape).
* ``resize_normalize`` — the recognizer's PIL-bicubic resize to (W=100,
  H=32) followed by ``(x-0.5)/0.5`` (``ocr/tools/dataset.py:37-47``).
* ``rgb_to_gray`` — ITU-R 601-2 luma, matching ``PIL.Image.convert('L')``
  and ``cv2.cvtColor`` coefficients.

All functions take NHWC float arrays and are shape-polymorphic only in the
batch dimension.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet statistics, premultiplied by 255 (imgproc.py:19-25).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_VAR = (0.229, 0.224, 0.225)

# PIL convert('L') coefficients (ITU-R 601-2).
_LUMA = (299.0 / 1000.0, 587.0 / 1000.0, 114.0 / 1000.0)


def normalize_mean_variance(img: jax.Array) -> jax.Array:
    """[..., 3] uint8-range RGB -> normalized float32."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32) * 255.0
    var = jnp.asarray(IMAGENET_VAR, dtype=jnp.float32) * 255.0
    return (img.astype(jnp.float32) - mean) / var


def denormalize_mean_variance(img: jax.Array) -> jax.Array:
    """Inverse of :func:`normalize_mean_variance`, clipped to [0, 255]."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    var = jnp.asarray(IMAGENET_VAR, dtype=jnp.float32)
    out = (img * var + mean) * 255.0
    return jnp.clip(out, 0.0, 255.0)


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """[..., 3] RGB -> [...] single-channel luma (PIL 'L' semantics)."""
    w = jnp.asarray(_LUMA, dtype=jnp.float32)
    return jnp.tensordot(img.astype(jnp.float32), w, axes=([-1], [0]))


class ResizePlan(NamedTuple):
    """Host-side plan mirroring resizeAspectRatio's bookkeeping."""

    target_h: int  # image content size after aspect-preserving resize
    target_w: int
    canvas_h: int  # padded canvas (multiple of 32; static bucket on TPU)
    canvas_w: int
    ratio: float  # content / original scale factor
    heatmap_h: int  # detector score-map size (canvas / 2)
    heatmap_w: int


def plan_aspect_resize(
    height: int,
    width: int,
    square_size: int = 1280,
    mag_ratio: float = 1.5,
    canvas_bucket: tuple[int, int] | None = None,
) -> ResizePlan:
    """Compute the resize/pad geometry of ``resizeAspectRatio``.

    With ``canvas_bucket=None`` this reproduces the reference exactly:
    canvas = content rounded up to a multiple of 32.  Passing a static
    ``(H, W)`` bucket pins the canvas for XLA shape reuse; the content is
    still sized by the reference rule (and additionally capped to the
    bucket so it always fits).
    """
    target_size = min(mag_ratio * max(height, width), float(square_size))
    ratio = target_size / max(height, width)
    target_h, target_w = int(height * ratio), int(width * ratio)

    if canvas_bucket is None:
        canvas_h = target_h if target_h % 32 == 0 else target_h + (32 - target_h % 32)
        canvas_w = target_w if target_w % 32 == 0 else target_w + (32 - target_w % 32)
    else:
        canvas_h, canvas_w = canvas_bucket
        if target_h > canvas_h or target_w > canvas_w:
            shrink = min(canvas_h / target_h, canvas_w / target_w)
            ratio *= shrink
            target_h, target_w = int(height * ratio), int(width * ratio)

    return ResizePlan(
        target_h=target_h,
        target_w=target_w,
        canvas_h=canvas_h,
        canvas_w=canvas_w,
        ratio=ratio,
        heatmap_h=canvas_h // 2,
        heatmap_w=canvas_w // 2,
    )


def pick_canvas_bucket(
    height: int,
    width: int,
    square_size: int = 1280,
    mag_ratio: float = 1.5,
    granularity: int = 256,
) -> tuple[int, int]:
    """Quantize the reference canvas up to a coarse bucket so distinct
    input sizes share XLA programs (recompile storms are the TPU tax of
    the reference's per-size canvases)."""
    plan = plan_aspect_resize(height, width, square_size, mag_ratio)
    rh = int(math.ceil(plan.canvas_h / granularity) * granularity)
    rw = int(math.ceil(plan.canvas_w / granularity) * granularity)
    return (min(rh, _ceil32(square_size)), min(rw, _ceil32(square_size)))


def _ceil32(x: int) -> int:
    return int(math.ceil(x / 32) * 32)


def pick_gray_bucket(
    height: int, width: int, granularity: int = 256
) -> tuple[int, int]:
    """Quantize an ORIGINAL-resolution extent up to a coarse bucket.

    The serving program takes the full-res gray image as an input (the
    recognizer crops straight from it, like the reference crops from
    the original — ``ocr/net.py:108-111``), so its [B, H0, W0] shape is
    part of the compiled program.  Zero-padding every upload to a
    granularity-multiple bucket bounds the number of compiled programs
    under arbitrary-size traffic; true extents ride alongside as data
    (``BatchedOCR.__call__(extents=...)``), so box clipping is exact.
    """
    return (
        int(math.ceil(max(height, 1) / granularity) * granularity),
        int(math.ceil(max(width, 1) / granularity) * granularity),
    )


def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """cv2.INTER_LINEAR-compatible resize (half-pixel centers, no
    antialiasing) for [H, W, C] or [B, H, W, C]."""
    shape = (*img.shape[:-3], out_h, out_w, img.shape[-1])
    return jax.image.resize(
        img.astype(jnp.float32), shape, method="bilinear", antialias=False
    )


def make_detector_input(
    img: jax.Array, plan: ResizePlan
) -> tuple[jax.Array, jax.Array]:
    """[H, W, 3] RGB -> ([canvas_h, canvas_w, 3] normalized canvas,
    [2] valid content size).

    The content is resized to (target_h, target_w), pasted at the top-left
    of a zero canvas, and normalized — the exact resizeAspectRatio +
    normalizeMeanVariance composition (``net.py:74-79``).
    """
    content = resize_bilinear(img, plan.target_h, plan.target_w)
    canvas = jnp.zeros((plan.canvas_h, plan.canvas_w, 3), dtype=jnp.float32)
    canvas = jax.lax.dynamic_update_slice(canvas, content, (0, 0, 0))
    return normalize_mean_variance(canvas), jnp.asarray(
        [plan.target_h, plan.target_w], dtype=jnp.int32
    )


def resize_normalize(
    crops: jax.Array, height: int = 32, width: int = 100
) -> jax.Array:
    """[B, H, W] or [B, H, W, 1] grayscale crops -> [B, height, width, 1]
    in [-1, 1].

    PIL-bicubic-with-antialias resize (``dataset.py:43-47`` uses
    ``Image.BICUBIC``, which in PIL always applies the scaled kernel) then
    ``(x/255 - 0.5) / 0.5``.
    """
    if crops.ndim == 3:
        crops = crops[..., None]
    out = jax.image.resize(
        crops.astype(jnp.float32),
        (crops.shape[0], height, width, crops.shape[-1]),
        method="bicubic",
        antialias=True,
    )
    # PIL saturates to uint8 after resampling; clamp bicubic overshoot the
    # same way so outputs stay in [-1, 1].
    out = jnp.clip(out, 0.0, 255.0)
    return (out / 255.0 - 0.5) / 0.5


def adjust_box_coordinates(
    boxes: jax.Array, ratio_w: float, ratio_h: float, ratio_net: float = 2.0
) -> jax.Array:
    """Scale heatmap-space box corners back to original-image space
    (``det_utils.py:259-265``; x2 is the detector's half-resolution)."""
    scale = jnp.asarray([ratio_w * ratio_net, ratio_h * ratio_net], jnp.float32)
    return boxes * scale


__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_VAR",
    "normalize_mean_variance",
    "denormalize_mean_variance",
    "rgb_to_gray",
    "ResizePlan",
    "plan_aspect_resize",
    "pick_canvas_bucket",
    "pick_gray_bucket",
    "resize_bilinear",
    "make_detector_input",
    "resize_normalize",
    "adjust_box_coordinates",
]
