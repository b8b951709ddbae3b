"""Batched on-device ROI crop + resize (the recognizer feed).

The reference slices each detected rect out of the original image on the
host and pushes it through PIL resize one crop at a time (``net.py:
108-111`` + ``pipeline.py:74-77`` + ``dataset.py:37-47``) — the per-crop
Python loop SURVEY §3.1 flags as a hot path.  Here a whole batch of rects
becomes ONE gather program: each output pixel maps to source coordinates
inside its rect and is sampled bilinearly, with SxS supersampling to
approximate PIL's antialiased (area-averaging) downscale.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lightly_ocr_tpu.ops.grid_sample import grid_sample


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "supersample"))
def crop_resize_batch(
    image: jax.Array,  # [H, W] single-channel (grayscale) source
    rects: jax.Array,  # [K, 4] int/float (row0, col0, row1, col1)
    out_h: int = 32,
    out_w: int = 100,
    supersample: int = 2,
) -> jax.Array:
    """-> [K, out_h, out_w] crops resized with half-pixel-center sampling.

    Matches PIL's coordinate convention (src = (dst+0.5)*scale - 0.5); the
    supersample grid approximates PIL's scaled-kernel antialiasing, which
    matters for strong downscales of large detected words.
    """
    H, W = image.shape
    K = rects.shape[0]
    rects = rects.astype(jnp.float32)
    y0, x0, y1, x1 = rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3]
    ch = jnp.maximum(y1 - y0, 1.0)  # crop extent
    cw = jnp.maximum(x1 - x0, 1.0)

    s = supersample
    # subpixel sample positions inside each output pixel, in output units
    sub = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s  # (0, 1)
    oy = jnp.arange(out_h, dtype=jnp.float32)[:, None] + sub[None, :]  # [oh, s]
    ox = jnp.arange(out_w, dtype=jnp.float32)[:, None] + sub[None, :]

    # map to source pixel coords per rect: src = y0 + t*ch/out_h - 0.5
    sy = y0[:, None, None] + oy[None] * (ch[:, None, None] / out_h) - 0.5
    sx = x0[:, None, None] + ox[None] * (cw[:, None, None] / out_w) - 0.5
    # [K, oh, s] and [K, ow, s] -> full grid [K, oh*s, ow*s]
    sy = sy.reshape(K, out_h * s, 1)
    sx = sx.reshape(K, 1, out_w * s)
    gy = jnp.broadcast_to(sy, (K, out_h * s, out_w * s))
    gx = jnp.broadcast_to(sx, (K, out_h * s, out_w * s))

    # normalize to [-1, 1] for grid_sample (align_corners=True mapping)
    gxn = gx / jnp.maximum(W - 1.0, 1.0) * 2.0 - 1.0
    gyn = gy / jnp.maximum(H - 1.0, 1.0) * 2.0 - 1.0
    grid = jnp.stack([gxn, gyn], axis=-1)

    src = jnp.broadcast_to(image[None, :, :, None], (K, H, W, 1))
    out = grid_sample(src, grid, padding_mode="border", align_corners=True)
    # average the SxS subsamples (box-filter antialias)
    out = out.reshape(K, out_h, s, out_w, s)
    return out.mean(axis=(2, 4))


def _interp_weights(
    starts: jax.Array,  # [K] crop start (pixels)
    extents: jax.Array,  # [K] crop extent (pixels)
    src_size: int,
    out_size: int,
    kernel: str = "triangle",
) -> jax.Array:
    """[K, src_size, out_size] separable resampling weights.

    PIL-style scaled kernels: each output pixel j samples around
    ``start + (j+0.5)*scale - 0.5`` with support widened by the scale on
    downscales (antialiasing).  'triangle' == PIL BILINEAR; 'cubic' ==
    PIL BICUBIC (Keys a=-0.5).
    """
    scale = extents / out_size  # [K]
    s = jnp.maximum(scale, 1.0)[:, None, None]  # filter scale
    centers = (
        starts[:, None, None]
        + (jnp.arange(out_size, dtype=jnp.float32)[None, None, :] + 0.5)
        * scale[:, None, None]
        - 0.5
    )  # [K, 1, out]
    u = jnp.arange(src_size, dtype=jnp.float32)[None, :, None]  # [1, src, 1]
    t = (u - centers) / s  # [K, src, out]
    if kernel == "triangle":
        w = jnp.maximum(0.0, 1.0 - jnp.abs(t))
    elif kernel == "cubic":
        a = -0.5
        at = jnp.abs(t)
        w = jnp.where(
            at <= 1.0,
            (a + 2.0) * at**3 - (a + 3.0) * at**2 + 1.0,
            jnp.where(
                at < 2.0,
                a * at**3 - 5.0 * a * at**2 + 8.0 * a * at - 4.0 * a,
                0.0,
            ),
        )
    else:
        raise ValueError(f"unknown kernel {kernel!r}")
    # crop-boundary semantics: PIL resizes the *cropped* array, so taps
    # outside [start, start+extent) must not bleed in; zero + renormalize
    inside = (u >= starts[:, None, None]) & (
        u <= starts[:, None, None] + extents[:, None, None] - 1.0 + 1e-6
    )
    w = jnp.where(inside, w, 0.0)
    return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-8)


@functools.partial(
    jax.jit, static_argnames=("out_h", "out_w", "kernel")
)
def crop_resize_matmul(
    image: jax.Array,  # [H, W] grayscale source
    rects: jax.Array,  # [K, 4] (row0, col0, row1, col1)
    out_h: int = 32,
    out_w: int = 100,
    kernel: str = "triangle",
) -> jax.Array:
    """Crop+resize as two MXU matmuls per crop (no gathers).

    Separable resampling: ``out = Ry^T @ image @ Cx`` with per-crop
    interpolation matrices.  Exact PIL-convention antialiased kernels,
    and the whole batch is two matmul ops — the speed-of-light
    formulation for TPU where gathers are slow.
    """
    H, W = image.shape
    K = rects.shape[0]
    rects = rects.astype(jnp.float32)
    y0, x0, y1, x1 = rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3]
    Ry = _interp_weights(y0, jnp.maximum(y1 - y0, 1.0), H, out_h, kernel)
    Cx = _interp_weights(x0, jnp.maximum(x1 - x0, 1.0), W, out_w, kernel)
    # [K*out_h, H] @ [H, W] -> [K, out_h, W]  (one big MXU matmul)
    tmp = (
        jnp.swapaxes(Ry, 1, 2).reshape(K * out_h, H) @ image
    ).reshape(K, out_h, W)
    # batched [out_h, W] @ [W, out_w]
    return jnp.einsum(
        "kow,kwj->koj", tmp, Cx, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "supersample"))
def crop_resize_normalize_batch(
    image: jax.Array,
    rects: jax.Array,
    out_h: int = 32,
    out_w: int = 100,
    supersample: int = 2,
) -> jax.Array:
    """Crop + resize + the recognizer normalization ((x/255 - .5)/.5),
    emitting [K, out_h, out_w, 1] ready for CRNNet."""
    crops = crop_resize_batch(image, rects, out_h, out_w, supersample)
    crops = jnp.clip(crops, 0.0, 255.0)
    return ((crops / 255.0 - 0.5) / 0.5)[..., None]


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "kernel"))
def crop_resize_normalize_matmul(
    image: jax.Array,
    rects: jax.Array,
    out_h: int = 32,
    out_w: int = 100,
    kernel: str = "triangle",
) -> jax.Array:
    """Matmul crop + PIL-saturation + (x/255-.5)/.5 -> [K, h, w, 1]."""
    crops = crop_resize_matmul(image, rects, out_h, out_w, kernel)
    crops = jnp.clip(crops, 0.0, 255.0)
    return ((crops / 255.0 - 0.5) / 0.5)[..., None]


__all__ = [
    "crop_resize_batch",
    "crop_resize_normalize_batch",
    "crop_resize_matmul",
    "crop_resize_normalize_matmul",
]
