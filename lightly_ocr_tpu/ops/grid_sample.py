"""Bilinear grid sampling with PyTorch ``F.grid_sample`` semantics.

The reference's TPS rectifier relies on ATen's CUDA ``grid_sample``
(``ocr/modules/TPS_STN.py:27``: ``padding_mode='border',
align_corners=True``) — the op that also blocked its ONNX export
(``ocr/torch2onnx.py:22``).  This is a pure-XLA rebuild: coordinate math on
the VPU and one batched gather, which XLA lowers to TPU-friendly dynamic
gathers.  It is jit/vmap/grad-compatible and is reused by the pipeline's
batched box-crop resampler.

Layout note: images here are NHWC (TPU-native), whereas torch is NCHW.
The grid is [B, Hg, Wg, 2] with (x, y) in [-1, 1], exactly torch's
convention.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    """[-1, 1] -> pixel coordinate, torch convention."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample(
    image: jax.Array,
    grid: jax.Array,
    padding_mode: str = "border",
    align_corners: bool = True,
    mode: str = "bilinear",
) -> jax.Array:
    """Sample ``image`` [B, H, W, C] at ``grid`` [B, Hg, Wg, 2] -> [B, Hg, Wg, C].

    padding_mode: 'border' (clamp) or 'zeros' (out-of-bounds reads 0).
    mode: 'bilinear' or 'nearest'.
    """
    if image.ndim != 4 or grid.ndim != 4 or grid.shape[-1] != 2:
        raise ValueError(
            f"expected image [B,H,W,C] and grid [B,Hg,Wg,2]; got "
            f"{image.shape} / {grid.shape}"
        )
    if padding_mode not in ("border", "zeros"):
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")

    B, H, W, C = image.shape
    x = _unnormalize(grid[..., 0].astype(jnp.float32), W, align_corners)
    y = _unnormalize(grid[..., 1].astype(jnp.float32), H, align_corners)

    if mode == "nearest":
        # torch rounds half away from... uses round-half-to-even via floor(x+0.5)
        ix = jnp.floor(x + 0.5).astype(jnp.int32)
        iy = jnp.floor(y + 0.5).astype(jnp.int32)
        if padding_mode == "zeros":
            valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        ix = jnp.clip(ix, 0, W - 1)
        iy = jnp.clip(iy, 0, H - 1)
        out = _gather2d(image, iy, ix)
        if padding_mode == "zeros":
            out = jnp.where(valid[..., None], out, 0.0)
        return out
    if mode != "bilinear":
        raise ValueError(f"unsupported mode {mode!r}")

    if padding_mode == "border":
        # torch clamps the *continuous* coordinate before interpolation.
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    def corner(iy, ix):
        v = _gather2d(
            image, jnp.clip(iy, 0, H - 1), jnp.clip(ix, 0, W - 1)
        )
        if padding_mode == "zeros":
            inside = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            v = jnp.where(inside[..., None], v, 0.0)
        return v

    v00 = corner(y0i, x0i)
    v01 = corner(y0i, x1i)
    v10 = corner(y1i, x0i)
    v11 = corner(y1i, x1i)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def _gather2d(image: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """Gather image[b, iy[b,...], ix[b,...], :] -> [B, ..., C]."""
    B = image.shape[0]
    batch_idx = jnp.arange(B).reshape((B,) + (1,) * (iy.ndim - 1))
    return image[batch_idx, iy, ix]


def grid_sample_matmul(
    image: jax.Array,
    grid: jax.Array,
    padding_mode: str = "border",
    align_corners: bool = True,
) -> jax.Array:
    """Bilinear grid sample as two dense contractions (no gathers).

    Bilinear interpolation is a 2-tap triangle kernel per axis, so
    sampling equals ``out[p] = sum_h wy[p,h] * (sum_w img[h,w] *
    wx[p,w])`` with dense weight matrices that are zero except for two
    entries per row.  On TPU this trades a slow HBM gather for MXU
    matmuls — a large win for small images (recognizer crops), the TPS
    rectifier's exact use case.  Exactly equals :func:`grid_sample`
    (bilinear, border or zeros padding).
    """
    B, H, W, C = image.shape
    _, Hg, Wg, _ = grid.shape
    P = Hg * Wg
    x = _unnormalize(grid[..., 0].astype(jnp.float32), W, align_corners)
    y = _unnormalize(grid[..., 1].astype(jnp.float32), H, align_corners)
    x = x.reshape(B, P)
    y = y.reshape(B, P)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")

    ux = jnp.arange(W, dtype=jnp.float32)
    uy = jnp.arange(H, dtype=jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - ux))  # [B, P, W]
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[..., None] - uy))  # [B, P, H]
    # zeros padding: out-of-bounds sample points contribute nothing;
    # the clipped-weight rows already vanish for |x-u| >= 1 outside.
    tmp = jnp.einsum(
        "bpw,bhwc->bphc", wx, image, preferred_element_type=jnp.float32
    )
    out = jnp.einsum(
        "bph,bphc->bpc", wy, tmp, preferred_element_type=jnp.float32
    )
    return out.reshape(B, Hg, Wg, C).astype(image.dtype)


def affine_grid(theta: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch.nn.functional.affine_grid (align_corners=False semantics).

    theta: [B, 2, 3] inverse-mapping matrices; returns [B, out_h, out_w, 2]
    grids in [-1, 1] for use with :func:`grid_sample`.
    """
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h * 2.0 - 1.0
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w * 2.0 - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)  # [H, W, 3]
    return jnp.einsum("hwk,bjk->bhwj", base, theta)


__all__ = ["grid_sample", "grid_sample_matmul", "affine_grid"]
