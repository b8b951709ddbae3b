"""Connected-component labeling as a Pallas TPU kernel.

The XLA formulation of :func:`lightly_ocr_tpu.ops.detection.
label_components` round-trips HBM between every doubling step (~160
elementwise passes over the label map).  A 512x384 int32 label map is
only ~0.8 MB — it fits in VMEM with room to spare — so this kernel loads
the foreground mask once, runs ALL segmented-scan rounds on-chip (VPU),
and writes the final labels once.  Grid = one program per image.

Directional scans are expressed with circular ``pltpu.roll`` + index
gating (no negative-stride reversals, which Mosaic does not lower).

Same semantics as the XLA version: 4-connectivity, labels = min linear
index per component, background = H*W.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2**30  # plain int: a jnp scalar would be a captured constant


def _scan_extreme(x, axis: int, size: int, backward: bool, op):
    """Running ``op`` (max/min) along ``axis``; forward = toward higher
    index, backward = toward lower.  Hillis-Steele doubling on rolls."""
    shift = 1
    while shift < size:
        if backward:
            rolled = pltpu.roll(x, size - shift, axis=axis)  # x[i+shift]
        else:
            rolled = pltpu.roll(x, shift, axis=axis)  # x[i-shift]
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
        ok = (idx < size - shift) if backward else (idx >= shift)
        x = jnp.where(ok, op(x, rolled), x)
        shift *= 2
    return x


def _segmented_min(values, seg, axis: int, size: int, backward: bool):
    """Min within segments along ``axis`` in the given direction."""
    shift = 1
    while shift < size:
        if backward:
            rolled_v = pltpu.roll(values, size - shift, axis=axis)
            rolled_s = pltpu.roll(seg, size - shift, axis=axis)
        else:
            rolled_v = pltpu.roll(values, shift, axis=axis)
            rolled_s = pltpu.roll(seg, shift, axis=axis)
        idx = jax.lax.broadcasted_iota(jnp.int32, values.shape, axis)
        ok = (idx < size - shift) if backward else (idx >= shift)
        ok = ok & (rolled_s == seg)
        values = jnp.where(ok, jnp.minimum(values, rolled_v), values)
        shift *= 2
    return values


def _cc_kernel(rounds: int, fg_ref, out_ref):
    _, H, W = fg_ref.shape
    fg = fg_ref[0] != 0
    bg = ~fg

    col_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    lin = row_idx * W + col_idx

    # Segment ids (position of the nearest background cell behind the
    # scan direction) are recomputed per use: keeping all four alive for
    # the whole unrolled kernel blows the VMEM stack budget.
    def scan_dir(labels, axis, size, backward):
        idx = col_idx if axis == 1 else row_idx
        if backward:
            seg = _scan_extreme(
                jnp.where(bg, idx, size), axis, size, True, jnp.minimum
            )
        else:
            seg = _scan_extreme(
                jnp.where(bg, idx, -1), axis, size, False, jnp.maximum
            )
        return _segmented_min(labels, seg, axis, size, backward)

    labels = jnp.where(fg, lin, _BIG)
    for _ in range(rounds):
        labels = scan_dir(labels, 1, W, False)
        labels = scan_dir(labels, 1, W, True)
        labels = scan_dir(labels, 0, H, False)
        labels = scan_dir(labels, 0, H, True)
        labels = jnp.where(fg, labels, _BIG)

    out_ref[0] = jnp.where(fg, labels, jnp.int32(H * W))


@functools.partial(jax.jit, static_argnames=("rounds", "interpret"))
def label_components_pallas(
    fg: jax.Array, rounds: int = 4, interpret: bool = False
) -> jax.Array:
    """[B, H, W] (or [H, W]) bool -> int32 labels (bg = H*W).

    ``rounds`` is a static propagation bound (one round crosses any
    monotone staircase; text blobs converge in 1-2).
    """
    if fg.ndim == 2:
        return label_components_pallas(fg[None], rounds, interpret)[0]
    B, H, W = fg.shape
    kernel = functools.partial(_cc_kernel, rounds)

    def run(chunk):
        b = chunk.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, H, W), jnp.int32),
            interpret=interpret,
        )(chunk)

    x = fg.astype(jnp.int32)
    # Chunk the batch: XLA stages the whole pallas operand in VMEM on
    # this toolchain, so cap the per-call footprint at ~3 MB in + out.
    per = max(1, min(B, (4 * 1024 * 1024) // (H * W * 4)))
    if B <= per:
        return run(x)
    if B % per:
        pad = per - (B % per)
        x = jnp.concatenate([x, jnp.zeros((pad, H, W), jnp.int32)], 0)
    out = jax.lax.map(run, x.reshape(-1, per, H, W))
    return out.reshape(-1, H, W)[:B]
