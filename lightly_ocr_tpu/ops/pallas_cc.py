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


def _cc_kernel(rounds: int, fg_ref, out_ref, lab_ref, seg_ref):
    """Scratch-ref formulation: every doubling step writes back through
    VMEM scratch so Mosaic reuses two map-sized buffers instead of
    stacking the whole unrolled expression chain (which blew the 16 MB
    scoped-VMEM budget)."""
    _, H, W = fg_ref.shape

    col_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)

    def bg():
        return fg_ref[0] == 0

    lab_ref[:] = jnp.where(bg(), _BIG, row_idx * W + col_idx)

    def scan_dir(axis: int, size: int, backward: bool):
        """Directional segmented min in ONE Hillis-Steele doubling
        phase: carry (closed, value) pairs with the standard segmented
        operator — ``x_i ⊕ x_{i-s} = (closed_i | closed_{i-s},
        closed_i ? v_i : min(v_i, v_{i-s}))`` — instead of a
        segment-id phase followed by a value phase.  The paired form is
        2 rolls + 1 min per step vs the two-phase form's 3 rolls +
        2 compares: measured ~?x on the whole CC stage (BENCH.md).
        ``closed`` starts as the background mask (bg pixels are the
        segment boundaries; their label is already _BIG so absorbing
        them into a min is harmless — the flag is what STOPS
        propagation across them)."""
        idx = col_idx if axis == 1 else row_idx
        seg_ref[:] = jnp.where(bg(), 1, 0)  # closed flag
        shift = 1
        while shift < size:
            amt = size - shift if backward else shift
            ok = (idx < size - shift) if backward else (idx >= shift)
            v_r = pltpu.roll(lab_ref[:], amt, axis=axis)
            f_r = pltpu.roll(seg_ref[:], amt, axis=axis)
            open_ = ok & (seg_ref[:] == 0)
            lab_ref[:] = jnp.where(
                open_, jnp.minimum(lab_ref[:], v_r), lab_ref[:]
            )
            seg_ref[:] = jnp.where(open_ & (f_r == 1), 1, seg_ref[:])
            shift *= 2

    for _ in range(rounds):
        scan_dir(1, W, False)
        scan_dir(1, W, True)
        scan_dir(0, H, False)
        scan_dir(0, H, True)
        lab_ref[:] = jnp.where(bg(), _BIG, lab_ref[:])

    out_ref[0] = jnp.where(bg(), jnp.int32(H * W), lab_ref[:])


@functools.partial(jax.jit, static_argnames=("rounds", "interpret"))
def label_components_pallas(
    fg: jax.Array, rounds: int = 4, interpret: bool = False
) -> jax.Array:
    """[B, H, W] (or [H, W]) bool -> int32 labels (bg = H*W).

    ``rounds`` is a static propagation bound (one round crosses any
    monotone staircase; text blobs converge in 1-2).  The kernel body
    UNROLLS rounds x 4 directional scans, so Mosaic compile time grows
    with ``rounds`` — keep it small (<= 6) and escalate pathological
    masks through :func:`label_components_checked`'s XLA fallback
    instead of compiling a high-rounds kernel.
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
            scratch_shapes=[
                pltpu.VMEM((H, W), jnp.int32),
                pltpu.VMEM((H, W), jnp.int32),
            ],
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


def labels_converged(fg: jax.Array, labels: jax.Array) -> jax.Array:
    """Scalar bool: is ``labels`` a fixed point of CC propagation?

    A labeling is converged iff no two 4-adjacent foreground pixels
    carry different labels — two elementwise comparisons, far cheaper
    than another propagation round.
    """
    f = fg
    diff_r = (
        f[..., :, :-1] & f[..., :, 1:]
        & (labels[..., :, :-1] != labels[..., :, 1:])
    )
    diff_d = (
        f[..., :-1, :] & f[..., 1:, :]
        & (labels[..., :-1, :] != labels[..., 1:, :])
    )
    return ~(jnp.any(diff_r) | jnp.any(diff_d))


@functools.partial(
    jax.jit, static_argnames=("rounds", "max_rounds", "interpret")
)
def label_components_checked(
    fg: jax.Array,
    rounds: int = 6,
    max_rounds: int = 24,
    interpret: bool = False,
) -> jax.Array:
    """Pallas CC with a convergence residual + escalation.

    Text-shaped blobs converge within ``rounds`` (measured); pathological
    snakes (spirals, combs) need more.  Rather than paying the worst case
    always, run the fast bound, verify the fixed point with
    :func:`labels_converged`, and only if unconverged fall back to the
    XLA formulation's convergence-checked ``while_loop`` (up to
    ``max_rounds``).  The production batched path uses this wrapper, so
    a snaking component can no longer silently fragment into several
    boxes.
    """
    from lightly_ocr_tpu.ops.detection import label_components

    batched = fg.ndim == 3
    labels = label_components_pallas(fg, rounds=rounds, interpret=interpret)

    def escalate(_):
        if batched:
            return jax.vmap(lambda m: label_components(m, max_rounds))(fg)
        return label_components(fg, max_rounds)

    return jax.lax.cond(
        labels_converged(fg, labels), lambda _: labels, escalate, None
    )
