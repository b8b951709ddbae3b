"""Fused CRAFT detector tail (upconv4 3x3 + cls head) as a Pallas kernel.

The detector's last stage runs at H/2 x W/2 with 64/32/16/2 channels.
XLA emits each conv as its own fusion and the narrow channel counts
leave the MXU ~3-15% utilized; with layout copies the tail costs ~17 ms
of an ~80 ms batch-16 forward (measured via jax.profiler on v5e —
conv_cls convs at 5.9 TFLOP/s).  Channel-poor convs are lane-starved no
matter the precision (int8 measured the same 3%), so the fix is fusion:
one kernel keeps a row-slab of the feature map in VMEM and runs the
whole chain

    3x3 conv(64->32)+BN+ReLU -> 3x3(32->32)+ReLU -> 3x3(32->32)+ReLU ->
    3x3(32->16)+ReLU -> 1x1(16->16)+ReLU -> 1x1(16->2)

per slab, writing only the 2-channel score map back to HBM.  All convs
are im2col dots (w-taps concatenated on the lane dim, K=3C) so the MXU
does the arithmetic; HBM traffic drops from ~10 activation round-trips
to one read + one (tiny) write.

Parity: reference head semantics at ``ocr/model.py:34-46`` (upconv4 +
conv_cls); numerics tested against the unfused flax modules in
``tests/test_pallas_tail.py`` (interpret mode on CPU) and on hardware
at small shapes (``scripts/check_pallas_tail_hw.py``).

STATUS — opt-in (``LIGHTLY_OCR_ENABLE_FUSED=tail`` +
``LIGHTLY_OCR_FUSED_IMPL=pallas``): correct and validated, but NOT the
production default in this environment.  At production canvas sizes
the Mosaic compile exceeds the remote compile service's budget even
after col-blocking the grid to 128-wide slabs and raising the scoped
VMEM limit (full-width: helper SIGKILL; col-blocked: >30 min without
completing — ``scripts/check_tail_scale_hw.py`` is the gate).  On a
standard local TPU toolchain the kernel should compile in seconds; the
XLA path (plain flax graph) is used meanwhile.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 4  # four stacked 3x3 convs -> 4 rows/cols of context per side


def _conv3(src, wk, bias):
    """[R, Wd, C] x [3, 3C, Co] -> ReLU'd [R-2, Wd-2, Co] (f32 acc).

    ``wk[u]`` holds the u-th kernel row's taps stacked w-tap-major on its
    first axis.  Each of the nine taps contracts as its own [.., C] x
    [C, Co] dot against the (u, v)-shifted window — Mosaic cannot yet
    concatenate w-shifted slices on the lane dim (offset mismatch on the
    sublane dim), so the im2col-style K=3C dot is expressed as a sum of
    K=C dots instead; the MXU accumulates them in f32 either way.
    """
    R, Wd, C = src.shape
    Ro, Wo = R - 2, Wd - 2
    acc = None
    for u in range(3):
        rs = src[u : u + Ro]
        for v in range(3):
            d = jax.lax.dot_general(
                rs[:, v : v + Wo],
                wk[u, v * C : (v + 1) * C],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
    return jnp.maximum(acc + bias, 0.0).astype(src.dtype)


def _tail_kernel(
    rows, cols, h2, w2,
    xp_hbm,
    wa_ref, ba_ref, w0_ref, b0_ref, w2_ref, b2_ref, w4_ref, b4_ref,
    w6_ref, b6_ref, w8_ref, b8_ref,
    out_ref,
    slab, sem,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    cp = pltpu.make_async_copy(
        xp_hbm.at[
            b,
            pl.ds(i * rows, rows + 2 * HALO),
            pl.ds(j * cols, cols + 2 * HALO),
        ],
        slab,
        sem,
    )
    cp.start()
    cp.wait()

    def rezero(t, stage):
        """Zero positions outside the true image: stacked SAME convs pad
        each INTERMEDIATE with zeros, so virtual halo cells must read 0,
        not conv(0)=relu(bias).  After stage k the slab's (r, c) maps to
        image (i*rows + r - off, j*cols + c - off) with off = HALO - k.
        Also zeroes the right-padding columns past w2 (the col grid pads
        W/2 up to a cols multiple)."""
        off = HALO - stage
        # 3D iotas: Mosaic cannot insert a minor dim on sub-32-bit types
        # (bf16 `ok[..., None]` fails to compile), so build the mask at
        # the value's full rank directly.
        r_img = (
            jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
            + i * rows - off
        )
        c_img = (
            jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            + j * cols - off
        )
        ok = (r_img >= 0) & (r_img < h2) & (c_img >= 0) & (c_img < w2)
        return jnp.where(ok, t, jnp.zeros_like(t))

    x = rezero(_conv3(slab[:], wa_ref[:], ba_ref[:]), 1)  # [rows+6, W+6, 32]
    x = rezero(_conv3(x, w0_ref[:], b0_ref[:]), 2)        # [rows+4, W+4, 32]
    x = rezero(_conv3(x, w2_ref[:], b2_ref[:]), 3)        # [rows+2, W+2, 32]
    x = _conv3(x, w4_ref[:], b4_ref[:])                   # [rows,   W,   16]
    e = jnp.maximum(
        jax.lax.dot_general(
            x, w6_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b6_ref[:],
        0.0,
    ).astype(x.dtype)
    o = (
        jax.lax.dot_general(
            e, w8_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b8_ref[:]
    )
    # channels-SECOND output: a [rows, 2, cols] block keeps the lane
    # dim 128-dense (cols); a [.., cols, 2] block lane-pads 2 -> 128
    # and the staging of that 64x-padded buffer blows the 16 MB scoped
    # VMEM limit at production shapes.
    out_ref[0] = jnp.transpose(o, (0, 2, 1)).astype(out_ref.dtype)


def fold_bn(kernel, bias, scale, shift, mean, var, eps=1e-5):
    """conv(+bias) -> BN  ==  conv with folded kernel/bias (inference).

    Shared by the Pallas and rowpack serving paths — keep the single
    copy here."""
    s = scale / jnp.sqrt(var + eps)
    return kernel * s, (bias - mean) * s + shift


def _wtap(kernel):
    """[3, 3, C, Co] float kernel -> bf16 [3, 3C, Co] w-tap-major."""
    k = jnp.asarray(kernel, jnp.float32)
    return k.reshape(3, -1, k.shape[-1]).astype(jnp.bfloat16)


def _env_int(name: str, default: int | None = None) -> int | None:
    """Parse an int env knob; malformed/non-positive values fall back
    with a warning instead of taking down program construction (these
    are read inside BatchedOCR._build even when the tail is off)."""
    import logging
    import os

    env = os.environ.get(name, "").strip()
    if not env:
        return default
    try:
        v = int(env)
        if v <= 0:
            raise ValueError("must be positive")
        return v
    except ValueError as e:
        logging.getLogger(__name__).warning(
            "%s=%r invalid (%s) — using default", name, env, e
        )
        return default


def _pick_rows(h2: int) -> int:
    r = _env_int("LIGHTLY_OCR_TAIL_ROWS")
    if r is not None:
        return r if h2 % r == 0 else 0
    # Mosaic compile cost scales with the unrolled BODY volume (slab
    # rows x cols x stages): 8 rows compiles ~4x faster than 32 and the
    # extra grid steps are nearly free (the DMA pipeline hides them).
    for r in (8, 16, 32, 4):
        if h2 % r == 0:
            return r
    return 0


def tail_params(variables: dict) -> tuple:
    """Extract + fold the tail weights from a VGG_UNet variable tree.

    Returns the 14-tuple of kernel/bias operands the kernel consumes:
    upconv4's 1x1 stage (applied in XLA before the kernel) and the six
    fused stages.  Shapes follow the flax param tree
    (``upconv4/conv/{0,1,3,4}``, ``conv_cls/{0,2,4,6,8}``).
    """
    p = variables["params"]
    bs = variables["batch_stats"]
    pc, bc = p["upconv4"]["conv"], bs["upconv4"]["conv"]

    # 1x1 (192->64) + BN folded — applied in XLA (well-shaped matmul).
    k1, b1 = fold_bn(
        pc["0"]["kernel"][0, 0], pc["0"]["bias"],
        pc["1"]["scale"], pc["1"]["bias"],
        bc["1"]["mean"], bc["1"]["var"],
    )
    # 3x3 (64->32) + BN folded — stage A of the kernel.  The input-
    # channel dim is zero-padded 64 -> 128 to match the lane-padded
    # slab (TPU DMA slices must be tile-aligned on the lane dim) —
    # which also fills the MXU's 128-deep contraction for stage A.
    ka, ba = fold_bn(
        pc["3"]["kernel"], pc["3"]["bias"],
        pc["4"]["scale"], pc["4"]["bias"],
        bc["4"]["mean"], bc["4"]["var"],
    )
    ka = jnp.pad(ka, ((0, 0), (0, 0), (0, 64), (0, 0)))
    h = p["conv_cls"]

    def b_(x):
        return jnp.asarray(x, jnp.float32).reshape(1, 1, -1)

    return (
        k1.astype(jnp.bfloat16), b_(b1),
        _wtap(ka), b_(ba),
        _wtap(h["0"]["kernel"]), b_(h["0"]["bias"]),
        _wtap(h["2"]["kernel"]), b_(h["2"]["bias"]),
        _wtap(h["4"]["kernel"]), b_(h["4"]["bias"]),
        jnp.asarray(h["6"]["kernel"][0, 0], jnp.bfloat16), b_(h["6"]["bias"]),
        jnp.asarray(h["8"]["kernel"][0, 0], jnp.bfloat16), b_(h["8"]["bias"]),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_tail_scores(
    variables: dict, y192: jax.Array, interpret: bool = False
) -> jax.Array:
    """[B, H2, W2, 192] trunk activation -> [B, H2, W2, 2] score maps.

    ``y192`` is the H/2-resolution concat of the upsampled upconv3
    output and slice1 (see :class:`~lightly_ocr_tpu.models.vgg_unet.
    VGG_UNetTrunk`).  Falls back to raising if H2 has no usable row
    split — callers gate on :func:`fused_tail_supported`.
    """
    B, H2, W2, _ = y192.shape
    rows = _pick_rows(H2)
    if rows == 0:
        raise ValueError(f"fused tail: H/2={H2} not divisible by 4")
    # Col-block the grid: Mosaic compile cost scales with the kernel
    # BODY volume (slab width x unrolled stages), and full-width slabs
    # at production canvases blow the remote compile service's budget.
    # 128-col blocks keep the body ~10x smaller; W/2 is padded up to a
    # cols multiple and the pad region is masked by rezero + sliced off.
    cols = min(_env_int("LIGHTLY_OCR_TAIL_COLS", 128), W2)
    W2P = -(-W2 // cols) * cols
    (k1, b1, wa, ba, w0, b0, w2, b2, w4, b4, w6, b6, w8, b8) = tail_params(
        variables
    )

    # upconv4 1x1 + BN + ReLU in XLA (K=192 matmul, MXU-friendly).
    x = jax.lax.dot_general(
        y192.astype(jnp.bfloat16), k1,
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    x = jnp.maximum(x + b1[None], 0.0).astype(jnp.bfloat16)

    # Pad channels 64 -> 128: the HBM buffer is lane-padded to 128
    # anyway, and an explicit full-width channel dim keeps the slab DMA
    # tile-aligned (Mosaic rejects a 64-wide slice of a 128-lane tile).
    xp = jnp.pad(
        x,
        ((0, 0), (HALO, HALO), (HALO, HALO + (W2P - W2)), (0, 64)),
    )

    kernel = functools.partial(_tail_kernel, rows, cols, H2, W2)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kernel,
        grid=(B, H2 // rows, W2P // cols),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [wspec] * 12,
        out_specs=pl.BlockSpec(
            (1, rows, 2, cols), lambda b, i, j: (b, i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H2, 2, W2P), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(
                (rows + 2 * HALO, cols + 2 * HALO, 128), jnp.bfloat16
            ),
            pltpu.SemaphoreType.DMA,
        ],
        # the compiler's default 16 MB scoped-vmem budget rejects the
        # kernel at production shapes (v5e has 128 MB VMEM; measured
        # need ~40 MB of scoped stack)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, wa, ba, w0, b0, w2, b2, w4, b4, w6, b6, w8, b8)
    return jnp.moveaxis(y, 2, 3)[:, :, :W2]


def fused_tail_supported(h2: int) -> bool:
    return _pick_rows(h2) != 0
