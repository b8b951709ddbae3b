"""Fused CRAFT stem conv (VGG conv1_2, 64->64 at full canvas res).

The detector's single most expensive conv is torchvision index 3 —
3x3, 64->64 channels at full canvas resolution (45 GFLOP/receipt at
960x640; reference topology ``ocr/modules/vgg_bn.py:44-47``).  XLA:TPU
runs this shape at ~33 TFLOP/s (~16% of v5e bf16 peak; measured in
``scripts/profile_int8.py``): with only 64 channels, both the
contraction depth and the output lanes of the 128x128 MXU sit half
empty, and int8 measured identical — the limit is lane occupancy, not
arithmetic.

This kernel restructures the conv so the MXU contraction is DENSE:

* XLA prepares ``xcat = concat([xp, shift_w(xp, 1)], channels)`` — a
  128-channel buffer whose lanes hold w-taps 0 and 1 of the padded
  conv1_1 output (2x HBM for this one activation; ~1.5 ms extra DMA at
  batch 16 against a >2x MXU win).
* Per row-tap ``u`` the kernel issues TWO dots: a K=128 fully dense dot
  against ``xcat`` covering w-taps (0, 1), and a K=64 dot against the
  first half of ``xcat`` shifted two columns for w-tap 2.  Six dots
  total instead of nine sparse ones: ~56% -> 37.5% MXU slot density
  becomes the ceiling instead of 25%.
* conv bias + BatchNorm are folded into the weights (inference), ReLU
  applied in-register, one HBM write of the 64-channel result.

The kernel is a SAME conv whose input is zero-padded by the caller, so
no interior re-zeroing is needed (single conv — contrast with the
stacked stages in :mod:`~lightly_ocr_tpu.ops.pallas_tail`).

Numerics are tested against the unfused flax slice in
``tests/test_pallas_stem.py`` (interpret mode); device mode is gated by
``scripts/check_pallas_stem_hw.py`` and exercised by the serving path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightly_ocr_tpu.ops.pallas_tail import _pick_rows, fold_bn


def _stem_kernel(rows, w01_ref, w2_ref, b_ref, xcat_hbm, out_ref, slab_ref, sem):
    """One (batch, row-block) step: [rows+2, W+2, 128] slab -> ReLU'd
    conv output [rows, W, 64].

    Row blocks OVERLAP by the 3x3 halo, which BlockSpec index maps
    cannot express — the slab is DMA'd by hand from the un-blocked HBM
    buffer (``pl.ANY``), exactly like the detector tail kernel.

    ``w01_ref`` [3, 128, 64]: per row-tap, w-taps 0 and 1 stacked on the
    contraction dim (matching xcat's channel layout).  ``w2_ref``
    [3, 64, 64]: w-tap 2, contracted against the un-shifted first half
    of the slab two columns over.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    nsteps = pl.num_programs(0) * ni

    def dma(b_, i_, slot):
        return pltpu.make_async_copy(
            xcat_hbm.at[b_, pl.ds(i_ * rows, rows + 2)],
            slab_ref.at[slot],
            sem.at[slot],
        )

    # Double-buffered slab DMA across sequential grid steps (same
    # pattern as the tail kernel): prefetch step k+1's rows while
    # computing step k, instead of stalling every step on its copy.
    k = b * ni + i
    slot = jax.lax.rem(k, 2)

    @pl.when(k == 0)
    def _():
        dma(b, i, slot).start()

    @pl.when(k + 1 < nsteps)
    def _():
        kn = k + 1
        dma(kn // ni, jax.lax.rem(kn, ni), jax.lax.rem(kn, 2)).start()

    dma(b, i, slot).wait()
    slab = slab_ref[slot]
    R = rows
    Wo = out_ref.shape[2]  # 8-aligned output width
    # w-taps 0/1 read the lane-packed xcat at col c (aligned slice);
    # w-tap 2 reads x0(c+2) = xcat's first half two columns over — a
    # misaligned slice that costs ONE in-VMEM realign copy (Mosaic's
    # tpu.dynamic_rotate is unimplemented for 16-bit data, so slices,
    # not rolls).  Both slices are taken before the per-u row split.
    x01 = slab[:, 0:Wo]
    x2 = slab[:, 2 : 2 + Wo, 0:64]
    acc = None
    for u in range(3):
        # Flatten [R, Wo, C] -> [R*Wo, C] for ONE matmul per tap: Wo is
        # 8-aligned so the reshape is a layout no-op, and the MXU sees
        # M=R*Wo instead of R fragmented W-row matmuls (the fragmented
        # form measured ~6x slower than XLA's conv — issue-latency
        # bound, not FLOP bound).
        d = jax.lax.dot_general(
            x01[u : u + R].reshape(R * Wo, 128),
            w01_ref[u],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d2 = jax.lax.dot_general(
            x2[u : u + R].reshape(R * Wo, 64),
            w2_ref[u],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = d + d2
        acc = s if acc is None else acc + s
    y = jnp.maximum(acc + b_ref[:].reshape(1, -1), 0.0)
    out_ref[0] = y.reshape(R, Wo, 64).astype(out_ref.dtype)


def stem_params(variables: dict) -> tuple:
    """(w01 [3,128,64], w2 [3,64,64], b [1,1,64]) — conv1_2 (torch idx
    3) with BN (idx 4) folded, laid out for the kernel's dots."""
    p = variables["params"]["basenet"]["slice1"]
    bs = variables["batch_stats"]["basenet"]["slice1"]
    k, b = fold_bn(
        p["3"]["kernel"], p["3"]["bias"],
        p["4"]["scale"], p["4"]["bias"],
        bs["4"]["mean"], bs["4"]["var"],
    )
    k = jnp.asarray(k, jnp.float32)  # [3, 3, 64, 64] (kh, kw, cin, cout)
    w01 = jnp.concatenate([k[:, 0], k[:, 1]], axis=1)  # [3, 128, 64]
    w2 = k[:, 2]  # [3, 64, 64]
    return (
        w01.astype(jnp.bfloat16),
        w2.astype(jnp.bfloat16),
        jnp.asarray(b, jnp.float32).reshape(1, 1, -1),
    )


def stem_supported(h: int) -> bool:
    return _pick_rows(h) != 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_stem_conv(
    variables: dict, x0: jax.Array, interpret: bool = False
) -> jax.Array:
    """conv1_1 output [B, H, W, 64] -> ReLU(BN(conv1_2(x))) [B, H, W, 64].

    ``x0`` is the conv0+BN+ReLU activation (see
    :class:`~lightly_ocr_tpu.models.vgg_unet.VggStemPrefix`).  The
    remaining slice1 ops (pool + the two 128-channel convs) run in XLA,
    which already sustains ~80 TFLOP/s at those shapes.
    """
    B, H, W, C = x0.shape
    if C != 64:
        raise ValueError(f"fused stem expects 64 channels, got {C}")
    if W % 8:
        # the kernel's flattened [R*W, C] dots need an 8-aligned W
        # (canvas widths are multiples of 32, so this never fires in
        # serving)
        raise ValueError(f"fused stem: W={W} not a multiple of 8")
    rows = _pick_rows(H)
    if rows == 0:
        raise ValueError(f"fused stem: H={H} not divisible by 4")
    w01, w2, b = stem_params(variables)

    # TPU DMA slices must be 8-aligned on the sublane (W) dim: round the
    # padded width up to a multiple of 8 with extra zero columns (they
    # sit past every valid output column, so they are never read).
    wpad = (-(W + 2)) % 8
    xp = jnp.pad(
        x0.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1 + wpad), (0, 0))
    )
    # Lane-dense two-tap layout: channels [xp(w), xp(w+1)].  The final
    # column's second half reads past the pad and is zero-filled; it is
    # never touched by a valid output column.
    shifted = jnp.pad(
        xp[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0))
    )
    xcat = jnp.concatenate([xp, shifted], axis=-1)  # [B, H+2, W+2+wpad, 128]

    kernel = functools.partial(_stem_kernel, rows)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B, H // rows),
        in_specs=[
            wspec,
            wspec,
            wspec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, W, 64), lambda bb, i: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, 64), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 2, W + 2 + wpad, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # rows=40 double-buffered slabs are ~14 MB — past the 16 MB
        # default scoped budget (v5e has 128 MB VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(w01, w2, b, xcat)


# ---------------------------------------------------------------------------
# conv1_2 + 2x2 maxpool fused (round-2 rework with the tail's recipe)
# ---------------------------------------------------------------------------


def _db_slab(xp_hbm, slabs, sems, rows, halo2):
    """Double-buffered slab DMA over a (B, H//rows) grid (scratch
    persists across sequential TPU grid steps): start step k+1's copy
    while computing on step k's slot, so no step stalls on its own DMA
    latency.  ``halo2`` = total halo rows (top+bottom).  Returns the
    current slab view.  Shared by the conv-pool kernels; the tail
    kernel carries the 3D-grid variant of the same pattern."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    nsteps = pl.num_programs(0) * ni

    def dma(b_, i_, slot):
        return pltpu.make_async_copy(
            xp_hbm.at[b_, pl.ds(i_ * rows, rows + halo2)],
            slabs.at[slot],
            sems.at[slot],
        )

    k = b * ni + i
    slot = jax.lax.rem(k, 2)

    @pl.when(k == 0)
    def _():
        dma(b, i, slot).start()

    @pl.when(k + 1 < nsteps)
    def _():
        kn = k + 1
        dma(kn // ni, jax.lax.rem(kn, ni), jax.lax.rem(kn, 2)).start()

    dma(b, i, slot).wait()
    return slabs[slot]


def _conv_pool_kernel(
    rows, pool_impl, wk_ref, b_ref, xp_hbm, out_ref, slabs, sems
):
    """One (batch, row-block) step: [rows+2, Wp, 128] slab ->
    pooled ReLU'd conv output [rows/2, W/2, 64].

    Same structural recipe that made the tail kernel win
    (:func:`~lightly_ocr_tpu.ops.pallas_tail._conv3_same`): the whole
    3x3 is ONE near-dense MXU dot with K = 3C row taps (dim-0 slices,
    offset-free lane concat) and N = 3Co w-taps (shifted output
    slice-adds), flattened to a single tall [R*Wp, 192] matmul.  The
    2x2 maxpool runs in-register on the f32 conv result, so the
    full-resolution 64-channel activation (1.26 GB bf16 logical /
    2.5 GB lane-padded at b16 960x640) never exists in HBM — the XLA
    graph pays that write, the pool's re-read, AND a 1.9 ms layout
    copy between them (BENCH.md trunk profile: conv1_2 9.58 + pool
    1.98 + copy 1.89 ms).
    """
    slab = _db_slab(xp_hbm, slabs, sems, rows, 2)
    # [rows+2, Wp, 128]; lanes 64: are zero pad
    R = rows
    Wp = slab.shape[1]
    W = out_ref.shape[2] * 2  # true conv width

    # K = 3*64 lane-concat of the row taps (offset-free dim-0 slices)
    xr = jnp.concatenate(
        [slab[u : u + R, :, 0:64] for u in range(3)], axis=-1
    )
    y = jax.lax.dot_general(
        xr.reshape(R * Wp, 192),
        wk_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(R, Wp, 192)
    # w-taps ride N: out[r, c] += y[r, c+v, v-block] (xp col c+v = src
    # col c+v-1 = kernel w-tap v of the SAME conv)
    acc = y[:, 0:W, 0:64]
    for v in (1, 2):
        acc = acc + y[:, v : v + W, v * 64 : (v + 1) * 64]
    a = jnp.maximum(acc + b_ref[:].reshape(1, 1, -1), 0.0)
    # 2x2 maxpool in-register: rows via the outer-dim pair reshape
    # ([R, W, 64] -> [R/2, 2, W, 64]: dim 0 is untiled, so the split
    # is layout-free — stride-2 SLICES on any dim lower to a gather
    # Mosaic rejects, "Only 2D gather is supported"), cols via the
    # pair-lane reshape ([R/2, W, 64] -> [R/2, W/2, 128] puts each
    # column pair's channels side by side on the lane dim — W is the
    # sublane dim so this is one in-VMEM relayout, far cheaper than an
    # HBM round-trip).  pool_impl="strided" selects a sublane pair
    # reshape instead (numerically identical) — the Mosaic-feasibility
    # hedge.  Both variants are parity-tested
    # (tests/test_pallas_stem.py parametrizes pool_impl).
    ar = a.reshape(R // 2, 2, a.shape[1], 64)
    rmax = jnp.maximum(ar[:, 0], ar[:, 1])  # [R/2, W, 64]
    if pool_impl == "strided":
        rp = rmax.reshape(R // 2, W // 2, 2, 64)
        cmax = jnp.maximum(rp[:, :, 0], rp[:, :, 1])
    else:
        r2 = rmax.reshape(R // 2, W // 2, 128)
        cmax = jnp.maximum(r2[:, :, 0:64], r2[:, :, 64:128])
    out_ref[0] = cmax.astype(out_ref.dtype)


def conv12_params(variables: dict) -> tuple:
    """([192, 192] packed conv1_2 kernel with BN folded, [1, 1, 64]
    bias) for :func:`fused_conv12_pool` — K/N layouts per
    :func:`~lightly_ocr_tpu.ops.pallas_tail._wtap`."""
    from lightly_ocr_tpu.ops.pallas_tail import _wtap

    p = variables["params"]["basenet"]["slice1"]
    bs = variables["batch_stats"]["basenet"]["slice1"]
    k, b = fold_bn(
        p["3"]["kernel"], p["3"]["bias"],
        p["4"]["scale"], p["4"]["bias"],
        bs["4"]["mean"], bs["4"]["var"],
    )
    return _wtap(k), jnp.asarray(b, jnp.float32).reshape(1, 1, -1)


def _pick_rows_even(h: int) -> int:
    """Largest even row block dividing ``h`` from the supported set
    (even: the 2x2 pool halves rows in-kernel)."""
    for r in (32, 16, 8, 4, 2):
        if h % r == 0:
            return r
    return 0


def conv_pool_supported(h: int, w: int) -> bool:
    return h % 2 == 0 and w % 16 == 0 and _pick_rows_even(h) != 0


def fused_conv12_pool(
    variables: dict,
    x0: jax.Array,
    interpret: bool = False,
    pool_impl: str | None = None,
) -> jax.Array:
    """conv1_1 activation [B, H, W, 64] -> pool2x2(ReLU(BN(conv1_2)))
    [B, H/2, W/2, 64].

    Replaces the XLA chain conv1_2 -> pool -> (layout copy) for the
    detector's most expensive stage (reference topology
    ``ocr/modules/vgg_bn.py:44-48``); the backbone resumes at conv2_1
    (:class:`~lightly_ocr_tpu.models.vgg_unet.VGG_UNetTrunk` with
    ``from_pool=True``).  Numerics: tests/test_pallas_stem.py
    (interpret) + scripts/check_conv_pool_hw.py (device).

    ``pool_impl``: ``"reshape"`` (default) or ``"strided"`` — the
    in-kernel column-pool lowering; resolved here (NOT at trace time
    inside the kernel) from ``LIGHTLY_OCR_CPOOL_POOL`` when None, and
    passed as a jit static so in-process flips retrace correctly.
    """
    if pool_impl is None:
        import os

        pool_impl = (
            os.environ.get("LIGHTLY_OCR_CPOOL_POOL", "").strip()
            or "strided"
        )
    return _fused_conv12_pool(variables, x0, interpret, pool_impl)


@functools.partial(
    jax.jit, static_argnames=("interpret", "pool_impl")
)
def _fused_conv12_pool(
    variables: dict,
    x0: jax.Array,
    interpret: bool = False,
    pool_impl: str = "reshape",
) -> jax.Array:
    B, H, W, C = x0.shape
    if C != 64:
        raise ValueError(f"fused conv1_2+pool expects 64 channels, got {C}")
    if W % 16:
        # W/2 must stay 8-aligned for the pooled output's sublane dim
        raise ValueError(f"fused conv1_2+pool: W={W} not a multiple of 16")
    rows = _pick_rows_even(H)
    if rows == 0:
        raise ValueError(f"fused conv1_2+pool: H={H} has no even row split")
    wk, bias = conv12_params(variables)

    wpad = (-(W + 2)) % 8
    xp = jnp.pad(
        x0.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1 + wpad), (0, 64))
    )

    kernel = functools.partial(_conv_pool_kernel, rows, pool_impl)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B, H // rows),
        in_specs=[wspec, wspec, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, rows // 2, W // 2, 64), lambda bb, i: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, 64), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 2, W + 2 + wpad, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(wk, bias, xp)


# ---------------------------------------------------------------------------
# phase 2: conv1_2 + pool + conv2_1 in one kernel
# ---------------------------------------------------------------------------


def _conv_pool_conv_kernel(
    rows, h, w,
    wk1_ref, b1_ref, wk2_ref, b2_ref,
    xp_hbm, out_ref, slabs, sems,
):
    """One (batch, row-block) step: [rows+8, Wp, 128] slab ->
    conv2_1 output [rows/2, W/2, 128].

    Extends :func:`_conv_pool_kernel` one stage deeper: the pooled
    activation stays in VMEM and conv2_1 (64->128, the next
    lane-starved XLA stage at 72 T/s-eq) runs as a second packed dot
    (K=3*64, N=3*128) on it.  Boundary discipline: the pooled feature
    map's SAME-conv ring must read ZERO (the XLA graph pads the pooled
    map itself), but pool-of-conv at image edges is nonzero — the ring
    is explicitly rezeroed via iota masks before the second dot, same
    trick as the tail kernel's rezero.
    """
    i = pl.program_id(1)
    slab = _db_slab(xp_hbm, slabs, sems, rows, 8)
    # [rows+8, Wp, 128]; image row i*rows + s - 4 at slab row s
    R = rows
    Wp = slab.shape[1]
    S1 = R + 4  # conv1_2 rows: image rows [iR-2, iR+R+2)

    # --- conv1_2 (packed single dot) + bias + ReLU ------------------
    xr = jnp.concatenate(
        [slab[1 + u : 1 + u + S1, :, 0:64] for u in range(3)], axis=-1
    )
    y = jax.lax.dot_general(
        xr.reshape(S1 * Wp, 192),
        wk1_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(S1, Wp, 192)
    Wc = w + 4  # conv cols: image cols [-2, W+2)
    acc = y[:, 1 : 1 + Wc, 0:64]
    for v in (1, 2):
        acc = acc + y[:, 1 + v : 1 + v + Wc, v * 64 : (v + 1) * 64]
    a1 = jnp.maximum(acc + b1_ref[:].reshape(1, 1, -1), 0.0)

    # --- 2x2 pool (rows: outer-dim pair reshape; cols: pair-lane
    # reshape — stride-2 slices lower to unsupported Mosaic gathers) --
    # pad cols so the paired width stays 8-aligned: Wc=W+4 -> W+16
    a1 = jnp.pad(a1, ((0, 0), (0, 12), (0, 0)))
    a1r = a1.reshape(S1 // 2, 2, w + 16, 64)
    rmax = jnp.maximum(a1r[:, 0], a1r[:, 1])     # [R/2+2, W+16, 64]
    # sublane-pair reshape (NOT pair-lane [.., W/2, 128]: that form
    # crashes the Mosaic backend at every shape — device-probed r3)
    r2 = rmax.reshape(rmax.shape[0], (w + 16) // 2, 2, 64)
    p2 = jnp.maximum(r2[:, :, 0], r2[:, :, 1])
    # p2[t, d] = pooled image (iR/2 - 1 + t, d - 1)

    # --- rezero the SAME-conv ring of the pooled map ----------------
    pr = (
        jax.lax.broadcasted_iota(jnp.int32, p2.shape, 0)
        + (i * (R // 2) - 1)
    )
    pc = jax.lax.broadcasted_iota(jnp.int32, p2.shape, 1) - 1
    ok = (pr >= 0) & (pr < h // 2) & (pc >= 0) & (pc < w // 2)
    p2 = jnp.where(ok, p2, jnp.zeros_like(p2)).astype(jnp.bfloat16)

    # --- conv2_1 (packed single dot) + bias + ReLU ------------------
    R2 = R // 2
    W2p = p2.shape[1]
    xr2 = jnp.concatenate(
        [p2[u : u + R2] for u in range(3)], axis=-1
    )  # [R/2, W2p, 192]
    y2 = jax.lax.dot_general(
        xr2.reshape(R2 * W2p, 192),
        wk2_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(R2, W2p, 384)
    acc2 = y2[:, 0 : w // 2, 0:128]
    for v in (1, 2):
        acc2 = acc2 + y2[:, v : v + w // 2, v * 128 : (v + 1) * 128]
    o = jnp.maximum(acc2 + b2_ref[:].reshape(1, 1, -1), 0.0)
    out_ref[0] = o.astype(out_ref.dtype)


def conv21_params(variables: dict) -> tuple:
    """([192, 384] packed conv2_1 kernel with BN folded, [1, 1, 128]
    bias) — torch indices 7 (conv) / 8 (bn) of slice1."""
    from lightly_ocr_tpu.ops.pallas_tail import _wtap

    p = variables["params"]["basenet"]["slice1"]
    bs = variables["batch_stats"]["basenet"]["slice1"]
    k, b = fold_bn(
        p["7"]["kernel"], p["7"]["bias"],
        p["8"]["scale"], p["8"]["bias"],
        bs["8"]["mean"], bs["8"]["var"],
    )
    return _wtap(k), jnp.asarray(b, jnp.float32).reshape(1, 1, -1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_conv12_pool_conv21(
    variables: dict, x0: jax.Array, interpret: bool = False
) -> jax.Array:
    """conv1_1 activation [B, H, W, 64] ->
    ReLU(BN(conv2_1(pool(ReLU(BN(conv1_2)))))) [B, H/2, W/2, 128].

    One stage deeper than :func:`fused_conv12_pool`: the two most
    lane-starved slice1 stages (conv1_2 @76 and conv2_1 @72 T/s-eq in
    XLA — BENCH.md trunk profile) run as two packed near-dense dots on
    a VMEM-resident slab; neither the full-res conv1_2 activation nor
    the pooled map round-trips HBM.  Backbone resumes at conv2_2
    (``VGG_UNetTrunk(from_c21=True)``).
    """
    B, H, W, C = x0.shape
    if C != 64:
        raise ValueError(f"fused cpool2 expects 64 channels, got {C}")
    if W % 16:
        raise ValueError(f"fused cpool2: W={W} not a multiple of 16")
    rows = _pick_rows_even(H)
    if rows == 0:
        raise ValueError(f"fused cpool2: H={H} has no even row split")
    wk1, b1 = conv12_params(variables)
    wk2, b2 = conv21_params(variables)

    xp = jnp.pad(
        x0.astype(jnp.bfloat16), ((0, 0), (4, 4), (4, 4), (0, 64))
    )

    kernel = functools.partial(_conv_pool_conv_kernel, rows, H, W)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B, H // rows),
        in_specs=[wspec] * 4 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, rows // 2, W // 2, 128), lambda bb, i: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, H // 2, W // 2, 128), jnp.bfloat16
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 8, W + 8, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(wk1, b1, wk2, b2, xp)


# ---------------------------------------------------------------------------
# w8a8 int8 variant: int8 slab DMA (half the bytes) + int8 MXU (2x peak)
# ---------------------------------------------------------------------------


def _wtap_q(kernel):
    """Fold-BN'd [3, 3, C, Co] float kernel -> (int8 [3C, 3Co] packed,
    f32 [Co] per-out-channel scale).  All three w-tap N-blocks of a
    channel share that channel's scale, so the post-dot v-block sum
    dequantizes with one multiply."""
    k = jnp.asarray(kernel, jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-12) / 127.0
    kq = jnp.clip(jnp.round(k / sw), -127, 127).astype(jnp.int8)
    u3, v3, C, Co = k.shape
    packed = kq.transpose(0, 2, 1, 3).reshape(u3 * C, v3 * Co)
    return packed, sw


def _conv_pool_conv_q_kernel(
    rows, h, w,
    wk1_ref, sw1_ref, b1_ref, wk2_ref, sw2_ref, b2_ref, sx_ref,
    xp_hbm, out_ref, slabs, sems,
):
    """int8 version of :func:`_conv_pool_conv_kernel`: the slab arrives
    pre-quantized int8 (per-sample scale ``sx`` from XLA, QuantConv
    convention), both packed dots run on the int8 MXU with int32
    accumulation, and the conv2_1 input requantizes in-register with a
    per-slab dynamic scale (finer grouping than per-sample; the pooled
    map never exists outside VMEM to take a global amax of)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    slab = _db_slab(xp_hbm, slabs, sems, rows, 8)  # int8 [rows+8, Wp, 128]
    R = rows
    Wp = slab.shape[1]
    S1 = R + 4

    xr = jnp.concatenate(
        [slab[1 + u : 1 + u + S1, :, 0:64] for u in range(3)], axis=-1
    )
    y = jax.lax.dot_general(
        xr.reshape(S1 * Wp, 192),
        wk1_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).reshape(S1, Wp, 192)
    Wc = w + 4
    acc = y[:, 1 : 1 + Wc, 0:64]
    for v in (1, 2):
        acc = acc + y[:, 1 + v : 1 + v + Wc, v * 64 : (v + 1) * 64]
    # dequantize: per-sample activation scale x per-channel weight scale
    sx = sx_ref[b, 0]
    a1 = acc.astype(jnp.float32) * (sx * sw1_ref[:].reshape(1, 1, -1))
    a1 = jnp.maximum(a1 + b1_ref[:].reshape(1, 1, -1), 0.0)

    a1 = jnp.pad(a1, ((0, 0), (0, 12), (0, 0)))
    a1r = a1.reshape(S1 // 2, 2, w + 16, 64)
    rmax = jnp.maximum(a1r[:, 0], a1r[:, 1])
    # sublane-pair reshape (NOT pair-lane [.., W/2, 128]: that form
    # crashes the Mosaic backend at every shape — device-probed r3)
    r2 = rmax.reshape(rmax.shape[0], (w + 16) // 2, 2, 64)
    p2 = jnp.maximum(r2[:, :, 0], r2[:, :, 1])

    pr = (
        jax.lax.broadcasted_iota(jnp.int32, p2.shape, 0)
        + (i * (R // 2) - 1)
    )
    pc = jax.lax.broadcasted_iota(jnp.int32, p2.shape, 1) - 1
    ok = (pr >= 0) & (pr < h // 2) & (pc >= 0) & (pc < w // 2)
    p2 = jnp.where(ok, p2, jnp.zeros_like(p2))

    # requantize for the second int8 dot (per-slab dynamic scale)
    s2 = jnp.maximum(jnp.max(jnp.abs(p2)), 1e-12) / 127.0
    p2q = jnp.clip(jnp.round(p2 / s2), -127, 127).astype(jnp.int8)

    R2 = R // 2
    W2p = p2q.shape[1]
    xr2 = jnp.concatenate([p2q[u : u + R2] for u in range(3)], axis=-1)
    y2 = jax.lax.dot_general(
        xr2.reshape(R2 * W2p, 192),
        wk2_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).reshape(R2, W2p, 384)
    acc2 = y2[:, 0 : w // 2, 0:128]
    for v in (1, 2):
        acc2 = acc2 + y2[:, v : v + w // 2, v * 128 : (v + 1) * 128]
    o = acc2.astype(jnp.float32) * (s2 * sw2_ref[:].reshape(1, 1, -1))
    o = jnp.maximum(o + b2_ref[:].reshape(1, 1, -1), 0.0)
    out_ref[0] = o.astype(out_ref.dtype)


def fused_conv12_pool_conv21_q(
    variables: dict, x0: jax.Array, interpret: bool = False
) -> jax.Array:
    """w8a8 int8 :func:`fused_conv12_pool_conv21`: half the slab DMA
    bytes and 2x the MXU peak on the packed dense dots.  NOTE this
    quantizes two convs the XLA serving graph keeps in float (its
    QuantConv <128-channel cutoff exists because XLA's int8 conv was
    lane-starved to 1.00x — the packed K=192 dots are not); the int8
    parity gates cover the numerics."""
    return _fused_conv12_pool_conv21_q(variables, x0, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_conv12_pool_conv21_q(
    variables: dict, x0: jax.Array, interpret: bool = False
) -> jax.Array:
    B, H, W, C = x0.shape
    if C != 64:
        raise ValueError(f"fused cpool2q expects 64 channels, got {C}")
    if W % 16:
        raise ValueError(f"fused cpool2q: W={W} not a multiple of 16")
    rows = _pick_rows_even(H)
    if rows == 0:
        raise ValueError(f"fused cpool2q: H={H} has no even row split")
    k1, b1 = fold_bn(
        variables["params"]["basenet"]["slice1"]["3"]["kernel"],
        variables["params"]["basenet"]["slice1"]["3"]["bias"],
        variables["params"]["basenet"]["slice1"]["4"]["scale"],
        variables["params"]["basenet"]["slice1"]["4"]["bias"],
        variables["batch_stats"]["basenet"]["slice1"]["4"]["mean"],
        variables["batch_stats"]["basenet"]["slice1"]["4"]["var"],
    )
    k2, b2 = fold_bn(
        variables["params"]["basenet"]["slice1"]["7"]["kernel"],
        variables["params"]["basenet"]["slice1"]["7"]["bias"],
        variables["params"]["basenet"]["slice1"]["8"]["scale"],
        variables["params"]["basenet"]["slice1"]["8"]["bias"],
        variables["batch_stats"]["basenet"]["slice1"]["8"]["mean"],
        variables["batch_stats"]["basenet"]["slice1"]["8"]["var"],
    )
    wq1, sw1 = _wtap_q(k1)
    wq2, sw2 = _wtap_q(k2)

    # per-sample activation quantization (QuantConv convention)
    xf = x0.astype(jnp.float32)
    sx = (
        jnp.maximum(
            jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True), 1e-12
        )
        / 127.0
    )
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    # int8 tiling is (32, 128): pad the sublane (W) extent to a
    # 32-multiple so the slab DMA stays tile-aligned
    wpad = (-(W + 8)) % 32
    xp = jnp.pad(xq, ((0, 0), (4, 4), (4, 4 + wpad), (0, 64)))

    kernel = functools.partial(_conv_pool_conv_q_kernel, rows, H, W)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B, H // rows),
        in_specs=[wspec] * 6
        + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, rows // 2, W // 2, 128), lambda bb, i: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, H // 2, W // 2, 128), jnp.bfloat16
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 8, W + 8 + wpad, 128), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        wq1, sw1, jnp.asarray(b1, jnp.float32),
        wq2, sw2, jnp.asarray(b2, jnp.float32),
        sx.reshape(B, 1), xp,
    )
