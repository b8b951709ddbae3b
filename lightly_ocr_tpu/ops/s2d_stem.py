"""Space-to-depth (phase-packed) VGG stem: conv1_1 + conv1_2 + pool1.

The detector's first two convs run at FULL canvas resolution with 3/64
channels (reference topology ``ocr/modules/vgg_bn.py:44-47``), which
leaves the v5e MXU lane-starved: measured 38% MFU and ~11 ms of the
~27.6 ms slice1 device time at b16 960x640 (BENCH.md "Remaining
levers").  Seven shape-level attacks (int8, rowpack, Winograd, im2col,
fused stem, cpool, cpool2) were each measured and rejected; this module
is the eighth — the one *lane-densifying exact transform*:

    space-to-depth by 2.  A stride-1 3x3 SAME conv over [H, W, C]
    is EXACTLY a dense 2x2 conv over the phase-packed [H/2, W/2, 4C]
    layout producing the phase-packed [H/2, W/2, 4Co] output: each of
    the four output phases (a, b) reads a 2x2 window of phase pixels,
    and each (tap, phase) pair maps to exactly one original kernel tap
    (9 of the 16 dense positions; the rest are structural zeros).

Channel densities rise 4x at identical arithmetic semantics — conv1_1
contracts K = 2*2*12 = 48 (vs 27) and emits N = 256 lanes (vs 64);
conv1_2 becomes a K = 1024, N = 256 near-dense matmul.  The dense 2x2
form performs 16/9 = 1.78x the MACs (the structural zeros are
multiplied), so it wins iff MFU rises by more than 1.78x — the device
A/B lives in ``scripts/check_s2d_hw.py``.

Alignment discipline (the part that makes stacking work without
re-phasing copies): a 3x3 SAME conv in phase space needs a 3-pixel
window UNLESS input and output grids are offset by one source row —
so the chain alternates grid alignments:

* the canvas enters 0-ALIGNED (phase pixel J covers source rows
  {2J, 2J+1});
* conv1_1 consumes it with pad-1 2x2 (window J in {I-1, I}) and emits
  the (-1)-ALIGNED grid (pixel I covers source rows {2I-1, 2I},
  I = 0..H/2): exactly the SAME-padded input conv1_2 wants, with the
  pad ring materialized as explicit zeros (per-PHASE: row I=0 phase 0
  is source row -1, row I=H/2 phase 1 is source row H);
* conv1_2 consumes that VALID 2x2 (window I in {J, J+1}) and emits
  0-aligned phases — which are exactly pool1's 2x2 windows, so the
  pool is a max over the four phase blocks and the full-resolution
  layout never exists anywhere in the graph.

Output: the pool1 activation ``[B, H/2, W/2, 64]`` — drop-in for the
``from_pool=True`` trunk resume (same contract as
:func:`~lightly_ocr_tpu.ops.pallas_stem.fused_conv12_pool`).

Both convs fold their BatchNorm (inference semantics, exact in f32;
same discipline as the fused tail).  ``quant="conv12"`` additionally
runs the 256->256 conv1_2 in w8a8 on the int8 MXU with QuantConv's
dynamic per-sample scheme — the phase-packed channel counts pass the
``min(cin, cout) >= 128`` gate that keeps the UNPACKED conv1_2 float
even in int8 serving, so this is headroom the legacy layout cannot
reach.  Parity: ``tests/test_s2d_stem.py`` (f32 exactness + bf16
tolerance vs the flax slice1 prefix).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lightly_ocr_tpu.ops.pallas_tail import fold_bn


def s2d_supported(h: int, w: int) -> bool:
    """Even canvas only (phases pair source rows/cols).  Canvases are
    multiples of 32, so this always holds in serving."""
    return h % 2 == 0 and w % 2 == 0


def _s2d(x: jax.Array) -> jax.Array:
    """[B, H, W, C] -> 0-aligned phase-packed [B, H/2, W/2, 4C] with
    channel blocks ordered (ph, pw, c): block ph*2+pw holds source
    pixel (2J+ph, 2K+pw).  (Kept for tests/reference; the production
    path never materializes this — conv1_1 reads the raw canvas with a
    stride-2 window instead, see :func:`_s2d_kernel4`.)"""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def _s2d_kernel4(k3: jax.Array, dtype) -> jax.Array:
    """[3, 3, Cin, Cout] SAME-conv kernel -> the stride-2 4x4 kernel
    [4, 4, Cin, 4Cout] that emits the (-1)-ALIGNED phase-packed output
    directly from the UNPACKED input.

    Device-trace lesson: materializing the phase-packed input cost a
    4.3 ms transpose copy at the bench shape — but the packing is just
    an indexing relabel, so it folds into conv1_1's own window: output
    phase row ``r = 2I + ph - 1`` taps source rows ``q = r + u - 1``;
    with window start ``2I - 2`` (pad 2) the window position is
    ``t = q - (2I - 2) = ph + u``, so

        K4[t, s, c, (ph*2+pw)*Co + co] = k3[t - ph, s - pw, c, co]

    (zero outside 0..2).  One ``conv_general_dilated`` with
    ``strides=(2,2), padding=((2,2),(2,2))`` then reads the raw
    canvas and writes ``[B, H/2+1, W/2+1, 4Co]`` — identical MACs to
    the packed 2x2 form, no packing copy anywhere."""
    kp = jnp.pad(
        jnp.asarray(k3, jnp.float32), ((1, 1), (1, 1), (0, 0), (0, 0))
    )
    rows = []
    for t in range(4):
        cols = []
        for s in range(4):
            blocks = []
            for ph in (0, 1):
                for pw in (0, 1):
                    u = t - ph
                    v = s - pw
                    if 0 <= u <= 2 and 0 <= v <= 2:
                        blocks.append(kp[u + 1, v + 1])
                    else:
                        blocks.append(jnp.zeros_like(kp[0, 0]))
            cols.append(jnp.concatenate(blocks, axis=1))  # [Ci, 4Co]
        rows.append(jnp.stack(cols, 0))
    return jnp.stack(rows, 0).astype(dtype)  # [4, 4, Ci, 4Co]


def _s2d_kernel(k3: jax.Array, dtype) -> jax.Array:
    """[3, 3, Cin, Cout] SAME-conv kernel -> the dense 2x2 phase-space
    kernel [2, 2, 4Cin, 4Cout].

    Position (R, S), input block (sh, sw), output block (ph, pw) holds
    original tap ``k3[2R+sh-ph, 2S+sw-pw]`` (structural zero when the
    index leaves 0..2).  Derivation: output phase row ``r = 2J + ph``
    of a SAME conv taps source rows ``r + u - 1``; writing the source
    row as ``2(J + R') + sh - 1`` of the (-1)-aligned input grid (or
    ``2(J - 1 + R') + sh`` of the pad-1 0-aligned grid — same algebra)
    gives ``2R' + sh = ph + u``, a bijection between the 9 taps and
    the in-window (R', sh) pairs.  Both stem convs share this builder;
    only their input padding differs (see module docstring).
    """
    kp = jnp.pad(
        jnp.asarray(k3, jnp.float32), ((1, 1), (1, 1), (0, 0), (0, 0))
    )  # index u+1 in 0..4; rows 0 and 4 are the structural zeros
    rows = []
    for R in (0, 1):
        cols = []
        for S in (0, 1):
            in_blocks = []
            for sh in (0, 1):
                for sw in (0, 1):
                    out_blocks = []
                    for ph in (0, 1):
                        for pw in (0, 1):
                            u = 2 * R + sh - ph
                            v = 2 * S + sw - pw
                            out_blocks.append(kp[u + 1, v + 1])
                    in_blocks.append(jnp.concatenate(out_blocks, axis=1))
            cols.append(jnp.concatenate(in_blocks, axis=0))  # [4Ci, 4Co]
        rows.append(jnp.stack(cols, 0))
    return jnp.stack(rows, 0).astype(dtype)  # [2, 2, 4Ci, 4Co]


def _ring_mask(Hs: int, Ws: int, cout: int) -> jax.Array:
    """Zero-mask for the (-1)-aligned activation's pad ring: phase rows
    that correspond to source rows -1 / H (cols -1 / W) — per CHANNEL
    BLOCK, not per phase pixel (row I=0 carries real source row 0 in
    its ph=1 blocks)."""
    blk = jnp.arange(4 * cout) // cout  # [4Co] in 0..3
    ph, pw = blk // 2, blk % 2
    I = jnp.arange(Hs)[:, None, None]
    J = jnp.arange(Ws)[None, :, None]
    bad = (
        ((I == 0) & (ph == 0))
        | ((I == Hs - 1) & (ph == 1))
        | ((J == 0) & (pw == 0))
        | ((J == Ws - 1) & (pw == 1))
    )
    return ~bad  # [Hs, Ws, 4Co] True where real data


def _conv2(x, k, padding, dtype):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, k.shape, ("NHWC", "HWIO", "NHWC")
    )
    return jax.lax.conv_general_dilated(
        x.astype(dtype),
        k.astype(dtype),
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )


def _conv2_q(x, k):
    """w8a8 2x2 conv, QuantConv discipline: per-out-channel weight
    scale from the f32 master, per-SAMPLE dynamic activation scale,
    int32 MXU accumulation, fused dequant epilogue."""
    sw = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-12) / 127.0
    kq = jnp.clip(jnp.round(k / sw), -127, 127).astype(jnp.int8)
    xf = x.astype(jnp.float32)
    sx = (
        jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True), 1e-12)
        / 127.0
    )
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    dn = jax.lax.conv_dimension_numbers(
        xq.shape, kq.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        xq,
        kq,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (sx * sw)


def _stem_folded(variables):
    """(k11, b11, k12, b12): the slice1 conv1_1/conv1_2 kernels with
    their BatchNorms folded (flax tree ``basenet/slice1/{0,1,3,4}``;
    reference layers ``vgg_bn.py:44-47`` torchvision indices 0-4)."""
    p = variables["params"]["basenet"]["slice1"]
    bs = variables["batch_stats"]["basenet"]["slice1"]
    k11, b11 = fold_bn(
        p["0"]["kernel"], p["0"]["bias"],
        p["1"]["scale"], p["1"]["bias"],
        bs["1"]["mean"], bs["1"]["var"],
    )
    k12, b12 = fold_bn(
        p["3"]["kernel"], p["3"]["bias"],
        p["4"]["scale"], p["4"]["bias"],
        bs["4"]["mean"], bs["4"]["var"],
    )
    return k11, b11, k12, b12


@functools.partial(jax.jit, static_argnames=("quant",))
def s2d_conv12_pool(
    variables: dict, x: jax.Array, quant: bool = False
) -> jax.Array:
    """Canvas ``[B, H, W, 3]`` -> pool1 activation ``[B, H/2, W/2, 64]``
    via phase-packed dense 2x2 convs (see module docstring).

    ``quant=True`` runs conv1_2 (the K=1024 x N=256 matmul, ~85% of the
    stem's MACs) in w8a8; conv1_1 stays bf16 (K=48 — lane-starved in
    any precision, and its activations feed the quantizer anyway).
    Output dtype follows ``x``.
    """
    B, H, W, _ = x.shape
    k11, b11, k12, b12 = _stem_folded(variables)
    cdt = jnp.bfloat16 if x.dtype != jnp.float32 else jnp.float32
    K11 = _s2d_kernel4(k11, cdt)  # [4, 4, 3, 256] stride-2 direct form
    K12 = _s2d_kernel(k12, jnp.float32)  # f32 master (quant path scales)
    Hs, Ws = H // 2 + 1, W // 2 + 1

    # conv1_1: stride-2 4x4 over the RAW canvas -> (-1)-aligned
    # [B, Hs, Ws, 256] — the phase packing lives in the kernel's
    # window, so no packed input tensor is ever materialized (the
    # explicit _s2d transpose measured a 4.3 ms copy on device).
    dn = jax.lax.conv_dimension_numbers(
        x.shape, K11.shape, ("NHWC", "HWIO", "NHWC")
    )
    a = jax.lax.conv_general_dilated(
        x.astype(cdt),
        K11,
        window_strides=(2, 2),
        padding=((2, 2), (2, 2)),
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    # bias + ReLU + pad-ring zeroing in ONE fused epilogue: the mask
    # rides as a multiply (conv1_2's SAME-pad ring must be exact zeros,
    # not relu(bias); a jnp.where on the f32 tensor blocked fusion and
    # cost a layout copy on device)
    mask = _ring_mask(Hs, Ws, 64)[None].astype(jnp.float32)
    a = (jnp.maximum(a + jnp.tile(b11, 4), 0.0) * mask).astype(cdt)
    # conv1_2: VALID 2x2 -> 0-aligned [B, H/2, W/2, 256]
    if quant:
        z = _conv2_q(a, K12)
    else:
        z = _conv2(a, K12.astype(cdt), "VALID", cdt)
    z = jnp.maximum(z + jnp.tile(b12, 4), 0.0)
    # pool1 == max over the four 0-aligned phase blocks — as channel
    # SLICE maxes (the [..., 4, 64] reshape+reduce re-tiles the lane
    # dim and cost a ~2 ms copy on device; slices keep the layout)
    z = jnp.maximum(
        jnp.maximum(z[..., 0:64], z[..., 64:128]),
        jnp.maximum(z[..., 128:192], z[..., 192:256]),
    )
    return z.astype(x.dtype)
