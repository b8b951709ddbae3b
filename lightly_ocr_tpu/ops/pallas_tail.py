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

per slab, writing only the 2-channel score map back to HBM.  Each 3x3
conv is ONE near-dense MXU dot (row taps packed into K=3C, w-taps into
N=3Co, w-shifts applied output-side); HBM traffic drops from ~10
activation round-trips to one read + one (tiny) write.

Parity: reference head semantics at ``ocr/model.py:34-46`` (upconv4 +
conv_cls); numerics tested against the unfused flax modules in
``tests/test_pallas_tail.py`` (interpret mode on CPU) and on hardware
at small shapes (``scripts/check_pallas_tail_hw.py``).

STATUS — ON by default on TPU (disable with
``LIGHTLY_OCR_ENABLE_FUSED=none``).  Where the geometry allows, the
seam path now runs the SEAM-FUSED kernel (:func:`_seam_kernel`: 1x1
pair + 2x bilinear upsample + ReLU in-kernel, clamped pad-free DMA
from the raw trunk tensors — 24.57 -> 20.74 ms device at b16 960x640,
``LIGHTLY_OCR_TAIL_SEAMK=0`` reverts).  The packed-single-dot form
compiles in ~17 s with 128-col blocks and ~57 s at the default
full-width geometry (the earlier per-row-sliced forms blew the remote
compile service's budget outright) and beats the plain flax graph on
device traces: 81.9 vs 83.7 ms detector forward at b16 960x640,
fg-mask bit-identical, score maxdiff 4.3e-4
(``scripts/check_tail_prod_hw.py``).  The serving path consumes the
kernel's native channels-second layout via
:func:`fused_tail_scores_cs`; :func:`fused_tail_scores` is the
channels-last compat wrapper (+3.5 ms moveaxis) for parity tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 4  # four stacked 3x3 convs -> 4 rows/cols of context per side


def _conv3_same(src, wk, bias):
    """SAME 3x3 conv at constant geometry: [S, Wd, C] x [3C, 3Co] ->
    ReLU'd [S, Wd, Co] (f32 acc), Wd 8-aligned.

    The whole 3x3 is ONE near-dense MXU dot; both 3x tap factors ride
    the matmul's K and N dims instead of a 9-dot loop:

    * K = 3C — the three ROW taps are lane-concatenated views of the
      zero-padded slab.  Row slices live on the untiled dim 0, so all
      three operands carry identical (zero) sublane/lane offsets and
      Mosaic's concat restriction ("offset mismatch on non-concat
      dimension", which kills the same trick for w-shifted slices)
      does not apply.
    * N = 3Co — the three W taps are separate output-channel blocks of
      the same dot; the w-shift moves to the OUTPUT side as three
      shifted slice-adds of the f32 result.  A misaligned output slice
      lowers to one in-VMEM realign copy of the (small) stage tensor,
      vs Mosaic's tpu.dynamic_rotate which is unimplemented for 16-bit
      data.

    The previous per-(u,v)-tap form ran 9 dots with K=C<=64, N=Co<=32;
    Mosaic pads both to the 128 MXU tile, so >90% of the systolic array
    computed zeros (measured 0.875x vs plain XLA end-to-end).  The
    packed dot runs K=3C, N=3Co (96..192 lanes) — near-dense tiles.

    The dot runs on the FLATTENED [S'*W', 3C] view — widths are
    8-aligned so the reshape is a layout no-op, and the MXU sees one
    tall matmul rather than S' fragmented per-row matmuls (the
    fragmented form measured ~6x slower than XLA's own conv).
    Zero-pad (not wrap) feeds the taps, so there is no wrap garbage —
    only the slab-ring cells lose true neighbor data, which the halo
    discipline already treats as invalid (see the rezero note in
    ``_tail_kernel``).
    """
    S, Wd, C = src.shape
    Co = wk.shape[-1] // 3
    xp = jnp.pad(src, ((1, 1), (1, 7), (0, 0)))  # cols padded 8-aligned
    Wp = Wd + 8
    # lane-concat of the three ROW taps (dim-0 slices: offset-free)
    xr = jnp.concatenate([xp[u : u + S] for u in range(3)], axis=-1)
    y = jax.lax.dot_general(
        xr.reshape(S * Wp, 3 * C),
        wk,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(S, Wp, 3 * Co)
    # w-taps: out[r, c] += y[r, c+v, v-block]  (xp col c+v = src col
    # c+v-1, i.e. kernel w-tap v of a SAME conv)
    acc = y[:, 0:Wd, 0:Co]
    for v in (1, 2):
        acc = acc + y[:, v : v + Wd, v * Co : (v + 1) * Co]
    out = jnp.maximum(acc + bias.reshape(1, 1, Co), 0.0)
    return out.astype(src.dtype)


def _head_chain(
    x,
    w0_ref, b0_ref, w2_ref, b2_ref, w4_ref, b4_ref,
    w6_ref, b6_ref, w8_ref, b8_ref,
    rezero=lambda t: t,
):
    """conv_cls chain from the 32-ch stage-0 output to the 2-ch scores:
    three packed-dot 3x3s then the two 1x1 head dots, all at constant
    [S, Wd, C] geometry.  Shared by the legacy kernel (which rezeroes
    out-of-image halo cells between stages) and the seam kernel (whose
    clamped DMA makes every slab row a real image row — no mask)."""
    S, Wd, _ = x.shape
    x = rezero(_conv3_same(x, w0_ref[:], b0_ref[:]))      # [S, Wd, 32]
    x = rezero(_conv3_same(x, w2_ref[:], b2_ref[:]))      # [S, Wd, 32]
    x = _conv3_same(x, w4_ref[:], b4_ref[:])              # [S, Wd, 16]
    xf = x.reshape(S * Wd, x.shape[-1])
    e = jnp.maximum(
        jax.lax.dot_general(
            xf, w6_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b6_ref[:].reshape(1, -1),
        0.0,
    ).astype(x.dtype)
    o = (
        jax.lax.dot_general(
            e, w8_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b8_ref[:].reshape(1, -1)
    )
    return o.reshape(S, Wd, 2)


def _emit_extract(o, i, ni, rows, out_ref):
    """Write the valid ``rows`` of the block's output, offset by
    roff = i*rows - st.  With clamped DMA starts roff takes exactly
    three values tied to the block index (0 first / HALO interior /
    2*HALO last); Mosaic has no value-level dynamic_slice, so branch
    on i with static slices."""

    def put(roff):
        oc = o[roff : roff + rows]
        out_ref[0] = jnp.transpose(oc, (0, 2, 1)).astype(out_ref.dtype)

    @pl.when(i == 0)
    def _():
        put(0)

    @pl.when((i > 0) & (i < ni - 1))
    def _():
        put(HALO)

    @pl.when((i == ni - 1) & (ni > 1))
    def _():
        put(2 * HALO)


def _tail_kernel(
    rows, cols, h2, w2,
    xp_hbm,
    wa_ref, ba_ref, w0_ref, b0_ref, w2_ref, b2_ref, w4_ref, b4_ref,
    w6_ref, b6_ref, w8_ref, b8_ref,
    out_ref,
    slabs, sems,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    ni = pl.num_programs(1)
    nj = pl.num_programs(2)
    nsteps = pl.num_programs(0) * ni * nj

    def dma(b_, i_, j_, slot):
        return pltpu.make_async_copy(
            xp_hbm.at[
                b_,
                pl.ds(i_ * rows, rows + 2 * HALO),
                pl.ds(j_ * cols, cols + 2 * HALO),
            ],
            slabs.at[slot],
            sems.at[slot],
        )

    # Double-buffered input DMA across sequential grid steps (scratch
    # persists between steps on TPU): while step k computes on slot k%2,
    # step k+1's slab is already in flight into slot (k+1)%2.  The
    # synchronous start/wait version left every one of the ~5k grid
    # steps stalled on its own copy latency (measured 0.47x vs XLA —
    # BENCH.md round 2); prefetching hides it behind the conv chain.
    k = (b * ni + i) * nj + j
    slot = jax.lax.rem(k, 2)

    @pl.when(k == 0)
    def _():
        dma(b, i, j, slot).start()

    @pl.when(k + 1 < nsteps)
    def _():
        kn = k + 1
        bn = kn // (ni * nj)
        rn = jax.lax.rem(kn, ni * nj)
        dma(bn, rn // nj, jax.lax.rem(rn, nj), jax.lax.rem(kn, 2)).start()

    dma(b, i, j, slot).wait()
    S = rows + 2 * HALO
    Wd = cols + 2 * HALO
    slab = slabs[slot]  # [S, Wd, 128]

    def rezero(t):
        """Zero positions outside the true image: stacked SAME convs pad
        each INTERMEDIATE with zeros, so virtual halo cells must read 0,
        not conv(0)=relu(bias).  Constant-geometry stages keep slab
        (r, c) -> image (i*rows + r - HALO, j*cols + c - HALO) fixed, so
        one mask serves every stage.  Slab-RING cells (within HALO of
        the slab edge but inside the image) accumulate roll-wrap garbage
        instead: a cell at ring distance d is valid after stage k iff
        d >= k, the final extract keeps only d >= HALO — finite garbage,
        never read.  Also zeroes the right-padding columns past w2 (the
        col grid pads W/2 up to a cols multiple)."""
        # 3D iotas: Mosaic cannot insert a minor dim on sub-32-bit types
        # (bf16 `ok[..., None]` fails to compile), so build the mask at
        # the value's full rank directly.
        r_img = (
            jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
            + i * rows - HALO
        )
        c_img = (
            jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            + j * cols - HALO
        )
        ok = (r_img >= 0) & (r_img < h2) & (c_img >= 0) & (c_img < w2)
        return jnp.where(ok, t, jnp.zeros_like(t))

    # stage A contracts the REAL 64 input channels (lanes 64:128 of the
    # DMA-aligned slab are zero padding; slicing them off halves the
    # stage-A MXU passes)
    x = rezero(_conv3_same(slab[:, :, 0:64], wa_ref[:], ba_ref[:]))
    o = _head_chain(
        x, w0_ref, b0_ref, w2_ref, b2_ref, w4_ref, b4_ref,
        w6_ref, b6_ref, w8_ref, b8_ref, rezero=rezero,
    )
    oc = o[HALO : HALO + rows, HALO : HALO + cols]
    # channels-SECOND output: a [rows, 2, cols] block keeps the lane
    # dim 128-dense (cols); a [.., cols, 2] block lane-pads 2 -> 128
    # and the staging of that 64x-padded buffer blows the 16 MB scoped
    # VMEM limit at production shapes.
    out_ref[0] = jnp.transpose(oc, (0, 2, 1)).astype(out_ref.dtype)


def _seam_kernel(
    rows, h2, w2,
    t_hbm, ya_hbm,
    k1b_ref, b1_ref,
    wa_ref, ba_ref, w0_ref, b0_ref, w2_ref, b2_ref, w4_ref, b4_ref,
    w6_ref, b6_ref, w8_ref, b8_ref,
    out_ref,
    tslabs, yslabs, yaup_s, tsems, ysems,
):
    """Seam-fused tail: the upconv4 1x1 pair, the 2x bilinear upsample
    and the bias/ReLU all run IN the kernel, so the only XLA-side work
    left is the quarter-res y-dot (its N is zero-padded to 128 lanes,
    which fuses the lane pad into the dot's own output write).  The
    slab DMAs source the raw trunk tensors with CLAMPED row starts
    (dims 0/1 of a 4D HBM memref are untiled — dynamic starts carry no
    alignment constraint), and the slab carries NO W halo: with a
    single full-width col block the W halo is pure zero padding that
    ``_conv3_same``'s internal pad already provides.  Consequences vs
    the legacy ``_tail_kernel`` (device A/B at b16 960x640,
    ``scripts/check_tail_seamk_hw.py``): the halo+channel pad copy,
    the upsample fusion and the xs relu round-trip all disappear —
    24.57 -> 20.74 ms, fg-mask flips 0 of 2.4M, maxdiff 6.5e-4.

    No rezero mask: every slab row is a real image row, and slab edges
    coincide with image edges exactly where zero padding is correct;
    interior-edge ring garbage is excluded by the extraction
    discipline (first/interior/last block offsets 0/HALO/2*HALO).

    Upsample semantics match ``jax.image.resize(..., "bilinear")`` at
    scale 2 (half-pixel centers): even output j = 0.25*in[j/2-1] +
    0.75*in[j/2], odd j = 0.75 / 0.25, edges clamped — exact on CPU
    interpret, f32-reassociation-level on TPU.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    nsteps = pl.num_programs(0) * ni
    S = rows + 2 * HALO
    SY = S // 2 + 2
    h4, w4 = h2 // 2, w2 // 2

    def st_of(i_):
        return jnp.clip(i_ * rows - HALO, 0, h2 - S)

    def sy_of(i_):
        return jnp.clip(st_of(i_) // 2 - 1, 0, h4 - SY)

    def dma_t(b_, i_, slot):
        return pltpu.make_async_copy(
            t_hbm.at[b_, pl.ds(st_of(i_), S)], tslabs.at[slot],
            tsems.at[slot],
        )

    def dma_y(b_, i_, slot):
        return pltpu.make_async_copy(
            ya_hbm.at[b_, pl.ds(sy_of(i_), SY)], yslabs.at[slot],
            ysems.at[slot],
        )

    k = b * ni + i
    slot = jax.lax.rem(k, 2)

    @pl.when(k == 0)
    def _():
        dma_t(b, i, slot).start()
        dma_y(b, i, slot).start()

    @pl.when(k + 1 < nsteps)
    def _():
        kn = k + 1
        bn, in_, sl = kn // ni, jax.lax.rem(kn, ni), jax.lax.rem(kn, 2)
        dma_t(bn, in_, sl).start()
        dma_y(bn, in_, sl).start()

    dma_t(b, i, slot).wait()
    dma_y(b, i, slot).wait()

    # --- y path: W-upsample at SY rows, then H-interleave -------------
    ys = yslabs[slot][:, :, 0:64].astype(jnp.float32)  # [SY, w4, 64]
    ypw = jnp.pad(ys, ((0, 0), (1, 7), (0, 0)))
    pc_ = ypw[:, 0:w4]
    cc_ = ypw[:, 1 : 1 + w4]
    nc_ = ypw[:, 2 : 2 + w4]
    c_idx = jax.lax.broadcasted_iota(jnp.int32, cc_.shape, 1)
    ew = jnp.where(c_idx == 0, cc_, 0.25 * pc_ + 0.75 * cc_)
    ow = jnp.where(c_idx == w4 - 1, cc_, 0.75 * cc_ + 0.25 * nc_)
    # sublane-pair MERGE: [SY, w4, 2, 64] -> [SY, 2*w4, 64] (the
    # inverse of the pool kernels' proven sublane-pair split)
    yw = jnp.stack([ew, ow], axis=2).reshape(SY, 2 * w4, 64)
    # H taps with edge duplication baked into the extended slab.
    # d = st//2 - sy takes exactly three values tied to the block
    # index (0 first / 1 interior / 2 last); no value-level
    # dynamic_slice in Mosaic, so branch with static slices through
    # the yaup scratch.
    ye = jnp.concatenate([yw[0:1], yw, yw[SY - 1 : SY]], axis=0)

    def hmix(dd):
        prev = ye[dd : dd + S // 2]
        cur = ye[dd + 1 : dd + 1 + S // 2]
        nxt = ye[dd + 2 : dd + 2 + S // 2]
        eh = 0.25 * prev + 0.75 * cur
        oh = 0.75 * cur + 0.25 * nxt
        yaup_s[:] = jnp.stack([eh, oh], axis=1).reshape(S, 2 * w4, 64)

    @pl.when(i == 0)
    def _():
        hmix(0)

    @pl.when((i > 0) & (i < ni - 1))
    def _():
        hmix(1)

    @pl.when((i == ni - 1) & (ni > 1))
    def _():
        hmix(2)

    # --- t path: the skip half of the seam 1x1 (K=128 dot) ------------
    tf = tslabs[slot].reshape(S * w2, 128)
    yb = jax.lax.dot_general(
        tf, k1b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(S, w2, 64)

    xs = jnp.maximum(
        yaup_s[:] + yb + b1_ref[:].reshape(1, 1, -1), 0.0
    ).astype(jnp.bfloat16)
    x = _conv3_same(xs, wa_ref[:], ba_ref[:])
    o = _head_chain(
        x, w0_ref, b0_ref, w2_ref, b2_ref, w4_ref, b4_ref,
        w6_ref, b6_ref, w8_ref, b8_ref,
    )
    _emit_extract(o, i, ni, rows, out_ref)


def fold_bn(kernel, bias, scale, shift, mean, var, eps=1e-5):
    """conv(+bias) -> BN  ==  conv with folded kernel/bias (inference).

    Shared by the Pallas and rowpack serving paths — keep the single
    copy here."""
    s = scale / jnp.sqrt(var + eps)
    return kernel * s, (bias - mean) * s + shift


def _wtap(kernel):
    """[3, 3, C, Co] float kernel -> bf16 [3C, 3Co] packed for the
    single-dot conv: K is row-tap-major (u*C + c), N is w-tap-major
    (v*Co + o) — matching ``_conv3_same``'s lane-concat of row taps on
    K and shifted output-block accumulation on N."""
    k = jnp.asarray(kernel, jnp.float32)
    u3, v3, C, Co = k.shape
    return (
        k.transpose(0, 2, 1, 3).reshape(u3 * C, v3 * Co).astype(jnp.bfloat16)
    )


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
    # Larger row blocks amortize the fixed 2*HALO halo rows (rows=8
    # recomputes 2x the output volume, rows=48 1.17x, rows=120 1.067x).
    # The flattened-dot kernel body is a fixed op count, so Mosaic
    # compile cost no longer scales with the slab volume the way the
    # old per-row-sliced form did — but it DOES scale with the unrolled
    # body volume, which bounds how high rows can go.  Device sweep at
    # b16 480x320 (scripts/check_tail_rows_hw.py, all outputs
    # bit-identical): rows=48 29.25 ms / 96 28.17 / 120 27.97 /
    # 160 27.77; Mosaic compile 58 s / 155 s / 262 s / 521 s.  120 is
    # the default — 160's extra −0.2 ms costs 8.7 min on every
    # cache-miss recompile through the tunnel.
    for r in (120, 96, 48, 40, 24, 16, 8, 4):
        if h2 % r == 0:
            return r
    return 0


_SEAM_VMEM_BUDGET = 110 * 1024 * 1024  # == vmem_limit_bytes at pallas_call


def _seam_vmem_bytes(rows: int, w2: int) -> int:
    """Modeled VMEM footprint of one ``_seam_kernel`` grid step.

    Calibrated against two device anchors at W2=320
    (``scripts/check_tail_seamk_hw.py``): rows=96 fits at ~103 MB of
    the 110 MB budget; rows=120 overflows it by 16.8 MB (~126.8 MB).
    Component analysis: the double-buffered t-slabs (2 slots x 128
    lanes x 2 B = 512 B/cell), the yaup scratch (256 B/cell) and
    Mosaic's live conv temporaries (the xr lane-concat, packed-dot
    f32 outputs and stage tensors of ``_conv3_same``/``_head_chain``)
    together measure ~2980 B per S*W2 slab cell at BOTH anchors
    (solving the two-point system gives 2979/2982); the y-slabs add
    exactly 1024 B per SY*(W2/2) cell.  3000 B/cell keeps ~0.7%
    margin.  This replaces the earlier magic ``S*w2 <= 104*328`` cap
    and scales the row choice to any canvas width instead of only the
    measured one."""
    S = rows + 2 * HALO
    SY = S // 2 + 2
    return 3000 * S * w2 + 1024 * SY * (w2 // 2)


def _pick_rows_seam(h2: int, w2: int) -> int:
    """Row split for the seam-fused kernel (clamped DMA, no W halo).

    Requirements: even geometry (clamped starts stay even so the
    in-kernel upsample parity is per-block-constant), w2 a multiple of
    16 (slab and y-slab sublane extents 8-aligned), >=2 row blocks,
    and two invariants of the kernel's static-offset branches:

    * ``rows >= 6`` — interior blocks (0 < i < ni-1) assume UNCLAMPED
      starts: ``hmix(1)`` needs ``sy = st//2 - 1 >= 0`` at i=1, i.e.
      ``rows - HALO >= 2``;
    * ``h2 >= S + 4`` — the y-slab DMA reads SY = S//2 + 2 rows from
      the H/4 tensor, so ``h4 >= SY``; this also pins the last block's
      ``hmix(2)`` offset exactly.

    The slab volume is bounded by the calibrated VMEM model
    (:func:`_seam_vmem_bytes`) instead of a fixed-shape cap.  Returns
    0 when unsupported — callers fall back to the legacy pad+kernel
    path (and log why, see :func:`fused_tail_scores_cs_seam`)."""
    if h2 % 2 or w2 % 2 or w2 % 16:
        return 0
    r = _env_int("LIGHTLY_OCR_TAIL_SEAM_ROWS")
    if r is not None:
        cands = (r,)
    else:
        # Every even divisor of h2 >= 6, largest first: bigger row
        # blocks amortize the fixed 2*HALO halo (the rows device
        # sweep), and non-power-of-two heights (canvas 928 -> h2=464
        # -> rows=58) must not fall back to the slower legacy pad path
        # just because a fixed candidate list missed their divisors.
        # The start is rounded DOWN TO EVEN (h2 % 4 == 2 makes h2//2
        # odd, which would skip every even divisor); the floor of 6 is
        # the interior-block invariant above.
        start = h2 // 2 - (h2 // 2) % 2
        cands = tuple(d for d in range(start, 5, -2) if h2 % d == 0)
    for rows in cands:
        if rows < 6 or rows % 2 or h2 % rows:
            continue
        S = rows + 2 * HALO
        if (
            h2 >= S + 4
            and h2 // rows >= 2
            and _seam_vmem_bytes(rows, w2) <= _SEAM_VMEM_BUDGET
        ):
            return rows
    return 0


def _scores_from_seam(variables, y_lo, t, rows, interpret):
    """Seam-kernel front half: ONE quarter-res XLA dot (N zero-padded
    to 128 so the lane pad fuses into the dot's own write), then
    everything else — the skip-half 1x1, the 2x bilinear upsample,
    bias/ReLU and the head chain — runs inside :func:`_seam_kernel`.
    Raw ``t`` is DMA'd directly from the trunk's output buffer."""
    B, H2, W2, _ = t.shape
    S = rows + 2 * HALO
    SY = S // 2 + 2
    (k1, b1, wa, ba, w0, b0, w2_, b2, w4_, b4, w6, b6, w8, b8) = tail_params(
        variables
    )
    k1a = jnp.pad(k1[:64], ((0, 0), (0, 64)))
    ya = jax.lax.dot_general(
        y_lo.astype(jnp.bfloat16), k1a, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    kernel = functools.partial(_seam_kernel, rows, H2, W2)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B, H2 // rows),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2 + [wspec] * 14,
        out_specs=pl.BlockSpec(
            (1, rows, 2, W2), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H2, 2, W2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, S, W2, 128), jnp.bfloat16),
            pltpu.VMEM((2, SY, W2 // 2, 128), jnp.float32),
            pltpu.VMEM((S, W2, 64), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        t.astype(jnp.bfloat16), ya, k1[64:], b1,
        wa, ba, w0, b0, w2_, b2, w4_, b4, w6, b6, w8, b8,
    )


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
    # 3x3 (64->32) + BN folded — stage A of the kernel.  The kernel
    # slices the DMA-aligned 128-lane slab down to the real 64 input
    # channels before contracting, so the weights stay unpadded.
    ka, ba = fold_bn(
        pc["3"]["kernel"], pc["3"]["bias"],
        pc["4"]["scale"], pc["4"]["bias"],
        bc["4"]["mean"], bc["4"]["var"],
    )
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
def fused_tail_scores_cs(
    variables: dict, y192: jax.Array, interpret: bool = False
) -> jax.Array:
    """[B, H2, W2, 192] trunk activation -> CHANNELS-SECOND
    [B, H2, 2, W2P] f32 score maps.  W2P = W2 padded up to the
    col-block multiple (equal to W2 at the default full-width
    geometry); pad columns carry bias-propagated garbage, NOT zeros —
    the rezero mask protects the conv stages' numerics inside the
    valid region but the head's output over out-of-image columns is
    conv-of-zeros (relu(bias) chains), so callers MUST slice
    ``[..., :W2]`` before thresholding.

    This is the kernel's native output layout — a [rows, 2, cols]
    block keeps the lane dim 128-dense.  Returning it directly lets
    the caller slice ``y[:, :, 0, :W2]`` / ``y[:, :, 1, :W2]`` (views
    that fuse into downstream thresholding); the channels-last
    ``moveaxis`` the compat wrapper pays is a 471 MB f32 transpose
    that measured 3.5 ms on device — the single largest op of the
    fused path.

    ``y192`` is the H/2-resolution concat of the upsampled upconv3
    output and slice1 (see :class:`~lightly_ocr_tpu.models.vgg_unet.
    VGG_UNetTrunk`).  Raises if H2 has no usable row split — callers
    gate on :func:`fused_tail_supported`.
    """
    B, H2, W2, _ = y192.shape
    rows = _pick_rows(H2)
    if rows == 0:
        raise ValueError(f"fused tail: H/2={H2} not divisible by 4")
    # Col blocking: FULL-WIDTH slabs when W2 <= 384 — no W2P padding
    # (the 128-block grid pads 320 -> 384 and wastes 20% of the tail
    # compute; full-width measured 19.31 vs 20.92 ms at 480x320) and
    # the out BlockSpec's lane dim equals the full array dim, which
    # Mosaic accepts at any width.  Mosaic compile cost scales with
    # the kernel BODY volume (slab width x unrolled stages): full
    # width at 320 compiles in ~57 s; wider canvases fall back to
    # 128-col blocks to stay inside the remote compile budget.
    cols = min(_env_int("LIGHTLY_OCR_TAIL_COLS",
                        W2 if W2 <= 384 else 128), W2)
    W2P = -(-W2 // cols) * cols
    (k1, b1, wa, ba, w0, b0, w2, b2, w4, b4, w6, b6, w8, b8) = tail_params(
        variables
    )

    # upconv4 1x1 + BN + ReLU in XLA (K=192 matmul, MXU-friendly),
    # then an explicit zero pad: halo rings + channels 64 -> 128.  A
    # padded ``conv_general_dilated`` emitting the slab in one op was
    # tried and measured WORSE (XLA lowers it as pad+conv+epilogue,
    # 11.5 ms vs 4.8 ms for this dot-then-pad chain on device).
    x = jax.lax.dot_general(
        y192.astype(jnp.bfloat16), k1,
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    x = jnp.maximum(x + b1[None], 0.0).astype(jnp.bfloat16)
    return _scores_from_x(
        x, rows, cols, W2P,
        (wa, ba, w0, b0, w2, b2, w4, b4, w6, b6, w8, b8),
        interpret,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_tail_scores_cs_seam(
    variables: dict,
    y_lo: jax.Array,
    t: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Seam-split tail: consumes the trunk's PRE-concat pair instead of
    the materialized 192-channel activation.

    ``y_lo`` is upconv3's output ([B, H/4, W/4, 64]) and ``t`` is the
    slice1 skip ([B, H/2, W/2, 128]) — see
    :class:`~lightly_ocr_tpu.models.vgg_unet.VGG_UNetTrunk` with
    ``seam=True``.  upconv4's 1x1 and the bilinear upsample are both
    linear, so

        conv1x1(concat([up(y_lo), t])) == up(conv1x1_a(y_lo)) +
                                          conv1x1_b(t)

    exactly (``k1`` split on its input dim).  The rewrite (vs
    :func:`fused_tail_scores_cs` fed by the concat trunk):

    * the 192-channel H/2 concat (943 MB bf16 at b16 960x640) is never
      written or re-read;
    * the y-half of the 1x1 contracts at H/4 — 4x fewer pixels;
    * the upsample moves the 64-ch f32 dot RESULT instead of the bf16
      activation (exact commutation; the f32 ride keeps the only
      reordering rounding-free until the shared +bias/ReLU/cast).

    Output layout/contract identical to :func:`fused_tail_scores_cs`
    (channels-second, ``[..., :W2]`` slice mandatory).
    """
    from lightly_ocr_tpu.models.vgg_unet import _upsample_to

    import logging
    import os

    log = logging.getLogger(__name__)
    B, H2, W2, _ = t.shape
    rows = _pick_rows(H2)
    if rows == 0:
        raise ValueError(f"fused tail: H/2={H2} not divisible by 4")
    # Preferred form: the seam-fused kernel (1x1 pair + upsample +
    # ReLU in-kernel, clamped DMA from the raw trunk tensors — see
    # :func:`_seam_kernel`; device A/B 24.57 -> 20.74 ms at b16
    # 960x640).  The kernel is always full-width (no col grid) — the
    # VMEM model in :func:`_pick_rows_seam` scales the row split down
    # on wide canvases, so the gate is geometry, not width.
    # LIGHTLY_OCR_TAIL_SEAMK=0 forces the legacy pad+kernel path.
    if os.environ.get("LIGHTLY_OCR_TAIL_SEAMK", "1") == "0":
        log.info("seam kernel fallback: LIGHTLY_OCR_TAIL_SEAMK=0")
    elif y_lo.shape[1] != H2 // 2 or y_lo.shape[2] != W2 // 2:
        log.info(
            "seam kernel fallback: y_lo %s is not half-res of t %s",
            y_lo.shape, t.shape,
        )
    else:
        rows_sk = _pick_rows_seam(H2, W2)
        if rows_sk:
            return _scores_from_seam(variables, y_lo, t, rows_sk, interpret)
        log.info(
            "seam kernel fallback: no row split for H/2=%d W/2=%d "
            "(needs even dims, W/2 %% 16 == 0, an even divisor >= 6 "
            "with >= 2 blocks, H/2 >= rows + 12, and modeled VMEM "
            "<= %d MB — see _pick_rows_seam)",
            H2, W2, _SEAM_VMEM_BUDGET // (1024 * 1024),
        )
    cols = min(_env_int("LIGHTLY_OCR_TAIL_COLS",
                        W2 if W2 <= 384 else 128), W2)
    W2P = -(-W2 // cols) * cols
    (k1, b1, wa, ba, w0, b0, w2, b2, w4, b4, w6, b6, w8, b8) = tail_params(
        variables
    )
    ya = jax.lax.dot_general(
        y_lo.astype(jnp.bfloat16), k1[:64],
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ya = _upsample_to(ya, H2, W2)
    yb = jax.lax.dot_general(
        t.astype(jnp.bfloat16), k1[64:],
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    x = jnp.maximum(ya + yb + b1[None], 0.0).astype(jnp.bfloat16)
    return _scores_from_x(
        x, rows, cols, W2P,
        (wa, ba, w0, b0, w2, b2, w4, b4, w6, b6, w8, b8),
        interpret,
    )


def _scores_from_x(x, rows, cols, W2P, wts, interpret):
    """Shared back half: pad the 64-ch H/2 activation (halo rings +
    channels 64 -> 128 — the HBM buffer is lane-padded to 128 anyway,
    and an explicit full-width channel dim keeps the slab DMA
    tile-aligned; Mosaic rejects a 64-wide slice of a 128-lane tile)
    and run the fused slab kernel."""
    B, H2, W2, _ = x.shape
    xp = jnp.pad(
        x,
        ((0, 0), (HALO, HALO), (HALO, HALO + (W2P - W2)), (0, 64)),
    )

    (wa, ba, w0, b0, w2, b2, w4, b4, w6, b6, w8, b8) = wts
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
                (2, rows + 2 * HALO, cols + 2 * HALO, 128), jnp.bfloat16
            ),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # the compiler's default 16 MB scoped-vmem budget rejects the
        # kernel at production shapes (v5e has 128 MB VMEM; measured
        # need ~40 MB of scoped stack).  All grid dims must run
        # sequentially on one core: the double-buffered slab scratch
        # carries state from step k to k+1.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, wa, ba, w0, b0, w2, b2, w4, b4, w6, b6, w8, b8)
    return y


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_tail_scores(
    variables: dict, y192: jax.Array, interpret: bool = False
) -> jax.Array:
    """Channels-LAST compat wrapper: [B, H2, W2, 192] -> [B, H2, W2, 2].

    Matches the plain ``VGG_UNet`` head output layout for parity tests
    and A/B scripts.  The serving path uses
    :func:`fused_tail_scores_cs` instead — the ``moveaxis`` here is a
    471 MB f32 device transpose (~3.5 ms) that production avoids by
    slicing the channels-second layout directly.
    """
    W2 = y192.shape[2]
    y = fused_tail_scores_cs(variables, y192, interpret=interpret)
    return jnp.moveaxis(y, 2, 3)[:, :, :W2]


def fused_tail_supported(h2: int) -> bool:
    return _pick_rows(h2) != 0
