"""Row-packed strided convs: dense MXU lanes for channel-poor 3x3 convs.

The v5e MXU is a 128x128 systolic array; a 3x3 conv with Cout in
{16, 32, 64} leaves (128 - Cout) output lanes idle every pass, which is
why XLA sustains only ~6 TFLOP/s on the CRAFT classification head's
32-channel convs and ~33 TFLOP/s on the full-resolution 64-channel
conv1_2 (measured, ``scripts/profile_int8.py``).  Pallas kernels for
these shapes hit Mosaic compile-time limits at production sizes, so the
fix here stays entirely in XLA:

A SAME 3x3 conv producing ``[B, H, W, C]`` equals a strided conv
producing ``G`` consecutive output ROWS as ``G*C`` output CHANNELS:

    y[b, G*t + q, c, o] = rowpacked[b, t, c, q*C + o]

with a ``[G+2, 3, Cin, G*C]`` kernel at stride ``(G, 1)`` whose blocks
are row-shifted copies of the original taps,

    K[u, v, i, q*C + o] = k[u - q, v, i, o]   (zero outside 0 <= u-q < 3),

followed by a reshape/interleave back to ``[B, H, W, C]``.  The packed
conv runs (G+2)/(3*G) x the MACs (the shifted blocks are zero-padded)
but fills G*C output lanes, which is a large net win whenever
G*C >= 128 and C < 128:

    C=64, G=2: 1.33x MACs at ~3x the sustained rate
    C=32, G=4: 2.00x MACs at ~10x the sustained rate
    C=16, G=8: 3.33x MACs, still ~2x net

The arithmetic is identical to the direct conv up to f32 accumulation
order (the extra MACs multiply structural zeros).

Used by the detector's serving path for conv1_2 and the upconv4 +
classification-head tail (reference topology ``ocr/model.py:21-31``,
``ocr/modules/vgg_bn.py:44-47``); tested against direct convs in
``tests/test_rowpack.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_kernel(k: jax.Array, G: int) -> jax.Array:
    """[3, 3, Cin, C] conv kernel -> [G+2, 3, Cin, G*C] row-packed."""
    kh, kw, cin, cout = k.shape
    if kh != 3:
        raise ValueError("pack_kernel expects 3-row kernels")
    blocks = []
    for q in range(G):
        # output row q within the group uses taps u = q-1+0..2
        pad_lo = q
        pad_hi = (G + 2) - 3 - q
        blocks.append(
            jnp.pad(k, ((pad_lo, pad_hi), (0, 0), (0, 0), (0, 0)))
        )
    return jnp.concatenate(blocks, axis=-1)  # [G+2, 3, Cin, G*C]


def conv3x3_rowpacked(
    x: jax.Array,
    k: jax.Array,
    G: int,
    *,
    preferred_dtype=jnp.float32,
) -> jax.Array:
    """SAME 3x3 NHWC conv via the row-packed strided formulation.

    ``x`` [B, H, W, Cin] (H divisible by G), ``k`` [3, 3, Cin, C] ->
    [B, H, W, C] in ``preferred_dtype`` accumulation.
    """
    B, H, W, Cin = x.shape
    C = k.shape[-1]
    if H % G != 0:
        raise ValueError(f"H={H} not divisible by packing G={G}")
    kp = pack_kernel(k, G)
    y = jax.lax.conv_general_dilated(
        x,
        kp.astype(x.dtype),
        window_strides=(G, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_dtype,
    )  # [B, H/G, W, G*C]
    y = y.reshape(B, H // G, W, G, C)
    y = jnp.transpose(y, (0, 1, 3, 2, 4))  # [B, H/G, G, W, C]
    return y.reshape(B, H, W, C)


def pack_kernel_depth(k: jax.Array, G: int) -> jax.Array:
    """[3, 3, Cin, C] -> [3, 3, G*Cin, G*C] for the depth-packed form.

    With rows folded into channels (``x
    [B, H/G, W, G*Cin]``), output row q_out of a group reads input row
    q_in of groups t-1/t/t+1; the (u, q_in, q_out) block is the
    original tap delta = G*(u-1) + q_in - q_out + 1 when 0 <= delta < 3,
    else zero.
    """
    kh, kw, cin, cout = k.shape
    if kh != 3:
        raise ValueError("pack_kernel_depth expects 3-row kernels")
    # traceable construction (k may be a tracer inside jit); the sets
    # are static slices, so XLA folds this into one constant layout
    kp = jnp.zeros((3, kw, G * cin, G * cout), k.dtype)
    for u in range(3):
        for qi in range(G):
            for qo in range(G):
                d = G * (u - 1) + qi - qo + 1
                if 0 <= d < 3:
                    kp = kp.at[
                        u, :, qi * cin : (qi + 1) * cin,
                        qo * cout : (qo + 1) * cout,
                    ].set(k[d])
    return kp


def conv3x3_depthpacked(
    x: jax.Array,
    k: jax.Array,
    G: int,
    *,
    preferred_dtype=jnp.float32,
) -> jax.Array:
    """SAME 3x3 NHWC conv via the depth-packed (rows-as-channels) form.

    ``G`` x the MACs of the direct conv (every (q_in, q_out) block is a
    window over the same taps), but K = G*Cin and N = G*Cout are both
    MXU-dense and the conv is UNstrided — the friendliest possible
    shape for XLA's TPU conv emitter.  Wins whenever the direct conv
    runs below peak/G.
    """
    B, H, W, Cin = x.shape
    C = k.shape[-1]
    if H % G != 0:
        raise ValueError(f"H={H} not divisible by packing G={G}")
    xr = x.reshape(B, H // G, G, W, Cin)
    xr = jnp.transpose(xr, (0, 1, 3, 2, 4)).reshape(B, H // G, W, G * Cin)
    kp = pack_kernel_depth(k, G)
    y = jax.lax.conv_general_dilated(
        xr,
        kp.astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_dtype,
    )  # [B, H/G, W, G*C]
    y = y.reshape(B, H // G, W, G, C)
    y = jnp.transpose(y, (0, 1, 3, 2, 4))
    return y.reshape(B, H, W, C)


def stem_conv_rowpacked(variables: dict, x0: jax.Array) -> jax.Array:
    """conv1_1 activation [B, H, W, 64] -> ReLU(BN(conv1_2(x))), with
    conv1_2 row-packed (G=2 -> 128 output lanes).  XLA counterpart of
    :func:`~lightly_ocr_tpu.ops.pallas_stem.fused_stem_conv`."""
    from lightly_ocr_tpu.ops.pallas_tail import fold_bn

    p = variables["params"]["basenet"]["slice1"]
    bs = variables["batch_stats"]["basenet"]["slice1"]
    k, b = fold_bn(
        p["3"]["kernel"], p["3"]["bias"],
        p["4"]["scale"], p["4"]["bias"],
        bs["4"]["mean"], bs["4"]["var"],
    )
    G = 2 if x0.shape[1] % 2 == 0 else 1
    y = conv3x3_rowpacked(x0, jnp.asarray(k), G)
    return jnp.maximum(y + jnp.asarray(b, jnp.float32), 0.0).astype(x0.dtype)


def tail_scores_rowpacked(variables: dict, y192: jax.Array) -> jax.Array:
    """[B, H2, W2, 192] trunk concat -> [B, H2, W2, 2] score maps.

    The upconv4 3x3 (64->32) and the three 3x3 head convs run
    row-packed (G chosen per channel width); the two 1x1s are plain
    matmuls.  XLA counterpart of
    :func:`~lightly_ocr_tpu.ops.pallas_tail.fused_tail_scores`, same
    folded-BN weight extraction."""
    from lightly_ocr_tpu.ops.pallas_tail import tail_params

    (k1, b1, wa, ba, w0, b0, w2t, b2, w4, b4, w6, b6, w8, b8) = tail_params(
        variables
    )
    B, H2, W2, _ = y192.shape
    x = jax.lax.dot_general(
        y192.astype(jnp.bfloat16), k1,
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    x = jnp.maximum(x + b1[None], 0.0).astype(jnp.bfloat16)

    def unpack(wt, cin):
        # tail_params stores [3*Cin, 3*Cout] packed for the Pallas
        # single-dot conv (K row-tap-major u*C+c, N w-tap-major
        # v*Co+o); recover [3, 3, Cin, Cout] = [u, v, c, o]
        return (
            wt.reshape(3, cin, 3, -1).transpose(0, 2, 1, 3)
        )

    def g_for(cout):
        import os

        force = os.environ.get("LIGHTLY_OCR_ROWPACK_G", "").strip()
        g = int(force) if force else min(max(1, 128 // cout), 8)
        while g > 1 and H2 % g != 0:
            g //= 2
        return g

    def conv_block(x, k, bias):
        y = conv3x3_rowpacked(x, k, g_for(k.shape[-1]))
        return jnp.maximum(y + bias, 0.0).astype(jnp.bfloat16)

    # stage A folds upconv4's BN (tail_params keeps wa unpadded — the
    # Pallas kernel slices its 128-lane slab down to the live 64)
    x = conv_block(x, unpack(wa, 64), ba)
    x = conv_block(x, unpack(w0, 32), b0)
    x = conv_block(x, unpack(w2t, 32), b2)
    x = conv_block(x, unpack(w4, 32), b4)
    e = jnp.maximum(
        jax.lax.dot_general(
            x, w6, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b6,
        0.0,
    ).astype(jnp.bfloat16)
    return (
        jax.lax.dot_general(
            e, w8, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b8
    ).astype(jnp.float32)
