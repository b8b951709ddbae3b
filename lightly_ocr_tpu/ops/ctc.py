"""CTC loss and greedy decoding as jitted XLA programs.

The reference trains with cuDNN/native ``torch.nn.CTCLoss(zero_infinity=
True)`` (``ocr/train/crnn.py:114``) — notably having to *disable* cudnn
around the call (``crnn.py:255-258``).  This is a from-scratch log-semiring
forward recursion as a single ``lax.scan`` over time: static shapes, no
host sync, differentiable via autodiff of logsumexp (which reproduces the
classic alpha-beta gradient).

Conventions (match the converters / torch):
* class 0 is the blank;
* ``labels`` are padded [B, L] int32 (padding value irrelevant, masked by
  ``label_lengths``);
* ``log_probs`` are [B, T, C] log-softmax outputs;
* reduction follows torch: 'mean' divides each sample's loss by its target
  length, then averages over the batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1.0e30  # safe -inf stand-in: keeps logsumexp NaN-free under jit


def _logsumexp2(a: jax.Array, b: jax.Array) -> jax.Array:
    # NaN-safe under autodiff: when both args are ~-inf the exp-sum is 0 and
    # d(log s)/da would be 0/0, so the sum is replaced by 1 in that branch
    # (its gradient contribution is exactly 0 anyway).
    m = jnp.maximum(a, b)
    finite = m > 0.5 * _NEG_INF
    m_safe = jnp.where(finite, m, 0.0)
    s = jnp.exp(a - m_safe) + jnp.exp(b - m_safe)
    s = jnp.where(finite, s, 1.0)
    return jnp.where(finite, m_safe + jnp.log(s), _NEG_INF)


def _logsumexp3(a, b, c):
    return _logsumexp2(_logsumexp2(a, b), c)


def ctc_forward_logprob(
    log_probs: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
) -> jax.Array:
    """Per-sample log P(labels | log_probs); [B]."""
    B, T, C = log_probs.shape
    L = labels.shape[1]
    S = 2 * L + 1

    # Extended label sequence: blank, l1, blank, l2, ..., blank  [B, S]
    ext = jnp.zeros((B, S), dtype=labels.dtype)
    ext = ext.at[:, 1::2].set(labels)

    # Positions beyond 2*label_len are invalid.
    pos = jnp.arange(S)[None, :]
    valid = pos <= 2 * label_lengths[:, None]

    # Can we skip from s-2 to s?  Only onto a non-blank that differs from
    # the previous non-blank.
    ext_shift2 = jnp.pad(ext, ((0, 0), (2, 0)))[:, :S]
    can_skip = (pos % 2 == 1) & (ext != ext_shift2) & (pos >= 2)

    # Emission log-probs per extended position, per time: gather [B, T, S]
    emit = jnp.take_along_axis(
        log_probs, jnp.broadcast_to(ext[:, None, :], (B, T, S)), axis=2
    )

    init = jnp.full((B, S), _NEG_INF)
    init = init.at[:, 0].set(emit[:, 0, 0])
    init = init.at[:, 1].set(jnp.where(label_lengths > 0, emit[:, 0, 1], _NEG_INF))
    init = jnp.where(valid, init, _NEG_INF)

    def step(alpha, t):
        a1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=_NEG_INF)[:, :S]
        a2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=_NEG_INF)[:, :S]
        a2 = jnp.where(can_skip, a2, _NEG_INF)
        new = _logsumexp3(alpha, a1, a2) + emit[:, t, :]
        new = jnp.where(valid, new, _NEG_INF)
        # Freeze once past this sample's input length.
        new = jnp.where((t < input_lengths)[:, None], new, alpha)
        return new, None

    alpha, _ = jax.lax.scan(step, init, jnp.arange(1, T))

    # Terminal states: ext positions 2*label_len (blank) and 2*label_len-1.
    idx_blank = 2 * label_lengths
    idx_last = jnp.maximum(2 * label_lengths - 1, 0)
    a_blank = jnp.take_along_axis(alpha, idx_blank[:, None], axis=1)[:, 0]
    a_last = jnp.take_along_axis(alpha, idx_last[:, None], axis=1)[:, 0]
    a_last = jnp.where(label_lengths > 0, a_last, _NEG_INF)
    return _logsumexp2(a_blank, a_last)


def ctc_loss(
    log_probs: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    reduction: str = "mean",
    zero_infinity: bool = True,
) -> jax.Array:
    """Negative log-likelihood CTC loss, torch-compatible semantics."""
    nll = -ctc_forward_logprob(log_probs, labels, input_lengths, label_lengths)
    if zero_infinity:
        nll = jnp.where(nll >= -_NEG_INF * 0.5, 0.0, nll)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        denom = jnp.maximum(label_lengths, 1).astype(nll.dtype)
        return jnp.mean(nll / denom)
    raise ValueError(f"unknown reduction {reduction!r}")


def ctc_greedy_decode(
    logits: jax.Array, blank: int = 0
) -> tuple[jax.Array, jax.Array]:
    """Greedy (best-path) decode on device.

    [B, T, C] logits -> ([B, T] class indices with repeats/blanks collapsed
    and left-packed, [B] decoded lengths).  Collapsing is done with a
    vectorized keep-mask + stable sort instead of a per-sample host loop
    (the reference decodes on host, ``net.py:165-167``).
    """
    idx = jnp.argmax(logits, axis=2)  # [B, T]
    prev = jnp.pad(idx, ((0, 0), (1, 0)), constant_values=blank)[:, :-1]
    keep = (idx != blank) & (idx != prev)
    # Left-pack kept entries: order by (not kept, position).
    order = jnp.argsort(jnp.where(keep, 0, 1), axis=1, stable=True)
    packed = jnp.take_along_axis(jnp.where(keep, idx, blank), order, axis=1)
    lengths = jnp.sum(keep, axis=1)
    t_pos = jnp.arange(idx.shape[1])[None, :]
    packed = jnp.where(t_pos < lengths[:, None], packed, blank)
    return packed, lengths


def ctc_beam_search_decode(
    logits: jax.Array,
    beam_width: int = 8,
    blank: int = 0,
    lm: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """CTC prefix beam search, fully on device (static shapes).

    [B, T, C] logits -> (labels [B, W, T] int32 blank-padded,
    lengths [B, W], scores [B, W] = log P(label sequence | input),
    i.e. the posterior summed over ALL alignments of each prefix) —
    beams sorted best-first.  ``exp(scores[:, 0])`` is a calibrated
    sequence confidence, unlike the greedy path's cumprod of per-frame
    maxima (reference: ``ocr/net.py:190``).

    Beyond-parity: the reference only greedy-decodes CTC output
    (``ocr/net.py:165-167``).  This is the standard prefix beam search
    (Hannun et al. 2014) re-shaped for TPU: one ``lax.scan`` over T;
    per step the W stay-candidates and W*C extend-candidates are
    deduplicated by a rolling polynomial hash of the prefix via
    sort + segmented logsumexp (no dynamic dictionaries), then
    ``top_k`` keeps W.  All shapes static; vmapped over the batch.

    Prefix identity is a PAIR of independent 32-bit rolling hashes
    (P=1000003 / P=1000033, distinct seeds) carried as two sort keys —
    effectively one 64-bit hash.  A single uint32 key is not enough:
    with ~300 live candidates/step over 26 steps the pairwise birthday
    bound is ~1e-4 per crop, i.e. a spurious prefix merge every couple
    of seconds at production crop rates.  At 64 bits the bound drops
    to ~1e-14 per crop.

    ``lm`` (optional): shallow-fusion character-transition log-prior,
    shape [C, C]; ``lm[p, c]`` is added once when a prefix whose last
    label is ``p`` extends with label ``c`` (row 0 = beginning-of-word:
    blank never occurs inside a prefix, and the empty prefix maps to
    row 0).  Fold any fusion weight into the matrix.  With a prior the
    returned scores are FUSED scores (acoustic + prior), not pure
    posteriors — pass e.g. a digit-heavy receipt prior here.
    """
    if blank != 0:
        raise ValueError("blank must be class 0 (converter convention)")
    W = int(beam_width)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if lm is not None:
        C = logits.shape[-1]
        lm = jnp.asarray(lm, jnp.float32)
        if lm.shape != (C, C):
            raise ValueError(f"lm must be [C, C] = {(C, C)}, got {lm.shape}")

    def single(lp_seq):  # [T, C]
        T, C = lp_seq.shape
        P = jnp.uint32(1000003)
        P2 = jnp.uint32(1000033)

        prefixes = jnp.zeros((W, T), jnp.int32)
        lengths = jnp.zeros((W,), jnp.int32)
        # Live beam 0 = empty prefix (hash seeds 1 / 2); dead beams get
        # unique junk hashes so they can never merge with live ones.
        hashes = jnp.where(
            jnp.arange(W) == 0,
            jnp.uint32(1),
            jnp.uint32(0x9E3779B9) * jnp.arange(W, dtype=jnp.uint32)
            + jnp.uint32(12345),
        )
        hashes2 = jnp.where(
            jnp.arange(W) == 0,
            jnp.uint32(2),
            jnp.uint32(0x27D4EB2F) * jnp.arange(W, dtype=jnp.uint32)
            + jnp.uint32(54321),
        )
        last = jnp.full((W,), -1, jnp.int32)
        lp_b = jnp.full((W,), _NEG_INF, jnp.float32).at[0].set(0.0)
        lp_nb = jnp.full((W,), _NEG_INF, jnp.float32)

        cls = jnp.arange(C)

        def step(state, lp_t):
            prefixes, lengths, hashes, hashes2, last, lp_b, lp_nb = state
            total = _logsumexp2(lp_b, lp_nb)  # [W]

            # Stay candidates: prefix unchanged.  Ends-blank from any
            # path + blank; ends-nonblank from repeat-collapse of the
            # prefix's own last char (empty prefix has none).
            stay_b = total + lp_t[blank]
            stay_nb = jnp.where(
                last >= 0,
                lp_nb + lp_t[jnp.maximum(last, 0)],
                _NEG_INF,
            )

            # Extend candidates: prefix + c (c != blank), ends
            # nonblank.  Extending with the same char as ``last``
            # requires an intervening blank, so only lp_b feeds it.
            base = jnp.where(
                cls[None, :] == last[:, None], lp_b[:, None], total[:, None]
            )
            ext = base + lp_t[None, :]  # [W, C]
            if lm is not None:
                # shallow fusion: transition prior paid once per
                # extension (stay candidates add no new char)
                ext = ext + lm[jnp.maximum(last, 0)]
            ext = jnp.where(cls[None, :] == blank, _NEG_INF, ext)

            # Flatten candidates: W stays then W*C extends.
            cand_hash = jnp.concatenate(
                [
                    hashes,
                    (
                        hashes[:, None] * P
                        + cls[None, :].astype(jnp.uint32)
                        + jnp.uint32(1)
                    ).reshape(-1),
                ]
            )
            cand_hash2 = jnp.concatenate(
                [
                    hashes2,
                    (
                        hashes2[:, None] * P2
                        + cls[None, :].astype(jnp.uint32)
                        + jnp.uint32(1)
                    ).reshape(-1),
                ]
            )
            cand_lpb = jnp.concatenate(
                [stay_b, jnp.full((W * C,), _NEG_INF, jnp.float32)]
            )
            cand_lpnb = jnp.concatenate([stay_nb, ext.reshape(-1)])
            cand_parent = jnp.concatenate(
                [jnp.arange(W), jnp.repeat(jnp.arange(W), C)]
            )
            cand_char = jnp.concatenate(
                [jnp.full((W,), -1, jnp.int32), jnp.tile(cls, W)]
            )

            # Lexsort (hash pair asc, total desc): equal-prefix
            # candidates become adjacent with the strongest first.  One
            # multi-operand lax.sort carries the payloads along —
            # measured ~2x cheaper per step on TPU than the
            # argsort-of-argsort + gather chain it replaces.
            cand_total = _logsumexp2(cand_lpb, cand_lpnb)
            h_s, h2_s, _, lpb_s, lpnb_s, par_s, ch_s = jax.lax.sort(
                (
                    cand_hash,
                    cand_hash2,
                    -cand_total,
                    cand_lpb,
                    cand_lpnb,
                    cand_parent,
                    cand_char,
                ),
                num_keys=3,
            )

            startseg = jnp.concatenate(
                [
                    jnp.array([True]),
                    (h_s[1:] != h_s[:-1]) | (h2_s[1:] != h2_s[:-1]),
                ]
            )
            # Segmented logsumexp over equal-hash runs WITHOUT
            # jax.ops.segment_* (those lower to TPU scatters, ~0.5
            # GB/s): a reversed segmented associative scan leaves each
            # run's full combine at its start position.  Same
            # paired-operator trick as the CC kernel's segmented scan.
            end_flag = jnp.concatenate([startseg[1:], jnp.array([True])])

            def seg_lse(vals):
                def comb(a, b):
                    av, af = a
                    bv, bf = b
                    return (
                        jnp.where(bf, bv, _logsumexp2(av, bv)),
                        af | bf,
                    )

                sv, _ = jax.lax.associative_scan(
                    comb, (vals[::-1], end_flag[::-1])
                )
                return sv[::-1]  # valid at startseg positions

            lpb_seg = seg_lse(lpb_s)
            lpnb_seg = seg_lse(lpnb_s)
            score_rep = jnp.where(
                startseg,
                _logsumexp2(lpb_seg, lpnb_seg),
                _NEG_INF,
            )
            _, top_pos = jax.lax.top_k(score_rep, W)

            # With fewer live segments than W, top_k pads with
            # non-representative positions — those must become DEAD
            # slots, not duplicates of the live segment they point
            # into (a duplicate would double-count that prefix's
            # probability mass on every later step).
            sel_ok = startseg[top_pos]
            par = par_s[top_pos]
            ch = ch_s[top_pos]
            new_hash = jnp.where(
                sel_ok,
                h_s[top_pos],
                jnp.uint32(0x85EBCA6B)
                * jnp.arange(W, dtype=jnp.uint32)
                + jnp.uint32(0xC2B2AE35),
            )
            new_hash2 = jnp.where(
                sel_ok,
                h2_s[top_pos],
                jnp.uint32(0x165667B1)
                * jnp.arange(W, dtype=jnp.uint32)
                + jnp.uint32(0x7F4A7C15),
            )
            new_lp_b = jnp.where(sel_ok, lpb_seg[top_pos], _NEG_INF)
            new_lp_nb = jnp.where(sel_ok, lpnb_seg[top_pos], _NEG_INF)

            extm = ch >= 0
            base_pref = prefixes[par]  # [W, T]
            pos = lengths[par]
            write = (jnp.arange(T)[None, :] == pos[:, None]) & extm[:, None]
            new_pref = jnp.where(write, ch[:, None], base_pref)
            new_len = pos + extm.astype(jnp.int32)
            new_last = jnp.where(extm, ch, last[par])

            return (
                new_pref,
                new_len,
                new_hash,
                new_hash2,
                new_last,
                new_lp_b,
                new_lp_nb,
            ), None

        state = (prefixes, lengths, hashes, hashes2, last, lp_b, lp_nb)
        state, _ = jax.lax.scan(step, state, lp_seq)
        prefixes, lengths, _, _, _, lp_b, lp_nb = state
        score = _logsumexp2(lp_b, lp_nb)
        order = jnp.argsort(-score)
        return prefixes[order], lengths[order], score[order]

    return jax.vmap(single)(logp)


def cross_entropy_ignore_index(
    logits: jax.Array,
    targets: jax.Array,
    ignore_index: int = 0,
) -> jax.Array:
    """torch.nn.CrossEntropyLoss(ignore_index=...) for the attention head
    (``crnn.py:116``): mean over non-ignored targets."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != ignore_index).astype(nll.dtype)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


__all__ = [
    "ctc_loss",
    "ctc_forward_logprob",
    "ctc_greedy_decode",
    "ctc_beam_search_decode",
    "cross_entropy_ignore_index",
]
