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
    "cross_entropy_ignore_index",
]
