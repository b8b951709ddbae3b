"""Bahdanau-style attention decoder as a single `lax.scan`.

The reference decodes with a 26-step *Python* loop over an LSTMCell
(``ocr/modules/attention.py:38-59``) — the hottest sequential path in its
recognizer.  Here both modes are one ``lax.scan``:

* training: teacher forcing over the [GO]-prefixed text (scan over the
  precomputed one-hots; ``attention.py:38-44``);
* inference: greedy argmax feedback carried through the scan state
  (``attention.py:45-59``).

Per-step wiring matches ``AttentionCell`` (``attention.py:64-88``):
``e = score(tanh(i2h(feats) + h2h(h)))``; ``alpha = softmax_T(e)``;
``context = alpha^T feats``; LSTMCell([context; onehot(prev)], (h, c)).
``i2h(feats)`` is step-invariant, so it is hoisted out of the scan as one
big MXU matmul.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightly_ocr_tpu.models.layers import torch_rnn_init
from lightly_ocr_tpu.models.lstm import lstm_cell_step

Dtype = Any


class LSTMCellParams(nn.Module):
    """torch ``nn.LSTMCell`` parameters (weight_ih [4H, in] etc.)."""

    in_dim: int
    hidden: int

    def setup(self):
        H4 = 4 * self.hidden
        init = torch_rnn_init(self.hidden)
        self.weight_ih = self.param("weight_ih", init, (H4, self.in_dim))
        self.weight_hh = self.param("weight_hh", init, (H4, self.hidden))
        self.bias_ih = self.param("bias_ih", init, (H4,))
        self.bias_hh = self.param("bias_hh", init, (H4,))

    def __call__(self, inp, h, c):
        return lstm_cell_step(
            inp, h, c, self.weight_ih, self.weight_hh, self.bias_ih, self.bias_hh
        )


class AttentionCellParams(nn.Module):
    """Holds the cell's parameters under torch-compatible names."""

    n_in: int
    hidden: int
    num_classes: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.i2h = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype)
        self.h2h = nn.Dense(self.hidden, dtype=self.dtype)
        self.score = nn.Dense(1, use_bias=False, dtype=self.dtype)
        self.rnn = LSTMCellParams(self.n_in + self.num_classes, self.hidden)

    def __call__(self, x):  # pragma: no cover - params only
        raise NotImplementedError


class Attention(nn.Module):
    """Decoder head (``attention.py:8-61``); emits [B, num_steps, classes]."""

    hidden: int
    num_classes: int
    num_steps: int = 26  # batch_max_len + 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jax.Array,  # [B, T, n_in] encoder states
        text: jax.Array | None = None,  # [B, >=num_steps] int32 ([GO]-prefixed)
        train: bool = False,
        beam_width: int | None = None,  # static; inference-only beam search
        lm: jax.Array | None = None,  # [C, C] shallow-fusion log-prior
    ) -> jax.Array:
        """``lm`` (inference-only): a [num_classes, num_classes]
        log-prior in ATTENTION index space ([GO]=0, [s]=1, chars 2+ —
        ``models/decode.load_lm_prior`` remaps the charset-space .npy).
        Greedy: ``lm[prev]`` is added to each step's logits before the
        argmax feedback AND in the emitted scores, so the returned
        [B, S, C] are fused scores whose softmax is the shallow-fusion
        posterior (P_model * P_lm, decode_preds' confidence).  Beam:
        added to the per-extension log-probs before top_k — the same
        fusion point as the CTC beam (``ops/ctc.py``)."""
        B, T, n_in = feats.shape
        cell = AttentionCellParams(
            n_in, self.hidden, self.num_classes, self.dtype, name="attention_cell"
        )
        generator = nn.Dense(self.num_classes, dtype=self.dtype, name="generator")

        feats_proj = cell.i2h(feats)  # [B, T, H] hoisted out of the scan
        w_ih = cell.rnn.weight_ih.astype(self.dtype)
        w_hh = cell.rnn.weight_hh.astype(self.dtype)
        b_ih = cell.rnn.bias_ih.astype(self.dtype)
        b_hh = cell.rnn.bias_hh.astype(self.dtype)

        def attend(h):
            e = cell.score(jnp.tanh(feats_proj + cell.h2h(h)[:, None, :]))
            alpha = jax.nn.softmax(e, axis=1)  # [B, T, 1]
            return jnp.sum(alpha * feats, axis=1)  # [B, n_in]

        h0 = jnp.zeros((B, self.hidden), self.dtype)
        c0 = jnp.zeros((B, self.hidden), self.dtype)

        # Materialize every submodule's params OUTSIDE the scan: flax cannot
        # create params inside a plain lax.scan trace. XLA dead-code
        # eliminates these dummy calls after init.
        _ = attend(h0)
        _ = generator(h0)

        if train:
            if lm is not None:
                raise ValueError("lm fusion is inference-only")
            if text is None:
                raise ValueError("teacher forcing requires `text`")
            onehots = jax.nn.one_hot(
                text[:, : self.num_steps], self.num_classes, dtype=self.dtype
            )  # [B, S, C]

            def step(carry, char_onehot):
                h, c = carry
                context = attend(h)
                inp = jnp.concatenate([context, char_onehot], axis=1)
                h, c = lstm_cell_step(inp, h, c, w_ih, w_hh, b_ih, b_hh)
                return (h, c), h

            _, hs = jax.lax.scan(
                step, (h0, c0), jnp.swapaxes(onehots, 0, 1), unroll=13
            )
            hs = jnp.swapaxes(hs, 0, 1)  # [B, S, H]
            return generator(hs)

        if beam_width is not None:
            return self._beam_decode(
                feats, feats_proj, cell, generator,
                (w_ih, w_hh, b_ih, b_hh), int(beam_width), lm=lm,
            )

        lm_t = None if lm is None else lm.astype(jnp.float32)

        def step(carry, _):
            h, c, prev = carry
            onehot = jax.nn.one_hot(prev, self.num_classes, dtype=self.dtype)
            context = attend(h)
            inp = jnp.concatenate([context, onehot], axis=1)
            h, c = lstm_cell_step(inp, h, c, w_ih, w_hh, b_ih, b_hh)
            probs_step = generator(h)
            if lm_t is not None:
                # fused scores: emitted AND fed back, so the external
                # argmax (decode_preds) agrees with the internal one
                probs_step = probs_step.astype(jnp.float32) + lm_t[prev]
            nxt = jnp.argmax(probs_step, axis=1)
            return (h, c, nxt), probs_step

        prev0 = jnp.zeros((B,), jnp.int32)  # [GO]
        _, probs = jax.lax.scan(
            step, (h0, c0, prev0), None, length=self.num_steps, unroll=13
        )
        return jnp.swapaxes(probs, 0, 1)  # [B, S, C]

    def _beam_decode(self, feats, feats_proj, cell, generator, lstm_w, W,
                     lm=None):
        """Beam search over the autoregressive decode (beyond parity —
        the reference argmax-feeds only, ``attention.py:45-59``).

        Returns ``(tokens [B, W, S] int32, scores [B, W] f32)`` with
        beams best-first.  ``scores`` = sum of token log-probs up to
        and including the first EOS ('[s]', index 1): once a beam emits
        EOS it is frozen — later steps force EOS at zero cost.  The
        LAST step forces EOS on every still-live beam at its TRUE
        log-prob, so every returned beam is a terminated sequence and
        ``exp(score)`` is always the sequence probability
        P(y, EOS | image).  (Without that, a decoder stuck confidently
        repeating a token would return a 26-token prefix that never
        paid the EOS cost — outranking genuinely-better terminated
        beams and carrying a score that is not a sequence probability.
        The greedy path's contract zeroes confidence when EOS never
        appears; this is the beam-path equivalent.)

        Shape discipline: the W beams fold into the batch dim
        ([B*W, ...] LSTM/attention states), so the per-step compute is
        the greedy scan's at W x batch — one program, no host loop.
        """
        w_ih, w_hh, b_ih, b_hh = lstm_w
        B, T, n_in = feats.shape
        C = self.num_classes
        S = self.num_steps
        EOS = 1
        NEG = -1.0e30
        if W < 1:
            raise ValueError(f"beam_width must be >= 1, got {W}")
        # W > C is fine: surplus slots fill with ~NEG dead beams that
        # can never outrank a live one.

        featsW = jnp.repeat(feats, W, axis=0)  # [B*W, T, n_in]
        projW = jnp.repeat(feats_proj, W, axis=0)

        def attend_w(h):  # [B*W, H] -> [B*W, n_in]
            e = cell.score(jnp.tanh(projW + cell.h2h(h)[:, None, :]))
            alpha = jax.nn.softmax(e, axis=1)
            return jnp.sum(alpha * featsW, axis=1)

        bidx = jnp.arange(B)[:, None]

        def step(carry, s):
            h, c, prev, score, fin, seqs = carry
            onehot = jax.nn.one_hot(
                prev.reshape(-1), C, dtype=self.dtype
            )
            context = attend_w(h)
            inp = jnp.concatenate([context, onehot], axis=1)
            h2, c2 = lstm_cell_step(inp, h, c, w_ih, w_hh, b_ih, b_hh)
            logits = generator(h2).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1).reshape(B, W, C)
            if lm is not None:  # shallow fusion per extension
                logp = logp + lm.astype(jnp.float32)[prev]
            # finished beams may only emit EOS, at zero cost
            forced = jnp.where(
                jnp.arange(C)[None, None, :] == EOS, 0.0, NEG
            )
            step_lp = jnp.where(fin[:, :, None], forced, logp)
            # final step: live beams must terminate, paying their true
            # EOS log-prob (finished beams already emit EOS free)
            eos_mask = jnp.where(
                jnp.arange(C)[None, None, :] == EOS, 0.0, NEG
            )
            step_lp = jnp.where(s == S - 1, step_lp + eos_mask, step_lp)
            cand = score[:, :, None] + step_lp  # [B, W, C]
            new_score, pos = jax.lax.top_k(cand.reshape(B, W * C), W)
            parent = pos // C  # [B, W]
            tok = pos % C
            hsel = h2.reshape(B, W, -1)[bidx, parent].reshape(B * W, -1)
            csel = c2.reshape(B, W, -1)[bidx, parent].reshape(B * W, -1)
            new_fin = fin[bidx, parent] | (tok == EOS)
            seqs = seqs[bidx, parent]
            write = jnp.arange(S)[None, None, :] == s
            seqs = jnp.where(write, tok[:, :, None], seqs)
            return (hsel, csel, tok, new_score, new_fin, seqs), None

        H = self.hidden
        carry0 = (
            jnp.zeros((B * W, H), self.dtype),
            jnp.zeros((B * W, H), self.dtype),
            jnp.zeros((B, W), jnp.int32),  # [GO]
            jnp.full((B, W), NEG, jnp.float32).at[:, 0].set(0.0),
            jnp.zeros((B, W), bool),
            jnp.zeros((B, W, S), jnp.int32),
        )
        carry, _ = jax.lax.scan(step, carry0, jnp.arange(S))
        _, _, _, score, _, seqs = carry
        # each step's top_k leaves beams score-descending already
        return seqs, score
