"""(Bi)LSTM as `lax.scan` — the TPU replacement for cuDNN LSTM.

The reference leans on cuDNN via ``nn.LSTM(batch_first=True,
bidirectional=True)`` + ``flatten_parameters`` (``ocr/modules/biLSTM.py:
9-33``).  On TPU the idiomatic shape is: hoist the input projection out of
the recurrence as ONE big [B*T, in]x[in, 4H] matmul (MXU-sized), then scan
only the hidden-state recurrence; the backward direction reuses the same
scan on the time-reversed sequence.  Weights are stored in torch's layout
([4H, in], gate order i,f,g,o) so state-dict import is a straight copy.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightly_ocr_tpu.models.layers import torch_rnn_init

Dtype = Any


def _lstm_scan(
    x_proj: jax.Array,  # [B, T, 4H] input projection (+ both biases)
    w_hh: jax.Array,  # [4H, H] torch layout
    hidden: int,
    reverse: bool = False,
) -> jax.Array:
    """Run the h/c recurrence; returns hidden states [B, T, H]."""
    B = x_proj.shape[0]
    h0 = jnp.zeros((B, hidden), dtype=x_proj.dtype)
    c0 = jnp.zeros((B, hidden), dtype=x_proj.dtype)
    w_hh_t = w_hh.T  # [H, 4H]

    def step(carry, xp):
        h, c = carry
        gates = xp + h @ w_hh_t
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h = nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    xs = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 4H]
    _, hs = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)  # [B, T, H]


def lstm_cell_step(
    inp: jax.Array,  # [B, in]
    h: jax.Array,
    c: jax.Array,
    w_ih: jax.Array,  # [4H, in]
    w_hh: jax.Array,  # [4H, H]
    b_ih: jax.Array,
    b_hh: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """One torch ``nn.LSTMCell`` update (used by the attention decoder)."""
    gates = inp @ w_ih.T + b_ih + h @ w_hh.T + b_hh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
    h = nn.sigmoid(o) * jnp.tanh(c)
    return h, c


class LSTM(nn.Module):
    """Single-layer bidirectional LSTM with torch-layout parameters.

    Both directions run in ONE scan: the backward direction's projected
    inputs are time-flipped so each step updates a stacked [2, B, H]
    state with a single batched matmul — half the scan count and double
    the per-step MXU work vs. two sequential scans."""

    hidden: int
    unroll: int = 13
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        H4 = 4 * self.hidden
        H = self.hidden
        B = x.shape[0]

        def p(name, shape):
            return self.param(
                name,
                torch_rnn_init(self.hidden),
                shape,
                jnp.float32,
            ).astype(self.dtype)

        proj = []
        w_hh_t = []
        for suffix in ("l0", "l0_reverse"):
            w_ih = p(f"weight_ih_{suffix}", (H4, in_dim))
            w_hh = p(f"weight_hh_{suffix}", (H4, self.hidden))
            b_ih = p(f"bias_ih_{suffix}", (H4,))
            b_hh = p(f"bias_hh_{suffix}", (H4,))
            proj.append(x @ w_ih.T + b_ih + b_hh)  # [B, T, 4H] MXU matmul
            w_hh_t.append(w_hh.T)
        # [T, 2, B, 4H]: forward as-is, backward time-flipped
        xs = jnp.stack(
            [
                jnp.swapaxes(proj[0], 0, 1),
                jnp.swapaxes(jnp.flip(proj[1], 1), 0, 1),
            ],
            axis=1,
        )
        w_hh_s = jnp.stack(w_hh_t)  # [2, H, 4H]

        h0 = jnp.zeros((2, B, H), self.dtype)
        c0 = jnp.zeros((2, B, H), self.dtype)

        def step(carry, xp):
            h, c = carry
            gates = xp + jnp.einsum(
                "dbh,dhg->dbg", h, w_hh_s,
                preferred_element_type=self.dtype,
            )
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
            h = nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        _, hs = jax.lax.scan(step, (h0, c0), xs, unroll=self.unroll)
        fwd = jnp.swapaxes(hs[:, 0], 0, 1)  # [B, T, H]
        bwd = jnp.flip(jnp.swapaxes(hs[:, 1], 0, 1), 1)
        return jnp.concatenate([fwd, bwd], axis=-1)  # [B, T, 2H]


class BidirectionalLSTM(nn.Module):
    """BiLSTM + output projection (``biLSTM.py:9-33`` non-dropout path)."""

    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        recurrent = LSTM(self.hidden, dtype=self.dtype, name="rnn")(x)
        return nn.Dense(self.out, dtype=self.dtype, name="linear")(recurrent)


class SeqModeling(nn.Module):
    """Two stacked BiLSTMs (CRNNet's sequence stage, ``model.py:90-91``)."""

    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = BidirectionalLSTM(self.hidden, self.hidden, dtype=self.dtype, name="0")(x)
        x = BidirectionalLSTM(self.hidden, self.hidden, dtype=self.dtype, name="1")(x)
        return x
