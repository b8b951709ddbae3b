"""Shared prediction-head decoding: crops/logits -> (indices, confidence).

ONE implementation of the three decode modes — greedy, on-device CTC
prefix beam search, attention beam search — used by BOTH the per-image
engine (``engines.CRNN``) and the batched serving program
(``serving/batch.BatchedOCR``).  Before this module the two call sites
hand-rolled the same branches and could silently diverge on a semantics
fix (e.g. the beam EOS-termination contract).

All functions here are jit-traceable; the host-side string decode stays
with the label converters (``text/converters.py``).

Greedy semantics mirror the reference (``ocr/net.py:174-193``):
* CTC: per-frame argmax indices (collapsed later on host by
  ``decode_padded``), confidence = cumprod of per-frame max softmax;
* Attention: argmax tokens, confidence = product of per-step maxima up
  to (excluding) the first EOS, zeroed if EOS never appears.

Beam semantics (beyond parity — the reference only greedy-decodes):
* CTC: ``ops/ctc.py ctc_beam_search_decode`` — indices are FINAL label
  sequences (host must NOT re-collapse), confidence = true sequence
  posterior; an optional [C, C] shallow-fusion log-prior (``lm``) is
  added per extension;
* Attention: ``models/attention.py _beam_decode`` — every beam is
  EOS-terminated, confidence = exp(sequence log-prob incl. EOS).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from lightly_ocr_tpu.config import Config


def lm_prior_to_attention_space(arr: np.ndarray) -> np.ndarray:
    """Remap a charset-space [n+1, n+1] transition log-prior (the
    ``scripts/build_lm_prior.py`` layout: row/col 0 = word start /
    blank, i+1 = i-th charset char) into ATTENTION index space
    [n+2, n+2] ([GO]=0, [s]=1, chars at 2+): [GO] inherits the
    word-start row, char rows/cols shift by one, and the [s] (EOS)
    row/column stays 0 — the prior reranks characters, never the stop
    decision (the acoustic model owns termination).

    Each row's char entries are CENTERED (mean char adjustment = 0):
    raw log-priors are all negative while the untouched EOS column
    sits at 0, so without centering every char extension pays a
    penalty EOS never pays and fused decodes terminate early (the
    classic un-counterbalanced shallow-fusion length bias — exactly
    the "rec[s]" truncation the docstring above promises to avoid).
    Centering preserves every relative char preference and makes the
    EOS-neutrality claim true in expectation, not just for the EOS
    entry itself.  (CTC beams don't need this: CTC has no EOS token —
    termination is frame exhaustion, so a uniform row offset cancels
    between competing same-length beams.)"""
    n = arr.shape[0] - 1
    out = np.zeros((n + 2, n + 2), np.float64)
    out[0, 2:] = arr[0, 1:] - np.mean(arr[0, 1:])
    out[2:, 2:] = arr[1:, 1:] - np.mean(arr[1:, 1:], axis=1,
                                        keepdims=True)
    return out.astype(arr.dtype)


def load_lm_prior(cfg: Config) -> jax.Array | None:
    """Load the shallow-fusion transition prior named by
    ``cfg.ctc_lm_path`` (a ``.npy`` [n+1, n+1] charset-space float
    array of log-priors as built by ``scripts/build_lm_prior.py``;
    fold any fusion weight into the values).  Empty path -> None.

    * ``prediction="CTC"`` requires ``ctc_decode="beam"`` (a
      transition prior needs token-level extensions; CTC greedy is
      per-frame) and uses the array as-is (CTC labels ARE the charset
      space: blank=0, chars 1+).
    * ``prediction="Attention"`` works with greedy AND beam (the
      decode is token-autoregressive either way) after remapping to
      attention index space (:func:`lm_prior_to_attention_space`)."""
    if not cfg.ctc_lm_path:
        return None
    if cfg.prediction == "CTC" and cfg.ctc_decode != "beam":
        raise ValueError(
            "with prediction='CTC' the LM prior needs ctc_decode='beam' "
            f"(got ctc_decode={cfg.ctc_decode!r}); the Attention head "
            "accepts it in greedy and beam modes"
        )
    arr = np.load(os.path.expanduser(cfg.ctc_lm_path))
    n = len(cfg.character)
    if arr.shape != (n + 1, n + 1):
        raise ValueError(
            f"LM prior at {cfg.ctc_lm_path!r} must be charset-space "
            f"[n+1, n+1] = {(n + 1, n + 1)}, got {arr.shape}"
        )
    if cfg.prediction != "CTC":
        arr = lm_prior_to_attention_space(np.asarray(arr))
    return jnp.asarray(arr, jnp.float32)


def decode_preds(
    preds: jax.Array, cfg: Config, lm: jax.Array | None = None
) -> tuple[jax.Array, jax.Array]:
    """[K, T, C] prediction-head logits -> (idx [K, T] int32,
    confidence [K] f32) per ``cfg``'s decode mode.  Traceable."""
    preds = preds.astype(jnp.float32)
    if cfg.prediction == "CTC" and cfg.ctc_decode == "beam":
        from lightly_ocr_tpu.ops.ctc import ctc_beam_search_decode

        labels, _, scores = ctc_beam_search_decode(
            preds, beam_width=cfg.beam_width, lm=lm
        )
        return labels[:, 0], jnp.exp(scores[:, 0])
    probs = jax.nn.softmax(preds, axis=2)
    max_probs = jnp.max(probs, axis=2)  # [K, T]
    idx = jnp.argmax(preds, axis=2)  # [K, T]
    if cfg.prediction == "CTC":
        conf = jnp.prod(max_probs, axis=1)
    else:
        # truncate at the first EOS (index 1): product of steps strictly
        # before it; no EOS at all -> confidence 0 (net.py:183-190)
        eos = idx == 1
        before_eos = jnp.cumsum(eos, axis=1) == 0
        conf = jnp.prod(jnp.where(before_eos, max_probs, 1.0), axis=1)
        conf = jnp.where(jnp.any(eos, axis=1), conf, 0.0)
    return idx, conf


def decode_crops(
    net,
    variables,
    crops: jax.Array,
    cfg: Config,
    lm: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """[K, H, W, 1] normalized crops -> (idx [K, S] int32,
    confidence [K] f32), running the recognizer net and decoding per
    ``cfg``.  Traceable; call under jit with ``cfg``/``lm`` closed over."""
    if cfg.prediction != "CTC" and cfg.attn_decode == "beam":
        tokens, scores = net.apply(
            variables, crops, None, False, cfg.beam_width, lm
        )
        return tokens[:, 0], jnp.exp(scores[:, 0].astype(jnp.float32))
    if cfg.prediction != "CTC" and lm is not None:
        # greedy shallow fusion happens INSIDE the decode scan (the
        # prior must steer the feedback token, not just the readout)
        preds = net.apply(variables, crops, None, False, None, lm)
        return decode_preds(preds, cfg, None)
    preds = net.apply(variables, crops, None, False)  # [K, T, C]
    return decode_preds(preds, cfg, lm)


__all__ = [
    "load_lm_prior",
    "lm_prior_to_attention_space",
    "decode_preds",
    "decode_crops",
]
