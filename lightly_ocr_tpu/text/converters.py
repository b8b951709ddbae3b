"""Text <-> index converters for CTC and attention decoders.

Behavior-parity rebuild of the reference converters
(``ocr/tools/recog_utils.py:10-119``) on numpy, with the reference's
output-visible bugs fixed (each fix documented):

* ``CTCLabelConverter.decode`` in the reference overwrites its ``text``
  argument inside the batch loop (``recog_utils.py:43``) so every sample
  after the first decodes garbage — here batch decode is correct.
* ``AttnLabelConverter.encode`` in the reference returns inside the
  per-sample loop (``recog_utils.py:93``) so only the first sample is
  encoded — fixed.
* The vestigial MORAN ``sep`` mode (``recog_utils.py:61-63,71-81,97-112``)
  is intentionally dropped: nothing in the reference pipeline uses it.

Index layout matches the reference exactly:
* CTC:  index 0 = ``[blank]``; characters are 1..N (``recog_utils.py:20-22``).
* Attn: index 0 = ``[GO]``, 1 = ``[s]``; characters are 2..N+1
  (``recog_utils.py:57-59``).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

from lightly_ocr_tpu.config import BLANK_TOKEN, EOS_TOKEN, GO_TOKEN


def _lookup(table: dict, text: str, who: str) -> list[int]:
    try:
        return [table[ch] for ch in text]
    except KeyError as e:
        raise ValueError(
            f"{who}: character {e.args[0]!r} in {text!r} is not in the "
            "charset; filter labels first (see data pipeline `filtering`)"
        ) from None


class CTCLabelConverter:
    """Maps text <-> indices for CTC training and greedy decoding."""

    def __init__(self, character: str):
        self.dict = {ch: i + 1 for i, ch in enumerate(character)}
        self.character = [BLANK_TOKEN] + list(character)

    @property
    def num_classes(self) -> int:
        return len(self.character)

    def encode(self, texts: Sequence[str], batch_max_len: int = 25):
        """Flat-concatenated encoding (reference API shape).

        Returns (flat int32 indices of all samples concatenated, int32
        per-sample lengths) — the layout ``torch.nn.CTCLoss`` consumes
        (``recog_utils.py:24-30``).
        """
        lengths = np.asarray([len(s) for s in texts], dtype=np.int32)
        flat = np.asarray(
            [i for s in texts for i in _lookup(self.dict, s, "CTC encode")],
            dtype=np.int32,
        )
        return flat, lengths

    def encode_padded(self, texts: Sequence[str], batch_max_len: int = 25):
        """Padded [B, batch_max_len] encoding for the jitted CTC loss.

        TPU-native addition: static-shape labels (pad index 0 = blank) with a
        separate length vector, so the whole batch is one XLA program.
        """
        batch = np.zeros((len(texts), batch_max_len), dtype=np.int32)
        lengths = np.zeros((len(texts),), dtype=np.int32)
        for i, s in enumerate(texts):
            idx = _lookup(self.dict, s, "CTC encode")[:batch_max_len]
            batch[i, : len(idx)] = idx
            lengths[i] = len(idx)
        return batch, lengths

    def decode(self, indices, lengths) -> list[str]:
        """Collapse repeats then drop blanks, per sample.

        ``indices`` is the flat concatenation (as produced by greedy argmax
        over [B*T] in the reference, ``net.py:165-167``), ``lengths`` the
        per-sample lengths.
        """
        indices = np.asarray(indices).reshape(-1)
        texts = []
        start = 0
        for l in np.asarray(lengths).reshape(-1):
            seg = indices[start : start + int(l)]
            chars = []
            prev = -1
            for idx in seg:
                idx = int(idx)
                if idx != 0 and idx != prev:
                    chars.append(self.character[idx])
                prev = idx
            texts.append("".join(chars))
            start += int(l)
        return texts

    def decode_padded(self, batch_indices) -> list[str]:
        """Decode a [B, T] array of greedy argmax indices."""
        batch_indices = np.asarray(batch_indices)
        return self.decode(
            batch_indices.reshape(-1),
            np.full((batch_indices.shape[0],), batch_indices.shape[1]),
        )

    def decode_labels(self, batch_labels, lengths=None) -> list[str]:
        """Decode FINAL label sequences (already blank-free and
        repeat-resolved — e.g. ``ctc_beam_search_decode`` output, which
        may legitimately contain doubled letters).  No CTC collapsing:
        ``decode``/``decode_padded`` would eat genuine repeats here.
        [B, T] (blank-padded) -> list of strings; ``lengths`` optional
        (otherwise stops at the first blank)."""
        batch_labels = np.asarray(batch_labels)
        out = []
        for i, row in enumerate(batch_labels):
            if lengths is not None:
                row = row[: int(np.asarray(lengths).reshape(-1)[i])]
            chars = []
            for idx in row:
                idx = int(idx)
                if idx == 0:
                    if lengths is None:
                        break
                    continue
                chars.append(self.character[idx])
            out.append("".join(chars))
        return out


class AttnLabelConverter:
    """Maps text <-> indices for the attention decoder ([GO]/[s] tokens)."""

    def __init__(self, character: str):
        self.character = [GO_TOKEN, EOS_TOKEN] + list(character)
        self.dict = {tok: i for i, tok in enumerate(self.character)}

    @property
    def num_classes(self) -> int:
        return len(self.character)

    @property
    def eos_index(self) -> int:
        return self.dict[EOS_TOKEN]

    def encode(self, texts: Sequence[str], batch_max_len: int = 25):
        """Returns ([B, batch_max_len+2] int32, [B] int32 lengths).

        Row layout (``recog_utils.py:83-92`` intended behavior): position 0
        is [GO]; then the text indices; then [s]; remainder padded with [GO]
        (index 0).  Length = len(text)+1 (text + EOS).
        """
        lengths = np.asarray([len(s) + 1 for s in texts], dtype=np.int32)
        width = batch_max_len + 2  # [GO] + text + [s], padded
        batch = np.zeros((len(texts), width), dtype=np.int32)
        for i, s in enumerate(texts):
            idx = _lookup(self.dict, s, "Attn encode") + [self.eos_index]
            batch[i, 1 : 1 + len(idx)] = idx
        return batch, lengths

    def decode(self, batch_indices, lengths=None) -> list[str]:
        """Join characters per row; caller truncates at the first ``[s]``
        (``net.py:183-186`` does EOS truncation at the call site)."""
        batch_indices = np.asarray(batch_indices)
        return [
            "".join(self.character[int(i)] for i in row) for row in batch_indices
        ]

    def decode_trimmed(self, batch_indices) -> list[str]:
        """Decode and truncate at the first EOS token (convenience).

        ``[GO]`` (index 0) is a control token, never part of a
        transcript — skip it rather than render it literally (an
        untrained/degenerate decoder can emit it; the parity-mirror
        ``decode`` above keeps the reference's literal rendering)."""
        out = []
        for row in np.asarray(batch_indices):
            chars = []
            for i in row:
                if int(i) == self.eos_index:
                    break
                if int(i) == 0:  # [GO]
                    continue
                chars.append(self.character[int(i)])
            out.append("".join(chars))
        return out


def build_converter(prediction: str, character: str):
    if prediction == "CTC":
        return CTCLabelConverter(character)
    if prediction == "Attention":
        return AttnLabelConverter(character)
    raise ValueError(f"unknown prediction head {prediction!r}")
