"""Build a shallow-fusion character-transition prior for CTC beam search.

Counts character bigrams over a text corpus and emits the ``[C, C]``
log-prior matrix ``Config.ctc_lm_path`` expects (``models/decode.py
load_lm_prior``): row/col indices are CTC labels (0 = blank, i+1 = the
i-th charset character), ``lm[p, c]`` is added once when a prefix whose
last label is ``p`` extends with label ``c``, and row 0 holds the
word-START distribution (the empty prefix maps to row 0; blank never
occurs inside a prefix, so column 0 stays 0 and is never read).

The fusion weight is folded into the stored values (the beam adds the
matrix verbatim), so tune ``--weight`` here, not at serve time.

Usage:
    python scripts/build_lm_prior.py corpus.txt -o prior.npy \
        [--weight 0.4] [--smoothing 0.5]
    # then: config.yml -> ctc_lm_path: prior.npy, ctc_decode: beam
    # or:   python -m lightly_ocr_tpu.serving.server --lm prior.npy

Corpus format: plain text; every maximal run of charset characters
(case-folded) counts as one word.  Out-of-charset characters split
words, matching the reference's charset filtering
(``ocr/tools/dataset.py:161-193`` strips them from labels).

Beyond-parity component: the reference has no LM anywhere (its CTC
path greedy-decodes, ``ocr/net.py:165-167``).
"""
from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lightly_ocr_tpu.config import DEFAULT_CHARSET


def words_from_text(text: str, charset: str = DEFAULT_CHARSET):
    """Maximal charset-character runs of the case-folded text."""
    pat = re.compile("[%s]+" % re.escape(charset))
    return pat.findall(text.lower())


def build_prior(
    words,
    charset: str = DEFAULT_CHARSET,
    weight: float = 0.4,
    smoothing: float = 0.5,
) -> np.ndarray:
    """[C, C] float32 log-prior from an iterable of words.

    ``counts[p, c]`` accumulates transitions label-p -> label-c (p = 0
    for word-initial characters); rows normalize to probabilities with
    add-``smoothing`` Laplace smoothing (every transition stays
    representable — a prior must rerank, never veto, or beam search
    degenerates on out-of-corpus words); ``weight`` scales the log-probs
    (standard shallow fusion: score = log P_acoustic + w * log P_lm).
    """
    n = len(charset)
    C = n + 1
    idx = {ch: i + 1 for i, ch in enumerate(charset)}
    counts = np.zeros((C, C), np.float64)
    total = 0
    for w in words:
        prev = 0  # row 0 = word start
        for ch in w:
            c = idx.get(ch)
            if c is None:
                raise ValueError(f"word {w!r} has out-of-charset char {ch!r}")
            counts[prev, c] += 1
            prev = c
        total += 1
    if total == 0:
        raise ValueError("empty corpus: no charset words found")
    probs = counts[:, 1:] + smoothing  # blank column excluded
    probs /= probs.sum(axis=1, keepdims=True)
    lm = np.zeros((C, C), np.float32)
    lm[:, 1:] = weight * np.log(probs).astype(np.float32)
    return lm


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="corpus text -> [C, C] CTC shallow-fusion log-prior"
    )
    ap.add_argument("corpus", nargs="+", help="text file(s) to count")
    ap.add_argument("-o", "--out", required=True, help="output .npy path")
    ap.add_argument(
        "--weight", type=float, default=0.4,
        help="fusion weight folded into the stored log-probs (default 0.4)",
    )
    ap.add_argument(
        "--smoothing", type=float, default=0.5,
        help="add-k smoothing count per transition (default 0.5)",
    )
    args = ap.parse_args(argv)

    words = []
    for path in args.corpus:
        with open(path, encoding="utf-8", errors="replace") as f:
            words.extend(words_from_text(f.read()))
    lm = build_prior(words, weight=args.weight, smoothing=args.smoothing)
    np.save(args.out, lm)
    print(
        f"{len(words)} words -> {args.out} "
        f"(C={lm.shape[0]}, weight={args.weight}, smoothing={args.smoothing})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
