"""Measure the LM prior's transcript-accuracy delta (VERDICT r3 #7).

Compares three CTC decoders on DEGRADED held-out renders of
receipt-vocabulary words, using the trained demo recognizer
(``scripts/train_demo.py``):

* greedy          — the reference's only decode (``ocr/net.py:165-167``)
* beam            — on-device prefix beam search (``ops/ctc.py``)
* beam + LM prior — shallow-fusion character-bigram prior built from
                    the receipt vocabulary (``scripts/build_lm_prior.py``
                    build_prior), i.e. the ``--lm``/``ctc_lm_path``
                    serving feature

The prior can only rerank hypotheses the acoustic model is uncertain
about, so the eval degrades the renders (noise sweep) until greedy has
headroom.  Run after train_demo:

    python scripts/check_lm_prior.py [--n 300] [--noise 24 40 56]

Prints one table; paste into BENCH.md ("LM prior" section).
"""
from __future__ import annotations

import argparse
import io
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=300, help="words per noise level")
    p.add_argument("--noise", type=float, nargs="+", default=[24.0, 40.0, 56.0])
    p.add_argument("--beam-width", type=int, default=8)
    p.add_argument("--lm-weight", type=float, default=0.4)
    args = p.parse_args(argv)

    from PIL import Image

    from lightly_ocr_tpu.data.generator import RECEIPT_VOCAB, render_word
    from lightly_ocr_tpu.engines import CRNN

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from build_lm_prior import build_prior

    from train_demo import CRNN_DIR, _demo_cfg, _load_engines  # noqa: F401

    import jax

    from lightly_ocr_tpu.train.train_step import init_train_state
    from lightly_ocr_tpu.utils.checkpoint import load_variables_for_inference

    cfg0 = _demo_cfg(transform="None")
    _, tmpl = init_train_state(cfg0, jax.random.key(0))
    rec_vars = load_variables_for_inference(CRNN_DIR, tmpl)

    prior_path = os.path.join(REPO, "data", "demo", "receipt_prior.npy")
    os.makedirs(os.path.dirname(prior_path), exist_ok=True)
    np.save(prior_path, build_prior(RECEIPT_VOCAB, weight=args.lm_weight))

    decoders = {
        "greedy": cfg0.replace(ctc_decode="greedy"),
        "beam": cfg0.replace(
            ctc_decode="beam", beam_width=args.beam_width
        ),
        "beam+lm": cfg0.replace(
            ctc_decode="beam", beam_width=args.beam_width,
            ctc_lm_path=prior_path,
        ),
    }
    engines = {
        name: CRNN(c, variables=rec_vars) for name, c in decoders.items()
    }

    print(f"| noise | n | {' | '.join(decoders)} |")
    print("|---|---|" + "---|" * len(decoders))
    for noise in args.noise:
        rng = np.random.default_rng(int(1000 + noise))
        crops, labels = [], []
        for _ in range(args.n):
            text = RECEIPT_VOCAB[int(rng.integers(0, len(RECEIPT_VOCAB)))]
            png = render_word(text, rng, noise=noise)
            g = np.asarray(Image.open(io.BytesIO(png)).convert("L"),
                           np.float32)
            crops.append(g)
            labels.append(text)
        # collage the crops into one gray image so each decoder pass is
        # ONE batched process_batch dispatch (not n tiny ones)
        gap = 4
        H = sum(c.shape[0] for c in crops) + gap * len(crops)
        W = max(c.shape[1] for c in crops)
        canvas = np.full((H, W), 255.0, np.float32)
        rects = []
        r = 0
        for c in crops:
            canvas[r : r + c.shape[0], : c.shape[1]] = c
            rects.append([r, 0, r + c.shape[0], c.shape[1]])
            r += c.shape[0] + gap
        rects = np.asarray(rects, np.float32)
        accs = []
        chunk = 128  # stay under the engine's _BOX_BUCKETS cap (256)
        for name, eng in engines.items():
            texts = []
            for s in range(0, len(rects), chunk):
                t, _ = eng.process_batch(canvas, rects[s : s + chunk])
                texts.extend(t)
            accs.append(
                sum(t == lab for t, lab in zip(texts, labels)) / args.n
            )
        print(
            f"| {noise:.0f} | {args.n} | "
            + " | ".join(f"{a:.3f}" for a in accs)
            + " |",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
