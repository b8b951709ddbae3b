"""Measure the LM prior's delta on the ATTENTION decoder (VERDICT r4 #6).

The flagship serving path is TPS+ResNet+BiLSTM+**Attention**; round 4
measured the LM prior on CTC beams only, so the feature and the default
head never met.  This script closes that: it trains a compact attention
recognizer on the demo synthetic data (or reuses a cached checkpoint),
then compares four decoders on DEGRADED held-out renders of
receipt-vocabulary words:

* greedy             — the reference's decode (``attention.py:45-59``)
* greedy + LM prior  — shallow fusion folded into the scan's step
                       logits pre-argmax (``models/attention.py``)
* beam               — attention beam search (beyond parity)
* beam + LM prior    — fusion per beam extension

Run (TPU box; training resumes from ``data/demo/attn_ckpt`` if present):

    python scripts/check_attn_lm.py [--iters 3000] [--n 300]
        [--noise 4 6 8]

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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

DATA = os.path.join(REPO, "data", "demo")
CKPT = os.path.join(DATA, "attn_ckpt")


def _attn_cfg(**kw):
    from lightly_ocr_tpu.config import load_config

    return load_config(os.path.join(REPO, "config.yml")).replace(
        prediction="Attention",
        transform="None",
        adam=True,
        lr=1e-3,
        batch_size=64,
        workers=0,
        keep_ratio=False,
        train_root=(os.path.join(DATA, "words_train.lor") + ","
                    + os.path.join(DATA, "crops_train.lor")),
        val_root=os.path.join(DATA, "words_val.lor"),
        log_dir=os.path.join(REPO, "logs_demo_attn"),
        **kw,
    )


def ensure_trained(iters: int):
    """Train (or resume) the attention recognizer; return variables."""
    import jax

    from lightly_ocr_tpu.train.train_step import init_train_state
    from lightly_ocr_tpu.utils.checkpoint import (
        load_variables_for_inference,
    )

    cfg = _attn_cfg()
    _, tmpl = init_train_state(cfg, jax.random.key(0))
    if os.path.isdir(CKPT):
        print(f"reusing checkpoint {CKPT}", flush=True)
        return load_variables_for_inference(CKPT, tmpl)

    from lightly_ocr_tpu.train.trainer import Trainer, build_loaders

    cfg = cfg.replace(
        num_iters=iters,
        val_interval=max(200, iters // 6),
        save_interval=10 ** 9,
        num_epochs=10 ** 9,
    )
    trainer = Trainer(cfg)
    train_loader, val_loader = build_loaders(cfg)
    trainer.fit(train_loader, val_loader)
    print(f"attn recognizer: best held-out exact-match "
          f"{trainer.best_acc:.3f}", flush=True)
    import shutil

    src = os.path.join(cfg.log_dir, "best_acc")
    if os.path.isdir(CKPT):
        shutil.rmtree(CKPT)
    shutil.copytree(src, CKPT)
    return load_variables_for_inference(CKPT, tmpl)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--n", type=int, default=300, help="words per noise level")
    p.add_argument("--noise", type=float, nargs="+", default=[4.0, 6.0, 8.0])
    p.add_argument("--beam-width", type=int, default=8)
    p.add_argument("--lm-weight", type=float, default=0.4)
    args = p.parse_args(argv)

    from PIL import Image

    from build_lm_prior import build_prior
    from lightly_ocr_tpu.data.generator import RECEIPT_VOCAB, render_word
    from lightly_ocr_tpu.engines import CRNN

    rec_vars = ensure_trained(args.iters)

    prior_path = os.path.join(DATA, "receipt_prior.npy")
    os.makedirs(DATA, exist_ok=True)
    np.save(prior_path, build_prior(RECEIPT_VOCAB, weight=args.lm_weight))

    cfg0 = _attn_cfg()
    decoders = {
        "greedy": cfg0,
        "greedy+lm": cfg0.replace(ctc_lm_path=prior_path),
        "beam": cfg0.replace(
            attn_decode="beam", beam_width=args.beam_width
        ),
        "beam+lm": cfg0.replace(
            attn_decode="beam", beam_width=args.beam_width,
            ctc_lm_path=prior_path,
        ),
    }
    engines = {
        name: CRNN(c, variables=rec_vars) for name, c in decoders.items()
    }

    print(f"| render noise | n | {' | '.join(decoders)} |")
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
        gap = 4
        H = sum(c.shape[0] for c in crops) + gap * len(crops)
        W = max(c.shape[1] for c in crops)
        canvas = np.full((H, W), 255.0, np.float32)
        rects = []
        r = 0
        for c in crops:
            canvas[r: r + c.shape[0], : c.shape[1]] = c
            rects.append([r, 0, r + c.shape[0], c.shape[1]])
            r += c.shape[0] + gap
        rects = np.asarray(rects, np.float32)
        accs = []
        chunk = 128
        for name, eng in engines.items():
            texts = []
            for s in range(0, len(rects), chunk):
                t, _ = eng.process_batch(canvas, rects[s: s + chunk])
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
