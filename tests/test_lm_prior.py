"""scripts/build_lm_prior.py: corpus -> prior -> measured accuracy win.

Beyond-parity feature gate (VERDICT r2 #9): the LM hook only counts as
a feature if a prior built from a realistic corpus demonstrably
improves transcripts.  This test builds the prior with the shipped
builder over a receipt-vocabulary corpus, synthesizes acoustically
ambiguous CTC frames for corpus words (o/0, l/1, s/5 confusions at
strength where the acoustic argmax is sometimes wrong), and asserts
beam-with-LM exact-match strictly beats beam-without on the same
logits — plus builder-shape/normalization invariants.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts"),
)

from build_lm_prior import build_prior, words_from_text  # noqa: E402
from lightly_ocr_tpu.config import DEFAULT_CHARSET  # noqa: E402

# receipt-ish vocabulary (weighted: multiplicity = corpus frequency)
CORPUS_WORDS = (
    ["total"] * 30 + ["subtotal"] * 12 + ["cash"] * 20 + ["change"] * 15
    + ["card"] * 10 + ["tax"] * 25 + ["item"] * 18 + ["price"] * 12
    + ["visa"] * 8 + ["debit"] * 8 + ["credit"] * 8 + ["store"] * 10
    + ["sale"] * 10 + ["qty"] * 6 + ["amount"] * 10 + ["balance"] * 8
    + ["thank"] * 6 + ["you"] * 6 + ["receipt"] * 10 + ["number"] * 8
)

# acoustic confusions: (true char, confusable char)
CONFUSIONS = {"o": "0", "l": "1", "s": "5", "i": "1", "e": "c"}


def _labels(word):
    return [DEFAULT_CHARSET.index(ch) + 1 for ch in word]


def _noisy_logits(word, rng, T=26, C=len(DEFAULT_CHARSET) + 1):
    """Blank-separated frames; each char frame puts 0.52 on the true
    char and 0.44 on its confusable (if any) +- noise — the acoustic
    argmax flips on a meaningful fraction of frames."""
    logp = np.full((T, C), -12.0, np.float64)
    t = 0
    for ch in word:
        c = DEFAULT_CHARSET.index(ch) + 1
        p = np.full(C, 1e-4)
        if ch in CONFUSIONS:
            flip = rng.uniform(-0.08, 0.08)
            p[c] = 0.48 + flip
            p[DEFAULT_CHARSET.index(CONFUSIONS[ch]) + 1] = 0.48 - flip
        else:
            p[c] = 0.9
        p /= p.sum()
        logp[t] = np.log(p)
        t += 1
        # blank separator frame
        b = np.full(C, 1e-4)
        b[0] = 0.95
        b /= b.sum()
        logp[t] = np.log(b)
        t += 1
    # trailing blanks
    bl = np.full(C, 1e-4)
    bl[0] = 0.95
    bl /= bl.sum()
    logp[t:] = np.log(bl)
    return logp.astype(np.float32)


def test_builder_shapes_and_normalization():
    lm = build_prior(CORPUS_WORDS, weight=1.0, smoothing=0.5)
    C = len(DEFAULT_CHARSET) + 1
    assert lm.shape == (C, C)
    assert lm.dtype == np.float32
    # blank column never added by the beam: stays exactly 0
    np.testing.assert_array_equal(lm[:, 0], 0.0)
    # rows are normalized log-probs over the charset
    np.testing.assert_allclose(
        np.exp(lm[:, 1:].astype(np.float64)).sum(axis=1), 1.0, rtol=1e-5
    )
    # corpus structure shows: 'total' makes t->o likelier than t->q
    t, o, q = (DEFAULT_CHARSET.index(c) + 1 for c in "toq")
    assert lm[t, o] > lm[t, q]


def test_words_from_text_charset_filtering():
    assert words_from_text("Total: $12.50\nCASH") == [
        "total", "12", "50", "cash",
    ]


@pytest.mark.slow
def test_lm_prior_improves_exact_match():
    from lightly_ocr_tpu.ops.ctc import ctc_beam_search_decode

    import jax.numpy as jnp

    lm_np = build_prior(CORPUS_WORDS, weight=0.6, smoothing=0.5)
    lm = jnp.asarray(lm_np)

    rng = np.random.default_rng(11)
    vocab = sorted(set(CORPUS_WORDS))
    # evaluation set: ambiguous words only (the others decode trivially)
    eval_words = [w for w in vocab if any(ch in CONFUSIONS for ch in w)]
    assert len(eval_words) >= 10
    cases = [(w, _noisy_logits(w, rng)) for w in eval_words for _ in range(4)]

    logits = jnp.asarray(np.stack([lg for _, lg in cases]))
    truth = [w for w, _ in cases]

    def exact(labels_batch):
        ok = 0
        for want, row in zip(truth, np.asarray(labels_batch[:, 0])):
            got = "".join(
                DEFAULT_CHARSET[i - 1] for i in row if i > 0
            )
            ok += got == want
        return ok / len(truth)

    plain, _, _ = ctc_beam_search_decode(logits, beam_width=8)
    fused, _, _ = ctc_beam_search_decode(logits, beam_width=8, lm=lm)
    acc_plain, acc_fused = exact(plain), exact(fused)
    # the deck is ambiguous by construction: plain beam must err
    # somewhere, and the corpus prior must recover a real margin
    assert acc_plain < 1.0
    assert acc_fused > acc_plain + 0.05, (
        f"LM prior gained only {acc_fused - acc_plain:.3f} "
        f"({acc_plain:.3f} -> {acc_fused:.3f})"
    )
