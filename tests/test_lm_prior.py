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


# ---------------------------------------------------------------------------
# Attention-head shallow fusion (VERDICT r4 #6: the LM must serve the
# flagship serving path, not only CTC beams)
# ---------------------------------------------------------------------------


def test_lm_prior_to_attention_space_layout():
    from lightly_ocr_tpu.models.decode import lm_prior_to_attention_space

    n = 3
    arr = np.arange((n + 1) * (n + 1), dtype=np.float32).reshape(n + 1, -1)
    out = lm_prior_to_attention_space(arr)
    assert out.shape == (n + 2, n + 2)
    # [GO] row inherits the word-start distribution over chars,
    # centered (relative preferences preserved, mean adjustment 0)
    np.testing.assert_allclose(
        out[0, 2:], arr[0, 1:] - arr[0, 1:].mean(), rtol=1e-6
    )
    # char block shifts by one ([s] slot inserted at index 1), row-wise
    # centered so char extensions pay no penalty EOS avoids
    np.testing.assert_allclose(
        out[2:, 2:],
        arr[1:, 1:] - arr[1:, 1:].mean(axis=1, keepdims=True),
        rtol=1e-6,
    )
    # EOS row/col and [GO] col stay 0: prior reranks chars, not stopping
    np.testing.assert_array_equal(out[1, :], 0.0)
    np.testing.assert_array_equal(out[:, 1], 0.0)
    np.testing.assert_array_equal(out[:, 0], 0.0)


def test_lm_prior_attention_space_is_eos_neutral():
    """Every row's mean char adjustment is 0: with all-negative raw
    log-priors and the EOS column pinned at 0, uncentered rows would
    penalize every char extension relative to stopping, systematically
    truncating fused decodes (length bias)."""
    from lightly_ocr_tpu.models.decode import lm_prior_to_attention_space

    rng = np.random.default_rng(3)
    n = 36
    arr = np.log(
        rng.dirichlet(np.ones(n + 1), size=n + 1).astype(np.float32)
    ) * 0.4  # weighted log-probs: all negative
    out = lm_prior_to_attention_space(arr)
    np.testing.assert_allclose(out[0, 2:].mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(
        out[2:, 2:].mean(axis=1), np.zeros(n), atol=1e-5
    )


def test_load_lm_prior_modes(tmp_path):
    from lightly_ocr_tpu.config import Config
    from lightly_ocr_tpu.models.decode import load_lm_prior

    lm_np = build_prior(CORPUS_WORDS, weight=0.4)
    p = str(tmp_path / "prior.npy")
    np.save(p, lm_np)
    C = len(DEFAULT_CHARSET) + 1

    # CTC greedy: rejected (frames are not token extensions)
    with pytest.raises(ValueError, match="beam"):
        load_lm_prior(Config(prediction="CTC", ctc_lm_path=p))
    # CTC beam: charset space, as-is
    lm = load_lm_prior(
        Config(prediction="CTC", ctc_decode="beam", ctc_lm_path=p)
    )
    assert lm.shape == (C, C)
    # Attention greedy AND beam: remapped to attention space
    for decode in ("greedy", "beam"):
        lm = load_lm_prior(
            Config(prediction="Attention", attn_decode=decode,
                   ctc_lm_path=p)
        )
        assert lm.shape == (C + 1, C + 1)
        np.testing.assert_array_equal(np.asarray(lm)[1, :], 0.0)


def _tiny_attention(C=7, hidden=8, T=5, steps=6, B=2, seed=0):
    import jax
    import jax.numpy as jnp

    from lightly_ocr_tpu.models.attention import Attention

    net = Attention(hidden=hidden, num_classes=C, num_steps=steps)
    feats = jax.random.normal(jax.random.key(seed + 1), (B, T, hidden))
    variables = net.init(jax.random.key(seed), feats)
    return net, variables, feats


def test_attention_greedy_fusion_zero_prior_is_identity():
    import jax.numpy as jnp

    net, variables, feats = _tiny_attention()
    base = net.apply(variables, feats)
    fused = net.apply(
        variables, feats, None, False, None, jnp.zeros((7, 7))
    )
    np.testing.assert_allclose(
        np.asarray(base, np.float32), np.asarray(fused), atol=1e-6
    )


def test_attention_greedy_fusion_steers_first_token():
    """A prior that vetoes the natural first token must flip step 0 to
    the runner-up of (logits + lm[GO]) — fusion steers the FEEDBACK,
    not just the readout."""
    import jax.numpy as jnp

    net, variables, feats = _tiny_attention()
    base = np.asarray(net.apply(variables, feats), np.float32)  # [B,S,C]
    tok0 = base[:, 0].argmax(-1)
    lm = np.zeros((7, 7), np.float32)
    lm[0, tok0[0]] = -1e9  # veto batch-0's natural first token
    fused = np.asarray(
        net.apply(variables, feats, None, False, None, jnp.asarray(lm))
    )
    want0 = (base[0, 0] + lm[0]).argmax(-1)
    got0 = fused[0, 0].argmax(-1)
    assert got0 == want0 != tok0[0]
    # batch 1 unaffected at step 0 unless it shared the vetoed token
    if tok0[1] != tok0[0]:
        assert fused[1, 0].argmax(-1) == tok0[1]
    # emitted scores are the fused ones (readout == feedback basis)
    np.testing.assert_allclose(fused[0, 0], base[0, 0] + lm[0], atol=1e-5)


def test_attention_beam_fusion_zero_prior_is_identity():
    import jax.numpy as jnp

    net, variables, feats = _tiny_attention()
    t0, s0 = net.apply(variables, feats, None, False, 4)
    t1, s1 = net.apply(
        variables, feats, None, False, 4, jnp.zeros((7, 7))
    )
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_allclose(
        np.asarray(s0), np.asarray(s1), atol=1e-6
    )


def test_attention_beam_fusion_reranks():
    """Vetoing the plain top beam's first token must change the beam
    winner's first token."""
    import jax.numpy as jnp

    net, variables, feats = _tiny_attention()
    t0, _ = net.apply(variables, feats, None, False, 4)
    first = int(np.asarray(t0)[0, 0, 0])
    lm = np.zeros((7, 7), np.float32)
    lm[0, first] = -1e9
    t1, _ = net.apply(
        variables, feats, None, False, 4, jnp.asarray(lm)
    )
    assert int(np.asarray(t1)[0, 0, 0]) != first
