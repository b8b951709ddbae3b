"""CTC prefix beam search (ops/ctc.py ctc_beam_search_decode).

Beyond-parity: the reference only greedy-decodes CTC output
(``ocr/net.py:165-167``).  Gates here:

* EXACTNESS on a small alphabet: with beam_width >= the number of
  distinct collapsed strings, no pruning can occur, so the top beam
  must equal the exact posterior argmax computed by brute-force
  enumeration of all C^T alignment paths, and its score must equal
  the exact log posterior.
* DOMINANCE at production shapes: the beam's top sequence posterior
  (scored independently by ``ctc_forward_logprob``) is never below the
  greedy sequence's posterior.
* Engine wiring: ``Config(ctc_decode="beam")`` decodes through
  ``decode_labels`` (no double-collapse of genuine repeats).
"""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightly_ocr_tpu.ops.ctc import (
    ctc_beam_search_decode,
    ctc_forward_logprob,
    ctc_greedy_decode,
)
from lightly_ocr_tpu.text.converters import CTCLabelConverter


def _brute_force_posteriors(logp: np.ndarray) -> dict[tuple, float]:
    """Exact log P(collapsed string) by enumerating all C^T paths."""
    T, C = logp.shape
    out: dict[tuple, float] = {}
    for path in itertools.product(range(C), repeat=T):
        lp = float(sum(logp[t, c] for t, c in enumerate(path)))
        collapsed = []
        prev = -1
        for c in path:
            if c != 0 and c != prev:
                collapsed.append(c)
            prev = c
        key = tuple(collapsed)
        out[key] = float(np.logaddexp(out.get(key, -np.inf), lp))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_beam_search_exact_small_alphabet(seed):
    T, C = 4, 3  # <= 1 + 2 + 4 + 8 + 16 = 31 distinct strings
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((1, T, C)).astype(np.float32) * 2.0
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)[0]

    exact = _brute_force_posteriors(np.asarray(logp))
    best = max(exact, key=exact.get)

    labels, lengths, scores = jax.jit(
        lambda x: ctc_beam_search_decode(x, beam_width=32)
    )(jnp.asarray(logits))
    got = tuple(int(v) for v in np.asarray(labels[0, 0])[: int(lengths[0, 0])])

    assert got == best, (got, best)
    np.testing.assert_allclose(
        float(scores[0, 0]), exact[best], rtol=0, atol=1e-4
    )
    # the full beam set is ordered and scored consistently
    s = np.asarray(scores[0])
    live = s > -1e29
    assert np.all(np.diff(s[live]) <= 1e-6)
    for w in range(int(live.sum())):
        key = tuple(
            int(v) for v in np.asarray(labels[0, w])[: int(lengths[0, w])]
        )
        assert key in exact
        np.testing.assert_allclose(s[w], exact[key], atol=1e-4)


def test_beam_dominates_greedy_production_shapes():
    B, T, C = 8, 26, 38
    rng = np.random.default_rng(7)
    # sharpened logits: a realistic peaked recognizer posterior (under
    # near-uniform noise the W=8 beam prunes so hard that neither
    # dominance nor score tightness is a guaranteed property)
    logits = jnp.asarray(
        4.0 * rng.standard_normal((B, T, C)).astype(np.float32)
    )
    logp = jax.nn.log_softmax(logits, axis=-1)

    g_idx, g_len = ctc_greedy_decode(logits)
    labels, lengths, scores = ctc_beam_search_decode(logits, beam_width=8)

    T_in = jnp.full((B,), T)
    greedy_lp = ctc_forward_logprob(logp, g_idx, T_in, g_len)
    beam_lp = ctc_forward_logprob(logp, labels[:, 0], T_in, lengths[:, 0])

    # invariant for ANY pruning: the beam's accumulated score only
    # counts alignments that survived in-beam, so it lower-bounds the
    # exact posterior of its sequence
    assert np.all(np.asarray(scores[:, 0]) <= np.asarray(beam_lp) + 1e-3)
    # on peaked posteriors the bound is tight and the beam's choice is
    # at least as good as greedy best-path decoding
    np.testing.assert_allclose(
        np.asarray(scores[:, 0]), np.asarray(beam_lp), atol=0.25
    )
    assert np.all(np.asarray(beam_lp) >= np.asarray(greedy_lp) - 1e-4)


def test_beam_engine_wiring_decode_labels():
    conv = CTCLabelConverter("0123456789abcdefghijklmnopqrstuvwxyz")
    # 'aa' survives decode_labels but would collapse to 'a' under the
    # greedy decode path
    a = conv.dict["a"]
    labels = np.array([[a, a, 0, 0], [a, 0, 0, 0]], np.int32)
    assert conv.decode_labels(labels) == ["aa", "a"]
    assert conv.decode_labels(labels, lengths=[2, 1]) == ["aa", "a"]

    from lightly_ocr_tpu.config import Config
    from lightly_ocr_tpu.engines import CRNN

    cfg = Config(
        prediction="CTC", transform="None", sequence="biLSTM",
        ctc_decode="beam", beam_width=4,
    )
    rec = CRNN(cfg, dtype=jnp.float32)
    crops = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((3, cfg.height, cfg.width, 1))
        .astype(np.float32)
    )
    texts, conf = rec.recognize_crops(crops)
    assert len(texts) == 3
    assert conf.shape == (3,)
    # posterior confidences are probabilities
    assert np.all(conf >= 0) and np.all(conf <= 1 + 1e-6)
    for t in texts:
        assert all(ch in cfg.character for ch in t)


def test_lm_prior_engine_plumbing(tmp_path):
    """ctc_lm_path reaches the on-device beam search from the public
    engine API: a prior that forbids everything except one character
    forces every transcript to be a run of that character (or empty)."""
    from lightly_ocr_tpu.config import Config
    from lightly_ocr_tpu.engines import CRNN
    from lightly_ocr_tpu.models.decode import load_lm_prior

    base = Config(prediction="CTC", transform="None", sequence="None",
                  ctc_decode="beam", beam_width=4)
    C = base.derived_num_classes
    only = base.character.index("7") + 1  # label index of '7' (blank=0)
    lm = np.full((C, C), -1e9, np.float32)
    lm[:, only] = 0.0
    path = tmp_path / "prior.npy"
    np.save(path, lm)

    cfg = base.replace(ctc_lm_path=str(path))
    assert load_lm_prior(cfg) is not None
    rec = CRNN(cfg, dtype=jnp.float32)
    crops = jnp.asarray(
        np.random.default_rng(1)
        .standard_normal((3, cfg.height, cfg.width, 1))
        .astype(np.float32)
    )
    texts, conf = rec.recognize_crops(crops)
    for t in texts:
        assert set(t) <= {"7"}, t
    # same engine without the prior decodes freely (sanity: the prior
    # actually changed the program, not just the inputs)
    rec0 = CRNN(base, dtype=jnp.float32)
    rec0.variables = rec.variables
    texts0, _ = rec0.recognize_crops(crops)
    assert texts0 != texts or all(set(t) <= {"7"} for t in texts0)

    # misuse guards: wrong shape / wrong mode fail loudly
    bad = tmp_path / "bad.npy"
    np.save(bad, np.zeros((2, 2), np.float32))
    with pytest.raises(ValueError):
        load_lm_prior(cfg.replace(ctc_lm_path=str(bad)))
    with pytest.raises(ValueError):
        load_lm_prior(cfg.replace(ctc_decode="greedy"))


@pytest.mark.slow  # compiles a full serving program (~2 min on CPU)
def test_batched_ocr_attention_beam_decode():
    """attn_decode=beam through the batched serving program: same boxes
    as greedy, confidences are probabilities, text charset-clean."""
    from lightly_ocr_tpu.config import Config
    from lightly_ocr_tpu.engines import CRAFT, CRNN
    from lightly_ocr_tpu.serving.batch import BatchedOCR

    cfg = Config(prediction="Attention", transform="None", max_boxes=8,
                 canvas_size=256, magnify_ratio=1.0)
    det = CRAFT(cfg, dtype=jnp.float32)
    rec = CRNN(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    img = rng.integers(200, 256, (120, 160, 3)).astype(np.float32)
    img[30:44, 20:90] = 10.0
    img[70:84, 40:120] = 10.0

    maps, ratio = det.score_maps(img)
    h2 = int(img.shape[0] * ratio) // 2
    w2 = int(img.shape[1] * ratio) // 2
    region = np.asarray(maps[:h2, :w2, 0], np.float64)
    link = np.asarray(maps[:h2, :w2, 1], np.float64)
    cfg = cfg.replace(
        low_text=float(np.quantile(region, 0.86)),
        text_threshold=float(np.quantile(region, 0.93)),
        link_threshold=float(np.quantile(link, 0.90)),
    )

    a = BatchedOCR(cfg, det.variables, rec.variables, boxes_per_image=8,
                   dtype=jnp.float32)
    b = BatchedOCR(cfg.replace(attn_decode="beam", beam_width=4),
                   det.variables, rec.variables, boxes_per_image=8,
                   dtype=jnp.float32)
    ra = a.run_images([img])
    rb = b.run_images([img])
    assert ra[0], "no boxes fired — the assertions are vacuous"
    assert len(ra[0]) == len(rb[0])
    for ia, ib in zip(ra[0], rb[0]):
        assert np.allclose(ia["rect"], ib["rect"], atol=1e-3)
        assert 0.0 <= ib["confidence"] <= 1.0 + 1e-6
        assert all(ch in cfg.character for ch in ib["text"])


@pytest.mark.slow  # compiles a full serving program (~2 min on CPU)
def test_batched_ocr_beam_decode():
    """The batched serving program honors ctc_decode=beam: same boxes
    as greedy, confidences are posteriors, and the host decode does not
    re-collapse the already-final beam labels."""
    from lightly_ocr_tpu.config import Config
    from lightly_ocr_tpu.engines import CRAFT, CRNN
    from lightly_ocr_tpu.serving.batch import BatchedOCR

    cfg = Config(prediction="CTC", transform="None", max_boxes=8,
                 canvas_size=256, magnify_ratio=1.0)
    det = CRAFT(cfg, dtype=jnp.float32)
    rec = CRNN(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    img = rng.integers(200, 256, (120, 160, 3)).astype(np.float32)
    img[30:44, 20:90] = 10.0
    img[70:84, 40:120] = 10.0

    maps, ratio = det.score_maps(img)
    h2 = int(img.shape[0] * ratio) // 2
    w2 = int(img.shape[1] * ratio) // 2
    region = np.asarray(maps[:h2, :w2, 0], np.float64)
    link = np.asarray(maps[:h2, :w2, 1], np.float64)
    cfg = cfg.replace(
        low_text=float(np.quantile(region, 0.86)),
        text_threshold=float(np.quantile(region, 0.93)),
        link_threshold=float(np.quantile(link, 0.90)),
    )

    cfg_beam = cfg.replace(ctc_decode="beam", beam_width=4)
    a = BatchedOCR(cfg, det.variables, rec.variables, boxes_per_image=8,
                   dtype=jnp.float32)
    b = BatchedOCR(cfg_beam, det.variables, rec.variables,
                   boxes_per_image=8, dtype=jnp.float32)
    ra = a.run_images([img])
    rb = b.run_images([img])
    assert ra[0], "no boxes fired — the assertions are vacuous"
    assert len(ra[0]) == len(rb[0])
    for ia, ib in zip(ra[0], rb[0]):
        assert np.allclose(ia["rect"], ib["rect"], atol=1e-3)
        # beam confidence is a true posterior
        assert 0.0 <= ib["confidence"] <= 1.0 + 1e-6
        assert all(ch in cfg.character for ch in ib["text"])


def test_beam_lm_shallow_fusion():
    """lm=0 is a no-op; a random transition prior shifts the result to
    the exact fused argmax (CTC posterior + once-per-extension prior)."""
    T, C = 4, 3
    rng = np.random.default_rng(11)
    logits = rng.standard_normal((1, T, C)).astype(np.float32) * 2.0
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)[0]

    l0, n0, s0 = ctc_beam_search_decode(jnp.asarray(logits), beam_width=32)
    lz, nz, sz = ctc_beam_search_decode(
        jnp.asarray(logits), beam_width=32, lm=jnp.zeros((C, C))
    )
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(lz))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(sz), atol=1e-5)

    lm = rng.standard_normal((C, C)).astype(np.float32) * 1.5
    exact = _brute_force_posteriors(np.asarray(logp))
    fused = {}
    for key, lp in exact.items():
        prior, prev = 0.0, 0
        for c in key:
            prior += float(lm[prev, c])
            prev = c
        fused[key] = lp + prior
    best = max(fused, key=fused.get)

    labels, lengths, scores = ctc_beam_search_decode(
        jnp.asarray(logits), beam_width=32, lm=jnp.asarray(lm)
    )
    got = tuple(int(v) for v in np.asarray(labels[0, 0])[: int(lengths[0, 0])])
    assert got == best, (got, best)
    np.testing.assert_allclose(float(scores[0, 0]), fused[best], atol=1e-4)


def _attn_teacher_scores(module, variables, feats, seq_list):
    """log P(tokens | feats) for every sequence, in ONE teacher-forced
    apply: the train-mode scan's logits at step t score token y_{t+1}
    given prefix y_1..y_t."""
    S = module.num_steps
    n = len(seq_list)
    text = np.zeros((n, S), np.int32)  # [GO, y1, ..., y_{S-1}]
    for i, toks in enumerate(seq_list):
        text[i, 1 : len(toks)] = toks[:-1]
    logits = module.apply(
        variables, jnp.tile(feats, (n, 1, 1)), jnp.asarray(text), True
    )
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    return {
        tuple(toks): float(
            sum(logp[i, t, toks[t]] for t in range(len(toks)))
        )
        for i, toks in enumerate(seq_list)
    }


def test_attention_beam_exact_tiny():
    """With the beam wide enough that no live prefix is ever pruned,
    the top beam must be the exact argmax over ALL terminated/full
    sequences, scored independently by teacher forcing — and every
    returned beam's internal score must equal its teacher-forced score
    exactly (the accumulation is exact regardless of pruning)."""
    from lightly_ocr_tpu.models.attention import Attention

    C, S, T, H = 4, 3, 5, 8  # classes incl. GO=0, EOS=1; 40 sequences
    module = Attention(hidden=H, num_classes=C, num_steps=S)
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.standard_normal((1, T, H)).astype(np.float32))
    variables = module.init(
        jax.random.key(0), feats, jnp.zeros((1, S), jnp.int32), True
    )

    # All candidates are TERMINATED sequences (<= S-1 non-EOS tokens
    # then EOS): the beam forces EOS at the last step, so unterminated
    # full-length sequences are not in its hypothesis space by design.
    non_eos = [c for c in range(C) if c != 1]
    seqs = []
    for k in range(S):  # k non-EOS tokens then EOS
        for prefix in itertools.product(non_eos, repeat=k):
            seqs.append(tuple(prefix) + (1,))
    exact = _attn_teacher_scores(module, variables, feats, seqs)
    best = max(exact, key=exact.get)

    tokens, scores = module.apply(
        module.init(jax.random.key(0), feats, jnp.zeros((1, S), jnp.int32), True),
        feats, None, False, 48,
    )
    tokens, scores = np.asarray(tokens), np.asarray(scores)

    def as_seq(row):
        out = []
        for v in row:
            out.append(int(v))
            if v == 1:
                break
        return tuple(out)

    got = as_seq(tokens[0, 0])
    assert got == best, (got, best)
    np.testing.assert_allclose(scores[0, 0], exact[best], atol=1e-4)
    # every live beam's internal score == its independent score
    for w in range(tokens.shape[1]):
        if scores[0, w] < -1e29:
            continue
        s = as_seq(tokens[0, w])
        np.testing.assert_allclose(scores[0, w], exact[s], atol=1e-4)
    # beams are unique and sorted
    live = [as_seq(tokens[0, w]) for w in range(tokens.shape[1])
            if scores[0, w] > -1e29]
    assert len(set(live)) == len(live)
    assert np.all(np.diff(scores[0][scores[0] > -1e29]) <= 1e-6)


def test_attention_beam_engine_wiring():
    from lightly_ocr_tpu.config import Config
    from lightly_ocr_tpu.engines import CRNN

    cfg = Config(prediction="Attention", transform="None",
                 attn_decode="beam", beam_width=4)
    rec = CRNN(cfg, dtype=jnp.float32)
    crops = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((3, cfg.height, cfg.width, 1))
        .astype(np.float32)
    )
    texts, conf = rec.recognize_crops(crops)
    assert len(texts) == 3 and conf.shape == (3,)
    assert np.all(conf >= 0) and np.all(conf <= 1 + 1e-6)
    for t in texts:
        assert all(ch in cfg.character for ch in t)

    # the greedy trajectory's own logits score the greedy sequence (the
    # argmax-feedback scan's prev tokens ARE the greedy prefixes); the
    # beam's best must not lose to it
    logits = rec.net.apply(rec.variables, crops, None, False)
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    g = np.asarray(np.argmax(logp, axis=-1))
    tokens, scores = rec.net.apply(
        rec.variables, crops, None, False, cfg.beam_width
    )
    for k in range(3):
        stop = np.nonzero(g[k] == 1)[0]
        if len(stop):
            upto = int(stop[0]) + 1
            g_score = float(
                sum(logp[k, t, g[k, t]] for t in range(upto))
            )
        else:
            # greedy never terminated: the comparable hypothesis in the
            # beam's (all-terminated) space follows greedy for S-1
            # steps then pays the true EOS cost at the last step
            S = cfg.num_steps
            g_score = float(
                sum(logp[k, t, g[k, t]] for t in range(S - 1))
                + logp[k, S - 1, 1]
            )
        assert float(scores[k, 0]) >= g_score - 1e-3, (
            float(scores[k, 0]), g_score,
        )


def test_beam_empty_and_repeat_cases():
    # logits overwhelmingly blank -> empty string wins
    T, C = 6, 4
    logits = np.full((1, T, C), -8.0, np.float32)
    logits[:, :, 0] = 8.0
    labels, lengths, scores = ctc_beam_search_decode(
        jnp.asarray(logits), beam_width=8
    )
    assert int(lengths[0, 0]) == 0
    assert float(scores[0, 0]) > -1e-3  # P(empty) ~ 1

    # a-blank-a pattern -> 'aa' (genuine repeat via separating blank)
    logits = np.full((1, 5, 4), -8.0, np.float32)
    logits[0, 0, 1] = 8.0
    logits[0, 1, 1] = 8.0
    logits[0, 2, 0] = 8.0
    logits[0, 3, 1] = 8.0
    logits[0, 4, 0] = 8.0
    labels, lengths, _ = ctc_beam_search_decode(
        jnp.asarray(logits), beam_width=8
    )
    got = [int(v) for v in np.asarray(labels[0, 0])[: int(lengths[0, 0])]]
    assert got == [1, 1]
