"""CTC loss parity vs torch.nn.CTCLoss; greedy decode vs converter."""
import numpy as np
import pytest

from lightly_ocr_tpu.ops.ctc import (
    cross_entropy_ignore_index,
    ctc_forward_logprob,
    ctc_greedy_decode,
    ctc_loss,
)
from lightly_ocr_tpu.text import CTCLabelConverter

torch = pytest.importorskip("torch")


pytestmark = pytest.mark.parity

def _torch_ctc(log_probs, labels, in_len, lab_len, reduction="mean", zero_inf=True):
    # torch wants [T, B, C] and flat targets
    lp = torch.from_numpy(np.transpose(log_probs, (1, 0, 2))).double()
    flat = []
    for row, l in zip(labels, lab_len):
        flat.extend(row[:l])
    fn = torch.nn.CTCLoss(blank=0, reduction=reduction, zero_infinity=zero_inf)
    return fn(
        lp,
        torch.tensor(flat, dtype=torch.int32),
        torch.tensor(in_len, dtype=torch.int32),
        torch.tensor(lab_len, dtype=torch.int32),
    ).item()


def _rand_case(rng, B=4, T=12, C=6, Lmax=5):
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    log_probs = logits - np.log(
        np.exp(logits).sum(-1, keepdims=True)
    )  # log softmax
    lab_len = rng.integers(1, Lmax + 1, size=B).astype(np.int32)
    labels = np.zeros((B, Lmax), np.int32)
    for i in range(B):
        labels[i, : lab_len[i]] = rng.integers(1, C, size=lab_len[i])
    lo = min(Lmax * 2 + 1, T)
    in_len = rng.integers(lo, T + 1, size=B).astype(np.int32)
    return log_probs, labels, in_len, lab_len


@pytest.mark.parametrize("reduction", ["mean", "sum", "none"])
def test_ctc_loss_matches_torch(rng, reduction):
    log_probs, labels, in_len, lab_len = _rand_case(rng)
    ours = np.asarray(
        ctc_loss(log_probs, labels, in_len, lab_len, reduction=reduction)
    )
    if reduction == "none":
        lp = torch.from_numpy(np.transpose(log_probs, (1, 0, 2))).double()
        flat = [x for row, l in zip(labels, lab_len) for x in row[:l]]
        ref = torch.nn.functional.ctc_loss(
            lp,
            torch.tensor(flat, dtype=torch.int32),
            torch.tensor(in_len, dtype=torch.int32),
            torch.tensor(lab_len, dtype=torch.int32),
            blank=0,
            reduction="none",
            zero_infinity=True,
        ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
    else:
        ref = _torch_ctc(log_probs, labels, in_len, lab_len, reduction)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_ctc_loss_short_input_zero_infinity(rng):
    # label longer than input -> impossible -> inf -> zeroed
    log_probs, labels, in_len, lab_len = _rand_case(rng, B=2, T=6, Lmax=5)
    in_len = np.array([2, 6], np.int32)
    lab_len = np.array([5, 2], np.int32)
    ours = np.asarray(
        ctc_loss(log_probs, labels, in_len, lab_len, reduction="none")
    )
    assert ours[0] == 0.0  # zeroed impossible case
    assert np.isfinite(ours).all()
    ref = _torch_ctc(log_probs, labels, in_len, lab_len, "mean", True)
    mine = np.asarray(ctc_loss(log_probs, labels, in_len, lab_len))
    np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-5)


def test_ctc_loss_full_length_batch(rng):
    # The training configuration: uniform T=26, C=37
    log_probs, labels, in_len, lab_len = _rand_case(rng, B=8, T=26, C=37, Lmax=10)
    in_len[:] = 26
    ref = _torch_ctc(log_probs, labels, in_len, lab_len)
    mine = np.asarray(ctc_loss(log_probs, labels, in_len, lab_len))
    np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-5)


def test_ctc_loss_grad_finite(rng):
    import jax
    import jax.numpy as jnp

    log_probs, labels, in_len, lab_len = _rand_case(rng)

    def f(lp):
        return ctc_loss(jax.nn.log_softmax(lp, -1), labels, in_len, lab_len)

    g = jax.grad(f)(jnp.asarray(log_probs))
    assert np.isfinite(np.asarray(g)).all()


def test_ctc_loss_grad_matches_torch(rng):
    import jax
    import jax.numpy as jnp

    B, T, C = 3, 10, 5
    logits = rng.standard_normal((B, T, C)).astype(np.float64)
    lab_len = np.array([2, 3, 1], np.int32)
    labels = np.zeros((B, 3), np.int32)
    labels[0, :2] = [1, 2]
    labels[1, :3] = [3, 3, 4]
    labels[2, :1] = [2]
    in_len = np.array([10, 8, 10], np.int32)

    def f(lg):
        return ctc_loss(jax.nn.log_softmax(lg, -1), labels, in_len, lab_len)

    ours = np.asarray(jax.grad(f)(jnp.asarray(logits)))

    t_logits = torch.from_numpy(logits).requires_grad_(True)
    lp = torch.nn.functional.log_softmax(t_logits, dim=-1).transpose(0, 1)
    flat = [x for row, l in zip(labels, lab_len) for x in row[:l]]
    loss = torch.nn.functional.ctc_loss(
        lp,
        torch.tensor(flat, dtype=torch.int32),
        torch.tensor(in_len, dtype=torch.int32),
        torch.tensor(lab_len, dtype=torch.int32),
        blank=0,
        zero_infinity=True,
    )
    loss.backward()
    np.testing.assert_allclose(ours, t_logits.grad.numpy(), rtol=1e-4, atol=1e-6)


def test_greedy_decode_matches_converter(rng):
    conv = CTCLabelConverter("ab")
    # logits engineered: a a blank b b -> "ab"
    seq = [1, 1, 0, 2, 2]
    logits = np.full((1, len(seq), 3), -5.0, np.float32)
    for t, c in enumerate(seq):
        logits[0, t, c] = 5.0
    packed, lengths = ctc_greedy_decode(logits)
    assert lengths.tolist() == [2]
    texts = conv.decode(np.asarray(packed[0, : int(lengths[0])]), [2])
    assert texts == ["ab"]


def test_greedy_decode_random_vs_host(rng):
    conv = CTCLabelConverter("0123456789abcdefghijklmnopqrstuvwxyz")
    logits = rng.standard_normal((5, 26, 37)).astype(np.float32)
    packed, lengths = ctc_greedy_decode(logits)
    # host reference: flat argmax decode through the converter
    idx = logits.argmax(-1)
    ref = conv.decode(idx.reshape(-1), [26] * 5)
    mine = [
        "".join(conv.character[i] for i in np.asarray(p[:l]))
        for p, l in zip(packed, lengths)
    ]
    assert mine == ref


def test_cross_entropy_ignore_index_matches_torch(rng):
    B, T, C = 4, 7, 9
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    targets = rng.integers(0, C, size=(B, T)).astype(np.int32)
    ours = np.asarray(cross_entropy_ignore_index(logits, targets))
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).reshape(-1, C),
        torch.from_numpy(targets.astype(np.int64)).reshape(-1),
        ignore_index=0,
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
