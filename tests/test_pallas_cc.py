"""Pallas CC kernel vs the XLA implementation (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from lightly_ocr_tpu.ops.detection import label_components
from lightly_ocr_tpu.ops.pallas_cc import label_components_pallas


def _partition_equal(a, b, fg):
    pairs = set(zip(np.asarray(a)[fg].tolist(), np.asarray(b)[fg].tolist()))
    return (
        len({p[0] for p in pairs}) == len(pairs)
        and len({p[1] for p in pairs}) == len(pairs)
    )


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.slow
def test_matches_xla_random(rng, seed):
    r = np.random.default_rng(seed)
    mask = r.random((32, 128)) > 0.7
    ref = label_components(jnp.asarray(mask), max_rounds=64)
    out = label_components_pallas(jnp.asarray(mask), rounds=16, interpret=True)
    # labels identical (both use min-linear-index labels)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.slow
def test_text_blobs(rng):
    mask = np.zeros((64, 128), bool)
    mask[10:20, 10:60] = True
    mask[30:40, 20:100] = True
    mask[50:60, 5:15] = True
    out = np.asarray(
        label_components_pallas(jnp.asarray(mask), rounds=2, interpret=True)
    )
    ref = np.asarray(label_components(jnp.asarray(mask)))
    np.testing.assert_array_equal(out, ref)


def test_l_shape_connectivity():
    mask = np.zeros((32, 128), bool)
    mask[2:20, 3] = True
    mask[19, 3:60] = True
    out = np.asarray(
        label_components_pallas(jnp.asarray(mask), rounds=4, interpret=True)
    )
    assert len(set(out[mask].tolist())) == 1


@pytest.mark.slow
def test_batched(rng):
    masks = rng.random((3, 16, 128)) > 0.6
    out = np.asarray(
        label_components_pallas(jnp.asarray(masks), rounds=8, interpret=True)
    )
    for i in range(3):
        ref = np.asarray(label_components(jnp.asarray(masks[i]), max_rounds=32))
        np.testing.assert_array_equal(out[i], ref)


# ---------------------------------------------------------------------------
# adversarial masks + the convergence-checked production wrapper
# ---------------------------------------------------------------------------


def _spiral(H, W, pitch=8):
    """ONE connected rectangular spiral — worst case for directional
    propagation: the min label must travel the whole arc length, one
    quarter-lap per directional sweep."""
    mask = np.zeros((H, W), bool)
    top, left, bottom, right = 2, 2, H - 3, W - 3
    while top < bottom and left < right:
        mask[top, left:right + 1] = True  # top edge ->
        mask[top:bottom + 1, right] = True  # right edge v
        mask[bottom, left + pitch:right + 1] = True  # bottom edge <-
        # inner left edge ^ , stopping at the next lap's top row
        mask[top + pitch:bottom + 1, left + pitch] = True
        top += pitch
        left += pitch
        bottom -= pitch
        right -= pitch
    return mask


def _comb(H, W, spacing=6):
    """Serpentine: vertical strips joined alternately at top and bottom
    — label information must zigzag the full width."""
    mask = np.zeros((H, W), bool)
    prev = None
    for i, c in enumerate(range(2, W - 2, spacing)):
        mask[2:H - 2, c] = True
        if prev is not None:
            r = 2 if i % 2 == 0 else H - 3
            mask[r, prev : c + 1] = True
        prev = c
    return mask


def _staircase(H, W, step=4):
    mask = np.zeros((H, W), bool)
    r, c = H - 3, 2
    while r > 2 and c < W - 2 - step:
        mask[r - step:r + 1, c] = True
        mask[r - step, c:c + step + 1] = True
        r -= step
        c += step
    return mask


from lightly_ocr_tpu.ops.pallas_cc import (  # noqa: E402
    label_components_checked,
    labels_converged,
)


def test_labels_converged_detects_fixed_point():
    mask = np.zeros((16, 128), bool)
    mask[4:8, 10:50] = True
    lab = np.asarray(label_components(jnp.asarray(mask), max_rounds=32))
    assert bool(labels_converged(jnp.asarray(mask), jnp.asarray(lab)))
    # corrupt one pixel's label -> residual must fire
    bad = lab.copy()
    bad[5, 20] = 999
    assert not bool(labels_converged(jnp.asarray(mask), jnp.asarray(bad)))


@pytest.mark.parametrize("maker", [_comb, _staircase])
@pytest.mark.slow
def test_adversarial_escalation_small(maker):
    """Snaking masks defeat the 2-round bound; the checked wrapper must
    detect it and escalate to the converged partition."""
    mask = maker(64, 128)
    ref = np.asarray(label_components(jnp.asarray(mask), max_rounds=128))
    under = label_components_pallas(jnp.asarray(mask), rounds=2, interpret=True)
    assert not bool(labels_converged(jnp.asarray(mask), under)), (
        "mask too easy: 2 rounds already converged"
    )
    out = np.asarray(
        label_components_checked(
            jnp.asarray(mask), rounds=2, max_rounds=128, interpret=True
        )
    )
    np.testing.assert_array_equal(out, ref)
    assert len(set(out[mask].tolist())) == 1  # a single component


@pytest.mark.slow
def test_adversarial_spiral_512x384():
    """The production score-map size with a worst-case snake: rounds=6
    under-propagates; the residual catches it and the escalated result
    is one component (the partition cv2 would produce)."""
    mask = _spiral(512, 384, pitch=10)
    under = label_components_pallas(jnp.asarray(mask), rounds=6, interpret=True)
    assert not bool(labels_converged(jnp.asarray(mask), under))
    out = np.asarray(
        label_components_checked(
            jnp.asarray(mask), rounds=6, max_rounds=256, interpret=True
        )
    )
    assert len(set(out[mask].tolist())) == 1
