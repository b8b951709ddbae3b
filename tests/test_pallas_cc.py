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
