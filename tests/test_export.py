"""StableHLO export roundtrip (the L5 counterpart; reference ONNX export
was blocked on grid_sample — ours exports the full TPS path)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightly_ocr_tpu.config import Config
from lightly_ocr_tpu.export import (
    export_craft,
    export_crnn,
    load_exported,
    save_exported,
)


pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def tiny_cfg():
    return Config(
        prediction="CTC",
        transform="TPS",  # the op that broke the reference export
        output_channel=64,
        hidden_size=32,
        width=64,
        num_fiducial=8,
        character="abcdef",
    )


def test_crnn_export_roundtrip(tmp_path, tiny_cfg, rng):
    exported, _ = export_crnn(tiny_cfg, batch=2)
    path = str(tmp_path / "crnn.shlo")
    save_exported(exported, path)
    restored = load_exported(path)

    x = jnp.asarray(rng.standard_normal((2, 32, 64, 1)).astype(np.float32))
    out = restored.call(x)
    out = out[0] if isinstance(out, (tuple, list)) else out
    assert np.asarray(out).shape == (2, 17, 7)  # T frames x 7 classes

    # must match the live model numerically
    from lightly_ocr_tpu.models.crnn import CRNNet

    # (re-create with same seed used inside export_crnn)
    model = CRNNet(tiny_cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((2, 32, 64, 1)), None, False
    )
    live = model.apply(variables, x, None, False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(live), atol=1e-5, rtol=1e-5
    )


def test_craft_export_roundtrip(tmp_path, rng):
    exported, _ = export_craft(batch=1, height=64, width=64)
    path = str(tmp_path / "craft.shlo")
    save_exported(exported, path)
    restored = load_exported(path)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    out = restored.call(x)
    out = out[0] if isinstance(out, (tuple, list)) else out
    assert np.asarray(out).shape == (1, 32, 32, 2)
