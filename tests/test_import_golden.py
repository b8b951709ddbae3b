"""Full-key importer goldens against the reference's REAL state_dict trees.

Random-weight parity (test_model_parity.py) proves the math; these tests
prove the *import mapping on the real artifacts*: every key the reference's
shipped checkpoints contain (``VGG_UNet().state_dict()`` /
``CRNNet(CONFIG).state_dict()`` — the exact trees ``ocr/net.py:59-69``
loads from CRAFT.pth / CRNN.pth) must be consumed by name, and every flax
template leaf must be sourced — zero fallbacks, zero silently-dropped
weights, both directions.  The trees are constructed from the reference
CODE, so no checkpoint download is needed.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightly_ocr_tpu.config import Config
from lightly_ocr_tpu.models import CRNNet, VGG_UNet
from lightly_ocr_tpu.utils.torch_import import (
    audit_torch_import,
    export_torch_state_dict,
    import_torch_state_dict,
)

from reference_oracle import load_reference, reference_config

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/ocr"), reason="reference mount absent"
)


def _audit_both_ways(variables, t_model):
    sd = {k: v for k, v in t_model.state_dict().items()}
    missing, unconsumed = audit_torch_import(variables, sd)
    assert not missing, (
        f"{len(missing)} flax leaves have no torch source (import would "
        f"silently keep random init): {missing[:8]}"
    )
    assert not unconsumed, (
        f"{len(unconsumed)} real torch weights would be silently dropped: "
        f"{unconsumed[:8]}"
    )
    # strict import must succeed AND be invertible: exporting the imported
    # tree reproduces every torch tensor bit-exactly.
    back = import_torch_state_dict(variables, sd, strict=True)
    ours = export_torch_state_dict(back)
    for k, v in sd.items():
        if k.endswith(("num_batches_tracked", "inv_delta_C", "P_hat")):
            continue  # recomputed buffers, never imported
        np.testing.assert_array_equal(
            ours[k], v.detach().cpu().numpy(), err_msg=k
        )


def test_craft_full_key_import(rng):
    ref_model_mod, _ = load_reference()
    t_model = ref_model_mod.VGG_UNet(pretrained=False, freeze=False).eval()
    model = VGG_UNet()
    variables = model.init(
        jax.random.key(0),
        jnp.asarray(rng.standard_normal((1, 64, 96, 3)).astype(np.float32)),
    )
    _audit_both_ways(variables, t_model)


@pytest.mark.parametrize("prediction", ["CTC", "Attention"])
@pytest.mark.slow
def test_crnn_full_key_import(rng, prediction):
    ref_model_mod, _ = load_reference()
    t_model = ref_model_mod.CRNNet(
        reference_config(prediction=prediction), device="cpu"
    ).eval()
    cfg = Config(prediction=prediction, transform="TPS")
    model = CRNNet(cfg)
    variables = model.init(
        jax.random.key(0),
        jnp.asarray(np.zeros((1, 32, 100, 1), np.float32)),
        jnp.asarray(np.zeros((1, 26), np.int32)),
        False,
    )
    _audit_both_ways(variables, t_model)


def test_dataparallel_prefix_stripped(rng):
    """Checkpoints saved from nn.DataParallel carry 'module.' prefixes
    (the reference strips them in copyStateDict, ocr/net.py:24-34) —
    the audit must see through them at real-model scale."""
    ref_model_mod, _ = load_reference()
    t_model = ref_model_mod.VGG_UNet(pretrained=False, freeze=False).eval()
    sd = {"module." + k: v for k, v in t_model.state_dict().items()}
    model = VGG_UNet()
    variables = model.init(
        jax.random.key(0),
        jnp.asarray(rng.standard_normal((1, 64, 96, 3)).astype(np.float32)),
    )
    missing, unconsumed = audit_torch_import(variables, sd)
    assert not missing and not unconsumed
