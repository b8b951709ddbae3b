"""CRAFT detector training (the reference's unshipped TODO,
README.md:110): synthetic gaussian supervision, OHEM-MSE, DP mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightly_ocr_tpu.train.craft import (
    CraftTrainState,
    _kth_largest_threshold,
    init_craft_state,
    make_craft_train_step,
    ohem_mse,
    synthesize_batch,
    train_craft,
)

pytestmark = pytest.mark.slow


def test_synthesize_batch_shapes_and_targets(rng):
    data = synthesize_batch(rng, 2, 128, 96)
    assert data["images"].shape == (2, 128, 96, 3)
    assert data["region"].shape == (2, 64, 48)
    assert data["affinity"].shape == (2, 64, 48)
    # gaussians peak near 1 where characters were placed
    assert data["region"].max() > 0.9
    assert data["affinity"].max() > 0.9
    assert data["region"].min() >= 0.0 and data["region"].max() <= 1.0


def test_kth_largest_threshold_matches_sort(rng):
    vals = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    for k in (10, 100, 1000):
        t = float(_kth_largest_threshold(vals, jnp.int32(k)))
        above = int(np.sum(np.asarray(vals) >= t))
        # binary search over 16 halvings: within a tight band around k
        assert 0.8 * k <= above <= 1.3 * k + 4


def test_ohem_keeps_positives_and_hard_negatives():
    pred = jnp.zeros((1, 8, 8))
    target = jnp.zeros((1, 8, 8)).at[0, 2, 2].set(1.0)
    # one positive (err 1.0), negatives all err 0 -> loss dominated by pos
    loss = float(ohem_mse(pred, target))
    assert 0.5 < loss <= 1.1

    # a huge negative error must be selected as a hard negative
    pred2 = pred.at[0, 5, 5].set(3.0)
    loss2 = float(ohem_mse(pred2, target))
    assert loss2 > loss


def test_craft_loss_decreases_single_batch(rng):
    model, state = init_craft_state(jax.random.key(0), lr=3e-3,
                                    image_hw=(96, 64))
    step = make_craft_train_step(model, lr=3e-3)
    batch = synthesize_batch(rng, 2, 96, 64)
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(state.step) == 6


def test_craft_training_multidevice(rng):
    from lightly_ocr_tpu.parallel.mesh import make_mesh

    assert jax.device_count() == 8
    mesh = make_mesh(8, 1)
    _, state, losses = train_craft(
        num_steps=3, batch=8, height=96, width=64, mesh=mesh, log_every=0
    )
    assert all(np.isfinite(losses))
    assert int(state.step) == 3


def test_craft_checkpoint_written(tmp_path, rng):
    _, state, _ = train_craft(
        num_steps=1, batch=1, height=64, width=64,
        checkpoint_dir=str(tmp_path / "ck"), log_every=0,
    )
    from lightly_ocr_tpu.utils.checkpoint import restore_checkpoint

    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    restored, step = restore_checkpoint(str(tmp_path / "ck"), template)
    assert step == 1
    a = jax.tree_util.tree_leaves(restored["params"])
    b = jax.tree_util.tree_leaves(state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _fake_torchvision_vgg16_bn(rng, template_params):
    """torchvision-format vgg16_bn features dict (numpy) with the exact
    conv/BN shapes of basenet slices 1-4."""
    from lightly_ocr_tpu.models.vgg_unet import _VGG_SLICES

    sd = {}
    for slice_name, ops in _VGG_SLICES.items():
        for op in ops:
            if op[0] != "C":
                continue
            idx = op[1]
            k = template_params["basenet"][slice_name][str(idx)]["kernel"]
            kh, kw, cin, cout = k.shape
            sd[f"features.{idx}.weight"] = rng.standard_normal(
                (cout, cin, kh, kw)
            ).astype(np.float32)
            sd[f"features.{idx}.bias"] = rng.standard_normal(cout).astype(
                np.float32
            )
            sd[f"features.{idx + 1}.weight"] = rng.standard_normal(
                cout
            ).astype(np.float32)
            sd[f"features.{idx + 1}.bias"] = rng.standard_normal(
                cout
            ).astype(np.float32)
            sd[f"features.{idx + 1}.running_mean"] = rng.standard_normal(
                cout
            ).astype(np.float32)
            sd[f"features.{idx + 1}.running_var"] = np.abs(
                rng.standard_normal(cout)
            ).astype(np.float32)
    return sd


def test_backbone_init_from_torchvision(rng):
    """load_torchvision_backbone seeds slices 1-4 exactly (kernel OIHW
    -> HWIO transpose, BN scale/bias/mean/var) and leaves slice5 +
    decoder untouched (reference vgg_bn.py:36-43,52-55)."""
    from lightly_ocr_tpu.train.craft import load_torchvision_backbone

    model, state = init_craft_state(jax.random.key(0), image_hw=(64, 64))
    sd = _fake_torchvision_vgg16_bn(rng, state.params)
    before5 = jax.tree_util.tree_map(
        np.asarray, state.params["basenet"]["slice5"]
    )
    out = load_torchvision_backbone(
        {"params": state.params, "batch_stats": state.batch_stats}, sd
    )
    k = out["params"]["basenet"]["slice1"]["0"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(k),
        np.transpose(sd["features.0.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_array_equal(
        np.asarray(out["params"]["basenet"]["slice4"]["37"]["bias"]),
        sd["features.37.bias"],
    )
    np.testing.assert_array_equal(
        np.asarray(out["batch_stats"]["basenet"]["slice2"]["15"]["mean"]),
        sd["features.15.running_mean"],
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(before5),
        jax.tree_util.tree_leaves(out["params"]["basenet"]["slice5"]),
    ):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_backbone_init_shape_mismatch_raises(rng):
    from lightly_ocr_tpu.train.craft import load_torchvision_backbone

    _, state = init_craft_state(jax.random.key(0), image_hw=(64, 64))
    sd = _fake_torchvision_vgg16_bn(rng, state.params)
    sd["features.0.weight"] = sd["features.0.weight"][:32]  # wrong cout
    with pytest.raises(ValueError, match="shape"):
        load_torchvision_backbone(
            {"params": state.params, "batch_stats": state.batch_stats}, sd
        )


def test_freeze_slice1_pins_params(rng):
    """freeze=('slice1',): after real train steps slice1 params are
    bit-identical while the decoder moved (reference vgg_bn.py:57-60)."""
    _, state, losses = train_craft(
        num_steps=2, batch=1, height=64, width=64, log_every=0,
        freeze=("slice1",),
    )
    _, init_state = init_craft_state(
        jax.random.key(0), image_hw=(64, 64), freeze=("slice1",)
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(init_state.params["basenet"]["slice1"]),
        jax.tree_util.tree_leaves(state.params["basenet"]["slice1"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = [
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(init_state.params["upconv1"]),
            jax.tree_util.tree_leaves(state.params["upconv1"]),
        )
    ]
    assert all(moved), "unfrozen decoder params must update"


def test_freeze_excluded_from_clip_norm():
    """Frozen gradients must be zeroed BEFORE clip_by_global_norm: in
    torch, requires_grad=False params have no .grad, so clipping sees
    only trainable grads (crnn.py:264-267).  A huge frozen-slice
    gradient must therefore not shrink the trainable update."""
    import optax

    from lightly_ocr_tpu.train.craft import make_craft_optimizer

    params = {
        "basenet": {"slice1": {"w": jnp.zeros((4,))}},
        "upconv1": {"w": jnp.zeros((4,))},
    }
    # Trainable grad well under the clip=5 threshold on its own; the
    # frozen grad alone would blow the global norm 1000x past it.
    grads = {
        "basenet": {"slice1": {"w": jnp.full((4,), 1e4)}},
        "upconv1": {"w": jnp.full((4,), 1.0)},
    }
    tx = make_craft_optimizer(lr=1.0, clip=5.0, freeze=("slice1",))
    updates, _ = tx.update(grads, tx.init(params), params)

    np.testing.assert_array_equal(
        np.asarray(updates["basenet"]["slice1"]["w"]), np.zeros((4,))
    )
    # Reference for the trainable update: same optimizer with the
    # frozen grads absent entirely.
    tx_ref = make_craft_optimizer(lr=1.0, clip=5.0)
    ref_grads = {
        "basenet": {"slice1": {"w": jnp.zeros((4,))}},
        "upconv1": {"w": jnp.full((4,), 1.0)},
    }
    ref_updates, _ = tx_ref.update(ref_grads, tx_ref.init(params), params)
    np.testing.assert_allclose(
        np.asarray(updates["upconv1"]["w"]),
        np.asarray(ref_updates["upconv1"]["w"]),
        rtol=1e-6,
    )
