"""Multi-chip behavior on the virtual 8-CPU-device mesh.

Covers the paths the reference served through ``nn.DataParallel``
(``ocr/net.py:62-63,137-138`` inference, ``crnn.py:100-101`` training):

* sharded batched inference == unsharded inference, bit-level;
* data-parallel train step == single-device train step (this is the
  BN/batch-stats sync check: GSPMD must reduce batch statistics across
  the data axis, not per-shard);
* the tensor-parallel sharding rules hit the *output* dims of each
  weight family — never a contraction dim.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lightly_ocr_tpu.config import Config
from lightly_ocr_tpu.parallel import make_mesh, shard_batch, shard_variables
from lightly_ocr_tpu.parallel.mesh import param_sharding_rules
from lightly_ocr_tpu.train import TrainState, init_train_state, make_train_step

from test_training import make_batch, tiny_cfg

pytestmark = [pytest.mark.multichip, pytest.mark.slow]


def _tiny_ocr_cfg():
    return Config(
        prediction="Attention",
        transform="TPS",
        sequence="biLSTM",
        output_channel=64,
        hidden_size=32,
        num_fiducial=8,
        max_boxes=4,
        character="abcdefghij",
        batch_max_len=8,
    )


def test_sharded_inference_matches_unsharded(rng):
    """BatchedOCR over an 8-device data mesh == the single-program path."""
    from lightly_ocr_tpu.models.crnn import CRNNet
    from lightly_ocr_tpu.models.vgg_unet import VGG_UNet
    from lightly_ocr_tpu.serving.batch import BatchedOCR

    assert jax.device_count() == 8
    cfg = _tiny_ocr_cfg()
    H, W = 96, 64  # tiny canvas; the program structure is size-agnostic
    B, M = 8, cfg.max_boxes

    det_net = VGG_UNet(dtype=jnp.float32)
    canv = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))
    det_vars = det_net.init(jax.random.key(0), canv[:1])
    rec_net = CRNNet(cfg, dtype=jnp.float32)
    rec_vars = rec_net.init(
        jax.random.key(1),
        jnp.zeros((2, cfg.height, cfg.width, 1)),
        jnp.zeros((2, cfg.num_steps), jnp.int32),
        False,
    )
    gray = jnp.asarray(
        (rng.standard_normal((B, H, W)) * 40 + 128).astype(np.float32)
    )

    plain = BatchedOCR(
        cfg, det_vars, rec_vars, boxes_per_image=M, dtype=jnp.float32
    )
    mesh = make_mesh(8, 1)
    sharded = BatchedOCR(
        cfg, det_vars, rec_vars, boxes_per_image=M, dtype=jnp.float32,
        mesh=mesh,
    )

    ref = plain(canv, gray)
    out = sharded(canv, gray)
    assert len(out["confidence"].sharding.device_set) == 8
    for key in ("rects", "valid", "pred_idx"):
        np.testing.assert_array_equal(np.asarray(ref[key]), np.asarray(out[key]))
    np.testing.assert_allclose(
        np.asarray(ref["confidence"]),
        np.asarray(out["confidence"]),
        rtol=1e-5,
        atol=1e-6,
    )


def test_dp_train_step_matches_single_device(rng):
    """One jitted step over the 8-device mesh computes the same loss and
    parameters as the unsharded step — proves grads AND BatchNorm batch
    statistics are synchronized across shards by GSPMD."""
    cfg = tiny_cfg("CTC")
    model, state0 = init_train_state(cfg, jax.random.key(0))
    step = make_train_step(model, cfg)
    batch, _ = make_batch(cfg, rng, B=8)

    _, m_single = step(state0, batch)

    mesh = make_mesh(8, 1)
    state_s = TrainState(
        *shard_variables(tuple(state0[:3]), mesh), state0.step
    )
    batch_s = shard_batch(batch, mesh)
    new_state, m_dp = step(state_s, batch_s)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_dp["loss"]), rtol=1e-5
    )
    # grad_norm is a global L2 over the whole grad tree; the sharded
    # program reduces it via psum over 8 partial sums while the single-
    # device program reduces sequentially — f32 reassociation over ~1e6
    # squares lands ~2e-4 rel apart now that real gradients flow through
    # the LSTM (pre-round-4 the saturated-constant LSTM zeroed most of
    # the tree and this held at 1e-4).
    np.testing.assert_allclose(
        float(m_single["grad_norm"]), float(m_dp["grad_norm"]), rtol=1e-3
    )
    # batch_stats must reflect the GLOBAL batch mean, not a shard's
    single_state, _ = step(state0, batch)
    for a, b in zip(
        jax.tree_util.tree_leaves(single_state.batch_stats),
        jax.tree_util.tree_leaves(new_state.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_tp_rules_shard_output_dims_only():
    """The model-axis rules are layout-aware: torch-layout LSTM weights
    shard dim 0 (the gate/output dim of the transposed matmul), conv
    kernels shard output channels, Dense kernels shard the last dim."""
    mesh = make_mesh(4, 2)
    cfg = tiny_cfg("Attention", transform="TPS")
    _, state = init_train_state(cfg, jax.random.key(0))
    rules = param_sharding_rules(state.params, mesh)

    flat = {
        "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        ): s.spec
        for path, s in jax.tree_util.tree_flatten_with_path(rules)[0]
    }
    lstm_ih = {k: v for k, v in flat.items() if "weight_ih" in k}
    lstm_hh = {k: v for k, v in flat.items() if "weight_hh" in k}
    assert lstm_ih and all(v == P("model", None) for v in lstm_ih.values())
    assert lstm_hh and all(v == P("model", None) for v in lstm_hh.values())

    # find actual 4D conv kernels and 2D dense kernels by shape
    shapes = {
        "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        ): np.shape(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]
    }
    conv4 = [k for k, s in shapes.items() if k.endswith("kernel") and len(s) == 4
             and s[3] % 2 == 0 and s[3] >= 4]
    dense2 = [k for k, s in shapes.items() if k.endswith("kernel") and len(s) == 2
              and s[1] % 2 == 0 and s[1] >= 4]
    assert conv4 and all(
        flat[k] == P(None, None, None, "model") for k in conv4
    )
    assert dense2 and all(flat[k] == P(None, "model") for k in dense2)
    # biases replicated
    biases = [k for k, s in shapes.items() if k.endswith("bias")]
    assert biases and all(flat[k] == P() for k in biases)


def test_tp_forward_matches_replicated(rng):
    """A 4x2 mesh TP-sharded recognizer forward == fully replicated."""
    from lightly_ocr_tpu.models.crnn import CRNNet

    cfg = tiny_cfg("CTC")
    model = CRNNet(cfg, dtype=jnp.float32)
    images = jnp.asarray(
        rng.standard_normal((8, cfg.height, cfg.width, 1)).astype(np.float32)
    )
    variables = model.init(jax.random.key(0), images[:2], None, False)
    f = jax.jit(lambda v, x: model.apply(v, x, None, False))
    ref = f(variables, images)

    mesh = make_mesh(4, 2)
    shard_v = shard_variables(variables, mesh)
    imgs = jax.device_put(
        images, jax.sharding.NamedSharding(mesh, P("data"))
    )
    out = f(shard_v, imgs)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=2e-4, atol=2e-5
    )
