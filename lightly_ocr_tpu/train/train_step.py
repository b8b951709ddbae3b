"""Jitted CRNN training/eval steps with data-parallel sharding.

Functional rebuild of the reference train loop internals
(``ocr/train/crnn.py:240-268``): forward (teacher-forced for attention,
log-softmax + CTC for the CTC head), global-norm gradient clip at 5,
Adadelta (rho .95, eps 1e-8) or Adam.  Differences by design:

* one ``jax.jit`` program per step — loss, grads, clip, update, and BN
  statistics all on device (the reference toggles cudnn off around
  ctc_loss and syncs per step);
* gradients are averaged across the mesh's data axis by XLA via sharding
  (the DataParallel scatter/gather has no explicit counterpart);
* the optimizer state is part of the returned TrainState and is
  checkpointed (the reference never saved it).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from lightly_ocr_tpu.config import Config
from lightly_ocr_tpu.models.crnn import CRNNet
from lightly_ocr_tpu.ops.ctc import cross_entropy_ignore_index, ctc_loss


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """grad-clip(5) + Adam | Adadelta per config (``crnn.py:126-129``)."""
    if cfg.adam:
        opt = optax.adam(cfg.lr, b1=cfg.beta1, b2=0.999)
    else:
        opt = optax.adadelta(cfg.lr, rho=cfg.rho, eps=cfg.eps)
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)


def init_train_state(
    cfg: Config, rng: jax.Array, model: CRNNet | None = None
) -> tuple[CRNNet, TrainState]:
    model = model or CRNNet(cfg)
    dummy = jnp.zeros(
        (2, cfg.height, cfg.width, cfg.derived_input_channel), jnp.float32
    )
    text = jnp.zeros((2, cfg.num_steps + 1), jnp.int32)
    variables = model.init(rng, dummy, text, True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = make_optimizer(cfg).init(params)
    return model, TrainState(params, batch_stats, opt_state, jnp.int32(0))


def loss_fn(
    model: CRNNet, cfg: Config, params, batch_stats, batch, train: bool = True
):
    """batch: images [B,H,W,C] in [-1,1]; CTC: labels [B,L] + lengths [B];
    Attention: text [B, batch_max_len+2] ([GO]-prefixed) + lengths."""
    variables = {"params": params, "batch_stats": batch_stats}

    def apply_fn(v, images, text):
        return model.apply(
            v, images, text, train,
            mutable=["batch_stats"] if train else False,
        )

    if train and cfg.train_remat:
        # Rematerialize the forward during backprop: activations are
        # not kept for the backward pass, trading ~1 extra forward of
        # FLOPs for ~half the activation HBM (jax.checkpoint).  The
        # dot-saveable policy keeps matmul outputs (cheap to store,
        # expensive to recompute) and recomputes the elementwise rest.
        apply_fn = jax.checkpoint(
            apply_fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )

    if cfg.prediction == "CTC":
        outputs = apply_fn(variables, batch["images"], None)
        preds, new_stats = outputs if train else (outputs, {"batch_stats": batch_stats})
        logp = jax.nn.log_softmax(preds, axis=2)
        T = preds.shape[1]
        loss = ctc_loss(
            logp,
            batch["labels"],
            jnp.full((preds.shape[0],), T, jnp.int32),
            batch["lengths"],
        )
    else:
        # teacher forcing on text[:, :-1]; target text[:, 1:] (crnn.py:260-262)
        outputs = apply_fn(variables, batch["images"], batch["text"][:, :-1])
        preds, new_stats = outputs if train else (outputs, {"batch_stats": batch_stats})
        target = batch["text"][:, 1:]
        loss = cross_entropy_ignore_index(preds, target, ignore_index=0)
    return loss, (new_stats["batch_stats"], preds)


def make_train_step(model: CRNNet, cfg: Config) -> Callable:
    """One jitted optimizer step.

    With ``cfg.grad_accum > 1`` every leaf of ``batch`` carries a
    leading ``[grad_accum]`` micro-batch dim; the step scans the
    micro-batches (``lax.scan`` — sequential, so only ONE micro-batch's
    activations are live at a time), averages the gradients, and
    applies a single optimizer update.  BatchNorm statistics update per
    micro-batch, like running the micro-batches as separate steps.
    """
    optimizer = make_optimizer(cfg)
    accum = max(1, int(cfg.grad_accum))

    def grads_of(params, batch_stats, batch):
        return jax.value_and_grad(
            lambda p: loss_fn(model, cfg, p, batch_stats, batch, True),
            has_aux=True,
        )(params)

    @jax.jit
    def train_step(state: TrainState, batch) -> tuple[TrainState, dict]:
        if accum == 1:
            (loss, (new_stats, _)), grads = grads_of(
                state.params, state.batch_stats, batch
            )
        else:
            def micro(carry, mb):
                stats, gsum, lsum = carry
                (l, (new_stats, _)), g = grads_of(state.params, stats, mb)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                return (new_stats, gsum, lsum + l), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (new_stats, gsum, lsum), _ = jax.lax.scan(
                micro, (state.batch_stats, zeros, jnp.float32(0.0)), batch
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
            loss = lsum / accum
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return (
            TrainState(new_params, new_stats, new_opt, state.step + 1),
            metrics,
        )

    return train_step


def make_eval_step(model: CRNNet, cfg: Config) -> Callable:
    is_ctc = cfg.prediction == "CTC"

    @jax.jit
    def eval_step(state: TrainState, batch) -> dict:
        loss, (_, preds) = loss_fn(
            model, cfg, state.params, state.batch_stats, batch, False
        )
        probs = jax.nn.softmax(preds, axis=2)
        max_probs = jnp.max(probs, axis=2)
        idx = jnp.argmax(preds, axis=2)
        if is_ctc:
            conf = jnp.prod(max_probs, axis=1)
        else:
            eos = idx == 1
            before = jnp.cumsum(eos, axis=1) == 0
            conf = jnp.prod(jnp.where(before, max_probs, 1.0), axis=1)
        return {"loss": loss, "pred_idx": idx, "confidence": conf}

    return eval_step
