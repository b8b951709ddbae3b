"""CRNN recognizer assembly: transform -> backbone -> sequence -> prediction.

Config-dispatched four-stage pipeline with the same stage choices as the
reference (``ocr/model.py:64-118``): transform in {None, TPS}, backbone
{ResNet}, sequence {None, biLSTM}, prediction {CTC, Attention}.  The whole
forward — including the attention decode loop — is one jittable program.

Shapes for the canonical 32x100 grayscale input: [B,32,100,1] -> TPS ->
ResNet [B,1,26,512] -> height-mean + width-major [B,26,512] -> BiLSTM x2
[B,26,256] -> CTC linear [B,26,37] or attention decode [B,26,38].
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightly_ocr_tpu.config import Config
from lightly_ocr_tpu.models.attention import Attention
from lightly_ocr_tpu.models.lstm import SeqModeling
from lightly_ocr_tpu.models.resnet import ResNet50v2
from lightly_ocr_tpu.models.tps import TPS_STN

Dtype = Any


class CRNNet(nn.Module):
    cfg: Config
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(
        self,
        images: jax.Array,  # [B, H, W, C] in [-1, 1]
        text: jax.Array | None = None,  # [B, >=num_steps] for teacher forcing
        train: bool = False,
        beam_width: int | None = None,  # Attention-only beam decode
        lm: jax.Array | None = None,  # Attention-only shallow-fusion prior
    ) -> jax.Array:
        if self.quant and train:
            raise ValueError(
                "quant=True is an inference-only mode: QuantConv's "
                "jnp.round has zero gradient, so training would silently "
                "freeze every backbone conv.  Train in float and enable "
                "quant_int8 only for serving."
            )
        cfg = self.cfg
        x = images.astype(self.dtype)

        if cfg.transform == "TPS":
            x = TPS_STN(
                F=cfg.num_fiducial,
                out_h=cfg.height,
                out_w=cfg.width,
                dtype=self.dtype,
                name="Transformation",
            )(x, train)

        x = ResNet50v2(
            cfg.output_channel, dtype=self.dtype, quant=self.quant,
            name="FeatureExtraction",
        )(x, train)  # [B, H', W', C]

        # AdaptiveAvgPool2d((None, 1)) over height + width-major sequence
        # (``model.py:107-108``): NHWC mean over H -> [B, W', C].
        x = jnp.mean(x, axis=1)

        if cfg.sequence == "biLSTM":
            x = SeqModeling(
                cfg.hidden_size, dtype=self.dtype, name="SequenceModeling"
            )(x)

        if cfg.prediction == "CTC":
            if beam_width is not None:
                raise ValueError(
                    "beam_width applies to the Attention head only; "
                    "CTC beam search is ops.ctc.ctc_beam_search_decode "
                    "over the logits"
                )
            if lm is not None:
                raise ValueError(
                    "lm applies to the Attention head only; the CTC "
                    "prior is fused inside ctc_beam_search_decode"
                )
            return nn.Dense(
                cfg.derived_num_classes, dtype=self.dtype, name="Prediction"
            )(x)
        return Attention(
            hidden=cfg.hidden_size,
            num_classes=cfg.derived_num_classes,
            num_steps=cfg.num_steps,
            dtype=self.dtype,
            name="Prediction",
        )(x, text, train, beam_width, lm)


def init_crnn(
    cfg: Config, rng: jax.Array, dtype: Dtype = jnp.float32
) -> tuple[CRNNet, dict]:
    """Build the model and initialize variables (params + batch_stats)."""
    model = CRNNet(cfg, dtype=dtype)
    dummy = jnp.zeros(
        (1, cfg.height, cfg.width, cfg.derived_input_channel), dtype
    )
    dummy_text = jnp.zeros((1, cfg.num_steps), jnp.int32)
    variables = model.init(rng, dummy, dummy_text, train=False)
    return model, variables
