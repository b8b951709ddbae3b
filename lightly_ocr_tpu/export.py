"""Model export: serialized StableHLO artifacts via ``jax.export``.

Counterpart of the reference's ONNX export (``ocr/torch2onnx.py``), which
was blocked by ``grid_sample`` having no ONNX op (``torch2onnx.py:22``).
Here the rectifier's sampling is plain XLA, so the WHOLE model — TPS,
attention decode loop and all — exports as one StableHLO program that any
PJRT runtime (TPU/GPU/CPU) can load and execute without Python model
code.

CLI:  python -m lightly_ocr_tpu.export CRNN converted_models/crnn.shlo
"""
from __future__ import annotations

import argparse
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from lightly_ocr_tpu.config import Config


def export_crnn(
    cfg: Config | None = None,
    variables: dict | None = None,
    batch: int = 1,
    seed: int = 0,
):
    """-> (jax.export.Exported, example_inputs) for the recognizer."""
    from lightly_ocr_tpu.models.crnn import CRNNet

    cfg = cfg or Config()
    model = CRNNet(cfg)
    images = jnp.zeros(
        (batch, cfg.height, cfg.width, cfg.derived_input_channel), jnp.float32
    )
    if variables is None:
        variables = model.init(jax.random.key(seed), images, None, False)

    def fn(images):
        return model.apply(variables, images, None, False)

    exported = jax_export.export(jax.jit(fn))(
        jax.ShapeDtypeStruct(images.shape, images.dtype)
    )
    return exported, (images,)


def export_craft(
    cfg: Config | None = None,
    variables: dict | None = None,
    batch: int = 1,
    height: int = 256,
    width: int = 256,
    seed: int = 0,
):
    """-> (jax.export.Exported, example_inputs) for the detector."""
    from lightly_ocr_tpu.models.vgg_unet import VGG_UNet

    cfg = cfg or Config()
    model = VGG_UNet()
    images = jnp.zeros((batch, height, width, 3), jnp.float32)
    if variables is None:
        variables = model.init(jax.random.key(seed), images)

    def fn(images):
        y, _ = model.apply(variables, images)
        return y

    exported = jax_export.export(jax.jit(fn))(
        jax.ShapeDtypeStruct(images.shape, images.dtype)
    )
    return exported, (images,)


def save_exported(exported, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def main(argv: Sequence[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="export models to StableHLO")
    p.add_argument("model", choices=["CRAFT", "CRNN"])
    p.add_argument("out", help="output .shlo path")
    p.add_argument("--config", default=None)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=256)
    args = p.parse_args(argv)
    from lightly_ocr_tpu.config import load_config

    cfg = load_config(args.config)
    if args.model == "CRNN":
        exported, example = export_crnn(cfg, batch=args.batch)
    else:
        exported, example = export_craft(
            cfg, batch=args.batch, height=args.height, width=args.width
        )
    save_exported(exported, args.out)
    # round-trip smoke check
    restored = load_exported(args.out)
    out = restored.call(*example)
    out = out[0] if isinstance(out, (tuple, list)) else out
    print(
        f"exported {args.model} -> {args.out} "
        f"({os.path.getsize(args.out)} bytes), output {np.shape(out)}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
