"""CRNN trainer: data-parallel pjit training with eval + checkpoints.

Rebuild of the reference training script (``ocr/train/crnn.py``) as a
proper module.  Behavior parity where it mattered:

* loss/optimizer/clipping per config (CTC or attention CE, Adam or
  Adadelta, grad clip 5);
* eval every ``val_interval`` steps computing val loss, exact-match
  accuracy, confidences, and a gt|pred|confidence|T&F table appended to
  ``logs/log_train.txt`` (``crnn.py:285-321``);
* best-accuracy and periodic checkpoints (as orbax states incl.
  optimizer + step — the reference saved bare weights only);
* dataset/model/config logs (``log_dataset.txt``/``log_model.txt``/
  ``log_config.txt``).

Fixed by design: the reference's train_batch builds a fresh DataLoader
iterator every step so it trains on the first batch forever
(``crnn.py:241-242``); resume reads config keys that don't exist
(``crnn.py:104-109``); evaluation's attention path passes a typo'd
kwarg (``crnn.py:201``).  All three paths work here.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lightly_ocr_tpu.config import Config, load_config
from lightly_ocr_tpu.data.loader import DataLoader
from lightly_ocr_tpu.data.records import open_dataset
from lightly_ocr_tpu.models.crnn import CRNNet
from lightly_ocr_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_variables,
)
from lightly_ocr_tpu.text.converters import build_converter
from lightly_ocr_tpu.train.train_step import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_train_step,
)
from lightly_ocr_tpu.utils.checkpoint import (
    record_best,
    restore_checkpoint,
    save_checkpoint,
)
from lightly_ocr_tpu.utils.metrics import (
    Averager,
    exact_match_accuracy,
    normalized_edit_distance,
)

DASHED = "-" * 80


class Trainer:
    def __init__(self, cfg: Config, mesh=None):
        if cfg.quant_int8:
            # QuantConv's round() has zero gradient: training "works"
            # but the backbone convs silently stop learning.  int8 is
            # an inference-only serving mode; fail loudly here.
            raise ValueError(
                "Config.quant_int8=True is inference-only (QuantConv's "
                "rounding blocks gradients) — train in float and flip "
                "quant_int8 on at serving time"
            )
        self.cfg = cfg
        self.mesh = mesh or make_mesh(cfg.mesh_data, cfg.mesh_model)
        self.converter = build_converter(cfg.prediction, cfg.character)
        self.model, self.state = init_train_state(
            cfg, jax.random.key(cfg.seeds)
        )
        self.state = TrainState(
            *shard_variables(tuple(self.state[:3]), self.mesh),
            self.state.step,
        )
        self.train_step = make_train_step(self.model, cfg)
        self.eval_step = make_eval_step(self.model, cfg)
        os.makedirs(cfg.log_dir, exist_ok=True)
        self.best_acc = -1.0

    # ------------------------------------------------------------------
    def _log(self, fname: str, text: str) -> None:
        with open(os.path.join(self.cfg.log_dir, fname), "a") as f:
            f.write(text + "\n")

    def log_startup(self, train_len: int) -> None:
        cfg = self.cfg
        self._log(
            "log_dataset.txt",
            f"{DASHED}\ndataset_root:{cfg.train_root}\n"
            f"batch_size:{cfg.batch_size}\nnum_samples:{train_len}",
        )
        self._log(
            "log_model.txt",
            f"model input params:\nheight:{cfg.height}\nwidth:{cfg.width}\n"
            f"fiducial points:{cfg.num_fiducial}\n"
            f"input channel:{cfg.derived_input_channel}\n"
            f"output channel:{cfg.output_channel}\n"
            f"hidden size:{cfg.hidden_size}\n"
            f"num class:{cfg.derived_num_classes}\n"
            f"batch_max_len:{cfg.batch_max_len}\n"
            f"structure:{cfg.transform}-{cfg.backbone}-{cfg.sequence}-"
            f"{cfg.prediction}",
        )
        options = "------------------Options------------------\n"
        for k, v in cfg.to_dict().items():
            options += f"{k}: {v}\n"
        options += "-------------------------------------------"
        self._log("log_config.txt", options)

    # ------------------------------------------------------------------
    def encode_batch(self, images: np.ndarray, labels: list[str]) -> dict:
        cfg = self.cfg
        batch = {"images": images}
        if cfg.prediction == "CTC":
            lab, lengths = self.converter.encode_padded(
                labels, cfg.batch_max_len
            )
            batch["labels"] = lab
            batch["lengths"] = lengths
        else:
            text, lengths = self.converter.encode(labels, cfg.batch_max_len)
            batch["text"] = text
            batch["lengths"] = lengths
        return shard_batch(batch, self.mesh)

    def decode_preds(self, idx: np.ndarray) -> list[str]:
        if self.cfg.prediction == "CTC":
            return self.converter.decode_padded(idx)
        return self.converter.decode_trimmed(idx)

    # ------------------------------------------------------------------
    def evaluate(self, val_loader) -> dict:
        cfg = self.cfg
        avg_loss = Averager()
        preds_all, labels_all, confs_all = [], [], []
        infer_s = 0.0
        for i, (images, labels) in enumerate(val_loader):
            if i >= cfg.max_iter:
                break
            batch = self.encode_batch(images, labels)
            t0 = time.perf_counter()
            out = self.eval_step(self.state, batch)
            out = jax.tree_util.tree_map(np.asarray, out)
            infer_s += time.perf_counter() - t0
            avg_loss.add(out["loss"])
            preds_all.extend(self.decode_preds(out["pred_idx"]))
            labels_all.extend(labels)
            confs_all.extend(out["confidence"].tolist())
        acc = exact_match_accuracy(preds_all, labels_all)
        ned = normalized_edit_distance(preds_all, labels_all)
        return {
            "loss": avg_loss.val(),
            "accuracy": acc,
            "norm_ED": ned,
            "preds": preds_all,
            "labels": labels_all,
            "confidence": confs_all,
            "infer_s": infer_s,
            "len_data": len(labels_all),
        }

    def log_eval(self, step: int, train_loss: float, ev: dict,
                 elapsed: float) -> None:
        cfg = self.cfg
        lines = [
            f"[{step}/{cfg.num_iters}] train_loss: {train_loss:0.5f} | "
            f"val_loss: {ev['loss']:0.5f} | elapsed time: {elapsed:0.5f}",
            f"{'accuracy':20s}: {ev['accuracy']:0.3f}",
            f"{'norm_ED':20s}: {ev['norm_ED']:0.3f}",
            f"{'best accuracy':20s}: {self.best_acc:0.3f}",
            DASHED,
            f"{'ground truth':20s} | {'prediction':20s} | confidence | T&F",
            DASHED,
        ]
        for gt, pred, conf in list(
            zip(ev["labels"], ev["preds"], ev["confidence"])
        )[:10]:
            lines.append(
                f"{gt:20s} | {pred:20s} | {conf:0.4f} | {str(pred == gt)}"
            )
        lines.append(DASHED)
        text = "\n".join(lines)
        print(text, flush=True)
        self._log("log_train.txt", text)

    # ------------------------------------------------------------------
    def maybe_resume(self) -> None:
        cfg = self.cfg
        if cfg.saved_model_path:
            self.state, step = restore_checkpoint(
                cfg.saved_model_path, self.state
            )
            print(f"resumed from {cfg.saved_model_path} at step {step}")

    def fit(self, train_loader, val_loader) -> TrainState:
        cfg = self.cfg
        self.log_startup(len(train_loader.dataset))
        self.maybe_resume()
        avg_loss = Averager()
        start = time.time()
        i = int(self.state.step)
        done = False
        for epoch in range(cfg.num_epochs):
            if done:
                break
            for images, labels in train_loader:
                batch = self.encode_batch(images, labels)
                self.state, metrics = self.train_step(self.state, batch)
                avg_loss.add(np.asarray(metrics["loss"]))
                i += 1

                if i % cfg.val_interval == 0:
                    ev = self.evaluate(val_loader)
                    if ev["accuracy"] > self.best_acc:
                        self.best_acc = ev["accuracy"]
                        if record_best(cfg.log_dir, i, ev["accuracy"]):
                            save_checkpoint(
                                os.path.join(cfg.log_dir, "best_acc"),
                                i, self.state,
                            )
                    self.log_eval(i, avg_loss.val(), ev, time.time() - start)
                    avg_loss.reset()

                if i % cfg.save_interval == 0:
                    save_checkpoint(
                        os.path.join(cfg.log_dir, "checkpoints"), i, self.state
                    )
                if i >= cfg.num_iters:
                    print("Stop training here.")
                    done = True
                    break
        return self.state


def build_loaders(cfg: Config, seed: int | None = None):
    train_ds = open_dataset(
        cfg.train_root,
        character=cfg.character if cfg.filtering else None,
        batch_max_len=cfg.batch_max_len,
        rgb=cfg.rgb,
    )
    val_ds = open_dataset(
        cfg.val_root,
        character=cfg.character if cfg.filtering else None,
        batch_max_len=cfg.batch_max_len,
        rgb=cfg.rgb,
    )
    train_loader = DataLoader(
        train_ds,
        batch_size=cfg.batch_size,
        height=cfg.height,
        width=cfg.width,
        keep_ratio=cfg.keep_ratio,
        shuffle=True,
        seed=cfg.seeds if seed is None else seed,
        workers=cfg.workers,
    )
    val_loader = DataLoader(
        val_ds,
        batch_size=cfg.batch_size,
        height=cfg.height,
        width=cfg.width,
        keep_ratio=False,
        shuffle=True,
        seed=cfg.seeds if seed is None else seed,
        workers=cfg.workers,
    )
    return train_loader, val_loader


def main(argv: Sequence[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="CRNN / CRAFT training")
    p.add_argument("--model", default="CRNN", choices=["CRNN", "CRAFT"],
                   help="CRAFT = detector score-map training "
                        "(lightly_ocr_tpu.train.craft); extra args pass "
                        "through to its CLI")
    p.add_argument("--config", default=None)
    p.add_argument("--train-root", default=None)
    p.add_argument("--val-root", default=None)
    p.add_argument("--num-iters", type=int, default=None)
    args, extra = p.parse_known_args(argv)
    if args.model == "CRAFT":
        from lightly_ocr_tpu.train.craft import main as craft_main

        return craft_main(extra)
    cfg = load_config(args.config)
    overrides = {
        k: v
        for k, v in {
            "train_root": args.train_root,
            "val_root": args.val_root,
            "num_iters": args.num_iters,
        }.items()
        if v is not None
    }
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    trainer = Trainer(cfg)
    train_loader, val_loader = build_loaders(cfg)
    trainer.fit(train_loader, val_loader)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
