"""Typed configuration for the TPU-native OCR stack.

YAML-surface-compatible with the reference's ``ocr/config.yml`` (see
``/root/reference/ocr/config.yml:1-46``): every key of that file maps onto a
field here, with the same defaults, so existing config files load unchanged.
Unlike the reference — which passes a raw ``yaml.safe_load`` dict around and
mutates derived keys at runtime (``ocr/train/crnn.py:25-28,69-74``) — this is
a frozen dataclass with validation and explicit derived properties.

Keys the reference reads but never defines (``saved_model_path``,
``fine_tune``, ``max_iter`` — ``ocr/train/crnn.py:104-109,172``) are given
real defaults here so resume/fine-tune actually work.
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Mapping

import yaml

# Tokens used by the attention label converter.
GO_TOKEN = "[GO]"
EOS_TOKEN = "[s]"
BLANK_TOKEN = "[blank]"

DEFAULT_CHARSET = "0123456789abcdefghijklmnopqrstuvwxyz"


@dataclass(frozen=True)
class Config:
    # --- paths (reference config.yml:1-6) ---
    onnx_path: str = "converted_models"
    pretrained: str = "save_models"
    log_dir: str = "logs"
    train_root: str = "data/train"
    val_root: str = "data/val"

    # --- run cfgs (config.yml:8-22) ---
    seeds: int = 4420
    workers: int = 2
    num_gpu: int = 1  # kept for YAML compat; TPU build uses `mesh` below
    batch_size: int = 64
    num_iters: int = 30000
    val_interval: int = 1000
    save_interval: int = 1000
    lr: float = 0.01
    adam: bool = False
    beta1: float = 0.9
    rho: float = 0.95
    eps: float = 1.0e-8
    grad_clip: float = 5.0
    # rematerialize the recognizer forward in the backward pass
    # (jax.checkpoint): ~halves training activation HBM so batch/canvas
    # can grow, at the cost of one extra forward of FLOPs.  Gradient
    # values are identical (tests/test_training.py).
    train_remat: bool = False
    # >1: one optimizer step per grad_accum micro-batches, accumulated
    # in a lax.scan inside ONE jitted step (batch leaves carry a
    # leading [grad_accum] dim).  Composes with train_remat and the
    # data-parallel mesh for effective batches past HBM.
    grad_accum: int = 1

    # --- fine tune / data (config.yml:24-39) ---
    random_sample: bool = True
    keep_ratio: bool = True
    batch_max_len: int = 25
    num_epochs: int = 25
    height: int = 32
    width: int = 100
    rgb: bool = False
    num_fiducial: int = 20
    input_channel: int = 1
    output_channel: int = 512
    hidden_size: int = 256
    num_classes: int = 38  # informational; derived property below is canonical
    character: str = DEFAULT_CHARSET
    filtering: bool = True

    # --- model topology (config.yml:41-46) ---
    transform: str = "TPS"  # {"None", "TPS"}
    backbone: str = "ResNet"  # {"ResNet"}
    sequence: str = "biLSTM"  # {"None", "biLSTM"}
    prediction: str = "Attention"  # {"CTC", "Attention"}
    pipeline: str = "CRAFT-CRNN"

    # --- resume (referenced-but-missing keys in the reference) ---
    saved_model_path: str = ""
    fine_tune: bool = False
    max_iter: int = 100  # eval batches cap (crnn.py:172)

    # --- TPU-native additions (no reference counterpart) ---
    mesh_data: int = -1  # data-parallel axis size; -1 = all devices
    mesh_model: int = 1  # model axis (reserved for TP; DP-only by default)
    compute_dtype: str = "bfloat16"  # MXU-friendly compute precision
    param_dtype: str = "float32"
    # w8a8 dynamic int8 inference (v5e int8 MXU, ~2x bf16 peak): runs
    # every VGG/ResNet backbone conv as QuantConv.  Inference-only; the
    # parameter tree is unchanged so checkpoints load identically.
    quant_int8: bool = False
    # Detector canvas buckets (static shapes for XLA; reference resizes to
    # arbitrary multiples of 32 which would recompile per shape).
    canvas_size: int = 1280
    magnify_ratio: float = 1.5
    # Canvas bucket quantum: input canvases round UP to a multiple of
    # this so distinct receipt sizes share XLA programs.  32 = the
    # reference-exact canvas (one program per distinct size, fastest per
    # image); larger values trade a few % of detector FLOPs for fewer
    # compiles.  64 keeps the padding tax under ~10% for typical
    # receipts.
    bucket_granularity: int = 64
    # Original-resolution gray bucket quantum: uploads are zero-padded
    # up to a multiple of this before entering the serving program, so
    # arbitrary upload sizes share a bounded set of compiled programs
    # (true extents travel as data; box clipping stays exact).
    gray_granularity: int = 256
    text_threshold: float = 0.7
    link_threshold: float = 0.4
    low_text: float = 0.4
    enable_poly: bool = False
    max_boxes: int = 256  # static cap on detected boxes per image
    cc_max_iters: int = 16  # connected-component sweep cap
    # CTC decoding strategy (beyond-parity: the reference only greedy-
    # decodes, ocr/net.py:165-167).  "beam" = on-device prefix beam
    # search (ops/ctc.py ctc_beam_search_decode); confidence becomes
    # the true sequence posterior instead of the per-frame max cumprod.
    # Ignored for prediction="Attention".
    ctc_decode: str = "greedy"  # {"greedy", "beam"}
    # Attention decoding strategy (beyond-parity: the reference argmax-
    # feeds only, ocr/modules/attention.py:45-59).  "beam" folds W
    # beams into the batch dim of the decode scan (models/attention.py
    # _beam_decode); confidence becomes exp(sum of token log-probs up
    # to EOS).  Ignored for prediction="CTC".
    attn_decode: str = "greedy"  # {"greedy", "beam"}
    beam_width: int = 8  # shared by ctc_decode/attn_decode = "beam"
    # --- serving graph plan (TPU; env vars override for A/B) --------
    # Fused detector stages, comma list of {"tail", "stem", "cpool",
    # "cpool2", "s2d"} or "none".  "tail" (default) = the Pallas
    # packed-dot upconv4+cls-head kernel (device-trace win, BENCH.md);
    # "s2d" (default) = the space-to-depth stem (conv1_1+conv1_2+pool1
    # as phase-packed dense convs, ops/s2d_stem.py — 70.5 -> 64.5 ms
    # detector device trace, fg-mask flips 0); "cpool"/"cpool2" are
    # the measured-rejected fused conv1_2+pool(+conv2_1) slab kernels;
    # "stem" = the older conv1_2-only kernel (A/B).  Resolved per
    # canvas by BatchedOCR._fused_kernel_plan (falls back off-TPU / at
    # unsupported shapes).  Env override: LIGHTLY_OCR_ENABLE_FUSED.
    fused_stages: str = "tail,s2d"
    # Fused-stage implementation: "pallas" (slab kernels, default) or
    # "rowpack" (row-packed XLA convs, A/B).  Env override:
    # LIGHTLY_OCR_FUSED_IMPL.
    fused_impl: str = "pallas"
    # Serve the whole batch as ONE jitted program (default; the split
    # costs ~10% on dispatch RPC) vs separately-jitted detector/post
    # stages (profiling).  Env override: LIGHTLY_OCR_MONOLITH=0/1.
    monolith: bool = True
    # In-kernel 2x2-pool lowering for the cpool kernels: "strided"
    # (sublane-pair reshape, default — the pair-lane "reshape" form
    # crashes the Mosaic device compiler at every shape) or "reshape"
    # (pair-lane; interpret-mode A/B only).  Numerically identical.
    # Env override: LIGHTLY_OCR_CPOOL_POOL.
    cpool_pool: str = "strided"
    # Serving pipeline depth: dispatches kept in flight by the serving
    # loop (server InferenceWorker / bench steady state).  The
    # latency<->throughput knob: each +1 adds one full batch of p50
    # latency but hides more host decode + dispatch RPC behind device
    # compute.  Measured frontier on the seam-kernel graph (BENCH.md
    # round 4 table): d3 161.8 r/s @ p50 385 ms, d4 165.3 @ 481 —
    # depth 4 is the throughput default; latency-sensitive deployments
    # set 2-3.
    serving_depth: int = 4
    # Optional shallow-fusion LM for ctc_decode="beam": path to a .npy
    # [C, C] float array of transition log-priors (C = derived_num_
    # classes; lm[p, c] is added when a prefix ending in label p
    # extends with label c; row 0 = word start).  Fold any fusion
    # weight into the values.  Empty = no prior.
    ctc_lm_path: str = ""

    def __post_init__(self):
        if self.transform not in ("None", "TPS"):
            raise ValueError(f"transform must be None|TPS, got {self.transform!r}")
        if self.backbone not in ("ResNet",):
            raise ValueError(f"backbone must be ResNet, got {self.backbone!r}")
        if self.sequence not in ("None", "biLSTM"):
            raise ValueError(f"sequence must be None|biLSTM, got {self.sequence!r}")
        if self.prediction not in ("CTC", "Attention"):
            raise ValueError(
                f"prediction must be CTC|Attention, got {self.prediction!r}"
            )
        if self.pipeline != "CRAFT-CRNN":
            raise ValueError(f"pipeline must be CRAFT-CRNN, got {self.pipeline!r}")
        if self.height <= 0 or self.width <= 0 or self.batch_max_len <= 0:
            raise ValueError("height/width/batch_max_len must be positive")
        if self.ctc_decode not in ("greedy", "beam"):
            raise ValueError(
                f"ctc_decode must be greedy|beam, got {self.ctc_decode!r}"
            )
        if self.attn_decode not in ("greedy", "beam"):
            raise ValueError(
                f"attn_decode must be greedy|beam, got {self.attn_decode!r}"
            )
        if self.beam_width <= 0:
            raise ValueError("beam_width must be positive")
        if self.fused_impl not in ("pallas", "rowpack"):
            raise ValueError(
                f"fused_impl must be pallas|rowpack, got {self.fused_impl!r}"
            )
        if self.cpool_pool not in ("reshape", "strided"):
            raise ValueError(
                f"cpool_pool must be reshape|strided, got {self.cpool_pool!r}"
            )
        known = {"tail", "stem", "cpool", "cpool2", "s2d"}
        stages = {
            t.strip()
            for t in self.fused_stages.split(",")
            if t.strip() and t.strip().lower() not in ("none", "off", "0")
        }
        if stages - known:
            raise ValueError(
                f"fused_stages contains unknown stages {sorted(stages - known)}"
                f" (known: {sorted(known)})"
            )

    # --- derived (canonical replacements for crnn.py:69-74 mutation) ---
    @property
    def derived_input_channel(self) -> int:
        return 3 if self.rgb else self.input_channel

    @property
    def derived_num_classes(self) -> int:
        """len(converter.character): CTC = charset+blank, Attn = charset+GO+EOS."""
        if self.prediction == "CTC":
            return len(self.character) + 1
        return len(self.character) + 2

    @property
    def num_steps(self) -> int:
        """Attention decode steps = batch_max_len + 1 (attention.py:28)."""
        return self.batch_max_len + 1

    @property
    def derived_fused_stages(self) -> frozenset:
        """``fused_stages`` parsed to a set ("none"/"off"/"0" -> empty)."""
        return frozenset(
            t.strip()
            for t in self.fused_stages.split(",")
            if t.strip() and t.strip().lower() not in ("none", "off", "0")
        )

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "Config":
        names = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in d.items() if k in names}
        return cls(**known)


def load_config(path: str | None = None) -> Config:
    """Load a reference-format YAML config; missing keys get defaults."""
    if path is None:
        return Config()
    with open(os.path.expanduser(path), "r") as f:
        data = yaml.safe_load(f) or {}
    return Config.from_dict(data)


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)
