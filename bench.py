"""End-to-end OCR throughput benchmark (driver-run on real TPU).

Measures receipts/sec/chip through the single-program batched path
(`serving.batch.BatchedOCR`): CRAFT forward -> on-device box extraction ->
batched crop -> CRNN (TPS+ResNet+BiLSTM+Attention) over max_boxes crops
per receipt — the full production compute path with static shapes, so
throughput is independent of how many boxes the (untrained) weights fire.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 200 (the >=200 receipts/sec/chip BASELINE target).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# Amortize the tunnel's multi-minute XLA compiles across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8, help="receipts per dispatch")
    p.add_argument("--boxes", type=int, default=32, help="word boxes per receipt")
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--receipt-h", type=int, default=600)
    p.add_argument("--receipt-w", type=int, default=400)
    p.add_argument("--prediction", default="Attention",
                   choices=["Attention", "CTC"])
    p.add_argument("--fp32", action="store_true",
                   help="disable bfloat16 compute")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from lightly_ocr_tpu.config import Config
    from lightly_ocr_tpu.engines import CRAFT, CRNN
    from lightly_ocr_tpu.ops.image import (
        make_detector_input,
        pick_canvas_bucket,
        plan_aspect_resize,
        rgb_to_gray,
    )
    from lightly_ocr_tpu.serving.batch import BatchedOCR

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    cfg = Config(prediction=args.prediction, transform="TPS",
                 max_boxes=args.boxes)

    # Build engines (random weights unless checkpoints exist in
    # cfg.pretrained) and the fused batch program.
    det = CRAFT(cfg, dtype=dtype)
    rec = CRNN(cfg, dtype=dtype)
    ocr = BatchedOCR(cfg, det.variables, rec.variables,
                     boxes_per_image=args.boxes, dtype=dtype)

    # Synthetic receipt batch -> canvases on device (one-time host prep;
    # production feeds canvases straight from the ingest path).
    rng = np.random.default_rng(0)
    h, w = args.receipt_h, args.receipt_w
    bucket = pick_canvas_bucket(h, w, cfg.canvas_size, cfg.magnify_ratio,
                                granularity=cfg.bucket_granularity)
    plan = plan_aspect_resize(h, w, cfg.canvas_size, cfg.magnify_ratio,
                              canvas_bucket=bucket)
    receipts = rng.integers(0, 256, (args.batch, h, w, 3)).astype(np.float32)
    canv, grays = [], []
    for img in receipts:
        c, _ = make_detector_input(jnp.asarray(img), plan)
        canv.append(c)
        grays.append(rgb_to_gray(jnp.asarray(img)))  # original resolution
    canvases = jnp.stack(canv)
    gray = jnp.stack(grays)
    inv_ratio = 1.0 / plan.ratio

    # warmup / compile
    out = ocr(canvases, gray, inv_ratio)
    jax.block_until_ready(out["confidence"])

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        out = ocr(canvases, gray, inv_ratio)
        jax.block_until_ready(out["confidence"])
        times.append(time.perf_counter() - t0)
    best = min(times)
    receipts_per_s = args.batch / best

    print(
        json.dumps(
            {
                "metric": "receipts/sec/chip end-to-end "
                f"(canvas {plan.canvas_h}x{plan.canvas_w}, "
                f"{args.boxes} boxes/receipt, batch {args.batch}, "
                f"{args.prediction}, {'fp32' if args.fp32 else 'bf16'})",
                "value": round(receipts_per_s, 3),
                "unit": "receipts/s",
                "vs_baseline": round(receipts_per_s / 200.0, 4),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
