"""Stage-by-stage timing of the batched OCR path on the current backend.

Usage: python scripts/profile_stages.py [--batch 4] [--boxes 32]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=3, warmup=1):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--boxes", type=int, default=32)
    p.add_argument("--canvas-h", type=int, default=1024)
    p.add_argument("--canvas-w", type=int, default=768)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from lightly_ocr_tpu.config import Config
    from lightly_ocr_tpu.models.crnn import CRNNet
    from lightly_ocr_tpu.models.vgg_unet import VGG_UNet
    from lightly_ocr_tpu.ops.crop import crop_resize_normalize_batch
    from lightly_ocr_tpu.ops.detection import get_det_boxes, label_components

    B, M = args.batch, args.boxes
    H, W = args.canvas_h, args.canvas_w
    dt = jnp.bfloat16
    cfg = Config(prediction="Attention", transform="TPS", max_boxes=M)
    rng = np.random.default_rng(0)

    det_net = VGG_UNet(dtype=dt)
    canv = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))
    det_vars = det_net.init(jax.random.key(0), canv[:1])

    f_det = jax.jit(lambda v, x: det_net.apply(v, x)[0])
    t = timeit(f_det, det_vars, canv)
    print(f"detector fwd [B={B},{H}x{W}]: {t*1e3:8.1f} ms", flush=True)

    maps = f_det(det_vars, canv).astype(jnp.float32)
    tmap, lmap = maps[..., 0], maps[..., 1]

    f_cc = jax.jit(jax.vmap(lambda m: label_components(m > 0.0, 24)))
    t = timeit(f_cc, tmap)
    print(f"cc labeling  [B={B},{H//2}x{W//2}]: {t*1e3:8.1f} ms", flush=True)

    f_boxes = jax.jit(
        jax.vmap(
            lambda tm, lm: get_det_boxes(tm, lm, max_boxes=M).boxes
        )
    )
    t = timeit(f_boxes, tmap, lmap)
    print(f"get_det_boxes[B={B}]:           {t*1e3:8.1f} ms", flush=True)

    gray = jnp.asarray(
        rng.standard_normal((B, H, W)).astype(np.float32) * 60 + 127
    )
    rects = jnp.asarray(
        np.stack(
            [
                np.stack(
                    [
                        rng.integers(0, H - 40, M),
                        rng.integers(0, W - 120, M),
                    ],
                    1,
                )
                for _ in range(B)
            ]
        )
    )
    rects = jnp.concatenate(
        [rects, rects + jnp.asarray([40, 120])], axis=-1
    ).astype(jnp.float32)

    f_crop = jax.jit(
        jax.vmap(lambda g, r: crop_resize_normalize_batch(g, r, 32, 100))
    )
    t = timeit(f_crop, gray, rects)
    print(f"crop+resize  [B*{M}]:           {t*1e3:8.1f} ms", flush=True)

    crops = f_crop(gray, rects).reshape(-1, 32, 100, 1)
    rec_net = CRNNet(cfg, dtype=dt)
    rec_vars = rec_net.init(
        jax.random.key(1), crops[:2], jnp.zeros((2, 26), jnp.int32), False
    )
    f_rec = jax.jit(lambda v, x: rec_net.apply(v, x, None, False))
    t = timeit(f_rec, rec_vars, crops)
    print(f"recognizer   [K={B*M}]:         {t*1e3:8.1f} ms", flush=True)

    # recognizer split: backbone-only vs full
    cfg_ctc = Config(prediction="CTC", transform="None", max_boxes=M)
    rec2 = CRNNet(cfg_ctc, dtype=dt)
    v2 = rec2.init(jax.random.key(1), crops[:2], None, False)
    f2 = jax.jit(lambda v, x: rec2.apply(v, x, None, False))
    t = timeit(f2, v2, crops)
    print(f"  (ResNet+BiLSTM+CTC only):     {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
