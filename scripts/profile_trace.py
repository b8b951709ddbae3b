"""Per-stage DEVICE timings of the production batched-OCR program.

Wall-clock timing through the axon tunnel carries ~30-40 ms of
dispatch+fetch overhead per call (measured: a traced detector forward
showed 39 ms device execution inside a 78 ms wall measurement), so this
script times each stage from ``jax.profiler`` traces instead: run each
jitted stage under a trace, then read the device execution span of the
top-level jit event out of ``*.trace.json.gz``.

Stages at the production bench shape (batch 16, canvas 960x640, 32
boxes/receipt, bf16): detector forward, Pallas CC labeling, box
extraction (stats+sweep), matmul crop, recognizer over 512 crops.

Usage: nohup python scripts/profile_trace.py > /tmp/prof_trace.log 2>&1 &
"""
import glob
import gzip
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRACE_ROOT = "/tmp/jtrace_r2"


def device_ms(trace_dir, n_top=6):
    """Total duration of jit_* executions + top fusion spans (ms)."""
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        return None, []
    with gzip.open(sorted(files)[-1]) as f:
        tr = json.load(f)
    jit_total = 0.0
    fusions = []
    for e in tr.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e["name"]
        if name.startswith("jit_") and "(" in name:
            jit_total += e["dur"] / 1e3
        elif name.split(".")[0] in ("fusion", "convolution", "custom-call",
                                    "copy", "dynamic-slice", "scatter",
                                    "gather", "sort", "while", "reduce"):
            fusions.append((e["dur"] / 1e3, name))
    fusions.sort(reverse=True)
    return jit_total, fusions[:n_top]


def trace_stage(tag, fn, *args, flop=None):
    import jax

    d = f"{TRACE_ROOT}/{tag.replace(' ', '_').replace('/', '_')}"
    # warm up / compile outside the trace
    import time

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    with jax.profiler.trace(d):
        out = fn(*args)
        jax.block_until_ready(out)
    ms, fus = device_ms(d)
    line = f"{tag:44s} device {ms:8.2f} ms  (compile+warm {tc:6.1f}s)"
    if flop and ms:
        tf = flop / (ms * 1e-3) / 1e12
        line += f"  {tf:6.1f} TFLOP/s = {tf/197*100:4.1f}% v5e bf16 peak"
    print(line, flush=True)
    for dur, name in fus:
        print(f"    {dur:8.2f} ms  {name}", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from lightly_ocr_tpu.config import Config
    from lightly_ocr_tpu.models.crnn import CRNNet
    from lightly_ocr_tpu.models.vgg_unet import VGG_UNet
    from lightly_ocr_tpu.ops.crop import crop_resize_normalize_matmul
    from lightly_ocr_tpu.ops.detection import get_det_boxes
    from lightly_ocr_tpu.ops.pallas_cc import label_components_checked

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    B, M = 16, 32
    H, W = 960, 640
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    cfg = Config(prediction="Attention", transform="TPS", max_boxes=M)

    canv = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))
    det_net = VGG_UNet(dtype=dt)
    det_vars = det_net.init(jax.random.key(0), canv[:1])

    def det_fwd(v, x):
        return det_net.apply(v, x)[0]

    f_det = jax.jit(det_fwd)
    # VGG16-UNet ~= 570 GFLOP per 1024x768 canvas (BENCH.md roofline)
    det_flop = B * 570e9 * (H * W) / (1024 * 768)
    t_det = trace_stage(f"det fwd B{B} {H}x{W}", f_det, det_vars, canv,
                        flop=det_flop)

    # serving variant: trunk + folded (BN-fused) tail
    from lightly_ocr_tpu.models.vgg_unet import VGG_UNetTrunk
    from lightly_ocr_tpu.ops.rowpack import tail_scores_rowpacked

    trunk = VGG_UNetTrunk(dtype=dt)

    def det_folded(v, x):
        return tail_scores_rowpacked(v, trunk.apply(v, x))

    trace_stage(f"det fwd folded tail B{B}", jax.jit(det_folded),
                det_vars, canv, flop=det_flop)

    # round-2 serving path: seam trunk + seam-split Pallas tail
    from lightly_ocr_tpu.models.vgg_unet import VggStemPrefix
    from lightly_ocr_tpu.ops.pallas_stem import fused_conv12_pool_conv21
    from lightly_ocr_tpu.ops.pallas_tail import fused_tail_scores_cs_seam

    trunk_seam = VGG_UNetTrunk(dtype=dt, seam=True)

    def det_seam(v, x):
        y_lo, t = trunk_seam.apply(v, x)
        y = fused_tail_scores_cs_seam(v, y_lo, t)
        return y[:, :, 0, : W // 2], y[:, :, 1, : W // 2]

    trace_stage(f"det fwd seam Pallas tail B{B}", jax.jit(det_seam),
                det_vars, canv, flop=det_flop)

    # + the cpool2 fused stem (conv1_2+pool+conv2_1 in Pallas)
    stem_prefix = VggStemPrefix(dtype=dt)
    trunk_c21 = VGG_UNetTrunk(dtype=dt, from_c21=True, seam=True)

    def det_cpool2(v, x):
        p1 = fused_conv12_pool_conv21(v, stem_prefix.apply(v, x))
        y_lo, t = trunk_c21.apply(v, p1)
        y = fused_tail_scores_cs_seam(v, y_lo, t)
        return y[:, :, 0, : W // 2], y[:, :, 1, : W // 2]

    trace_stage(f"det fwd cpool2 seam B{B}", jax.jit(det_cpool2),
                det_vars, canv, flop=det_flop)

    maps = f_det(det_vars, canv).astype(jnp.float32)
    tmap, lmap = maps[..., 0], maps[..., 1]
    fg = (tmap > cfg.low_text) | (lmap > cfg.link_threshold)

    def cc(m):
        return label_components_checked(m, rounds=6, max_rounds=24)

    f_cc = jax.jit(cc)
    t_cc = trace_stage(f"pallas CC checked B{B} {H//2}x{W//2}", f_cc, fg)
    labels = f_cc(fg)

    def boxes(tm, lm, lab):
        return jax.vmap(
            lambda t, l, la: get_det_boxes(
                t, l, max_boxes=M, precomputed_labels=la
            ).boxes
        )(tm, lm, lab)

    f_boxes = jax.jit(boxes)
    t_boxes = trace_stage(f"boxes(stats+sweep) B{B}", f_boxes, tmap, lmap,
                          labels)

    gray = jnp.asarray(
        rng.uniform(0, 255, (B, 600, 400)).astype(np.float32)
    )
    rects = jnp.asarray(
        np.stack(
            [
                np.stack(
                    [
                        np.array([r0, c0, r0 + 40, c0 + 120], np.float32)
                        for r0, c0 in zip(
                            rng.integers(0, 500, M), rng.integers(0, 250, M)
                        )
                    ]
                )
                for _ in range(B)
            ]
        )
    )

    def crop(g, r):
        return jax.vmap(
            lambda gi, ri: crop_resize_normalize_matmul(
                gi, ri, cfg.height, cfg.width, "cubic"
            )
        )(g, r)

    f_crop = jax.jit(crop)
    t_crop = trace_stage(f"matmul crop B{B}x{M}", f_crop, gray, rects)

    K = B * M
    crops = jnp.asarray(
        rng.standard_normal((K, cfg.height, cfg.width, 1)).astype(np.float32)
    )
    rec_net = CRNNet(cfg, dtype=dt)
    rec_vars = rec_net.init(
        jax.random.key(1), crops[:2], jnp.zeros((2, 26), jnp.int32), False
    )

    def rec(v, x):
        return rec_net.apply(v, x, None, False)

    f_rec = jax.jit(rec)
    # TPS ~0.1 + ResNet ~4.4 + BiLSTM ~0.3 + attn ~0.2 GFLOP per crop
    t_rec = trace_stage(f"recognizer TPS+Attn K={K}", f_rec, rec_vars, crops,
                        flop=K * 5e9)

    total = sum(t for t in (t_det, t_cc, t_boxes, t_crop, t_rec) if t)
    print(
        f"\nstage sum: {total:.1f} ms/dispatch of {B} -> "
        f"{B / total * 1e3:.1f} receipts/s device-bound ceiling",
        flush=True,
    )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
