"""Round-2 perf probes on the real TPU (run in background; prints
incrementally).  Times use a forced device->host fetch (axon
block_until_ready was once unreliable for timing).

Usage: nohup python scripts/profile_r2.py > /tmp/prof_r2.log 2>&1 &
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fetch(x):
    import jax.numpy as jnp

    leaf = x
    if isinstance(x, (tuple, list)):
        leaf = x[0]
    elif isinstance(x, dict):
        leaf = next(iter(x.values()))
    return float(jnp.sum(jnp.ravel(leaf)[:16].astype(jnp.float32)))


def timeit(tag, fn, *args, n=5, warmup=1):
    t0 = time.perf_counter()
    for _ in range(warmup):
        fetch(fn(*args))
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(
        f"{tag:48s} med {med*1e3:8.2f} ms  min {min(ts)*1e3:8.2f} ms"
        f"  (warmup+compile {tc:6.1f} s)",
        flush=True,
    )
    return med


def main():
    import jax
    import jax.numpy as jnp

    from lightly_ocr_tpu.config import Config
    from lightly_ocr_tpu.models.crnn import CRNNet
    from lightly_ocr_tpu.models.vgg_unet import VGG_UNet
    from lightly_ocr_tpu.ops.detection import get_det_boxes
    from lightly_ocr_tpu.ops.pallas_cc import label_components_pallas

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    B, M = 8, 32
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    cfg = Config(prediction="Attention", transform="TPS", max_boxes=M)

    det_net = VGG_UNet(dtype=dt)

    for H, W in [(1024, 768), (928, 640)]:
        canv = jnp.asarray(
            rng.standard_normal((B, H, W, 3)).astype(np.float32)
        )
        det_vars = det_net.init(jax.random.key(0), canv[:1])
        f_det = jax.jit(lambda v, x: det_net.apply(v, x)[0])
        t = timeit(f"det fwd B{B} {H}x{W} bf16", f_det, det_vars, canv)
        gflop = 570.0 * (H * W) / (1024 * 768)  # approx per image
        print(
            f"    -> {B*gflop/t/1e3:.1f} TFLOP/s "
            f"({B*gflop/t/1e3/197*100:.0f}% of v5e bf16 peak)",
            flush=True,
        )

        maps = f_det(det_vars, canv).astype(jnp.float32)
        tmap, lmap = maps[..., 0], maps[..., 1]
        fg = tmap > 0.4

        for rounds in (6, 4, 3):
            f_cc = jax.jit(
                lambda m, r=rounds: label_components_pallas(m, rounds=r)
            )
            timeit(f"pallas CC B{B} {H//2}x{W//2} rounds={rounds}", f_cc, fg)

        labels = jax.jit(lambda m: label_components_pallas(m, rounds=6))(fg)

        f_boxes = jax.jit(
            jax.vmap(
                lambda tm, lm, lab: get_det_boxes(
                    tm, lm, max_boxes=M, precomputed_labels=lab
                ).boxes
            )
        )
        timeit(f"boxes(stats+sweep) B{B} {H//2}x{W//2}", f_boxes, tmap, lmap, labels)

    # recognizer at K = B*M crops
    K = B * M
    crops = jnp.asarray(
        rng.standard_normal((K, 32, 100, 1)).astype(np.float32)
    )
    rec_net = CRNNet(cfg, dtype=dt)
    rec_vars = rec_net.init(
        jax.random.key(1), crops[:2], jnp.zeros((2, 26), jnp.int32), False
    )
    f_rec = jax.jit(lambda v, x: rec_net.apply(v, x, None, False))
    timeit(f"recognizer TPS+Attn K={K}", f_rec, rec_vars, crops)

    cfg_ctc = Config(prediction="CTC", transform="TPS", max_boxes=M)
    rec3 = CRNNet(cfg_ctc, dtype=dt)
    v3 = rec3.init(jax.random.key(1), crops[:2], None, False)
    f3 = jax.jit(lambda v, x: rec3.apply(v, x, None, False))
    timeit(f"recognizer TPS+CTC K={K}", f3, v3, crops)

    # attempt a profiler trace of the detector (may not work over axon)
    try:
        with jax.profiler.trace("/tmp/jtrace"):
            fetch(f_det(det_vars, canv))
        import glob

        files = glob.glob("/tmp/jtrace/**/*.pb*", recursive=True) + glob.glob(
            "/tmp/jtrace/**/*.json*", recursive=True
        )
        print("profiler trace files:", files[:5], flush=True)
    except Exception as e:  # noqa: BLE001
        print("profiler trace failed:", repr(e), flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
