"""Device-trace A/B for the space-to-depth stem (VERDICT r3 next #2).

Traces the full detector-scores stage exactly as the serving program
builds it (seam trunk + seam-split Pallas tail) at the bench shape
(b16 960x640), with and without the phase-packed stem
(``ops/s2d_stem.py``: conv1_1+conv1_2+pool1 as dense 2x2 convs over the
[H/2, W/2, 4C] layout, resuming via the ``from_pool=True`` trunk).
Variants:

* ``tail``      — the serving default (plain XLA slice1);
* ``s2d``       — bf16 phase-packed stem;
* ``s2d-int8``  — phase-packed stem with w8a8 conv1_2 (K=1024 x N=256
                  passes the >=128-channel int8 gate the UNPACKED
                  conv1_2 fails).

The XLA chain s2d replaces measured ~11.4 ms of slice1's 27.6 ms
(conv1_1 ~1.7 + conv1_2 ~9.7 at 38% MFU); the dense form does 1.78x
the MACs, so the win condition is MFU > 67%.  Reference topology:
``ocr/modules/vgg_bn.py:44-47``.

Numerics gate: thresholded fg-mask agreement + score maxdiff.

    nohup python scripts/check_s2d_hw.py > /tmp/s2d_hw.log 2>&1 &
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from profile_trace import trace_stage  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from lightly_ocr_tpu.models.vgg_unet import VGG_UNet, VGG_UNetTrunk
    from lightly_ocr_tpu.ops.pallas_tail import fused_tail_scores_cs_seam
    from lightly_ocr_tpu.ops.s2d_stem import s2d_conv12_pool

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    B, H, W = 16, 960, 640
    dt = jnp.bfloat16
    quant = True  # the serving graph is int8 (slice1 is float there
    # anyway — every slice1 conv fails QuantConv's >=128-channel gate)
    rng = np.random.default_rng(0)
    det_vars = VGG_UNet(dtype=dt).init(
        jax.random.key(0), jnp.zeros((1, 96, 64, 3))
    )
    canv = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))
    det_flop = B * 570e9 * (H * W) / (1024 * 768)

    trunk_seam = VGG_UNetTrunk(dtype=dt, quant=quant, seam=True)
    trunk_pool = VGG_UNetTrunk(
        dtype=dt, quant=quant, from_pool=True, seam=True
    )

    def det_tail(v, x):
        y_lo, t = trunk_seam.apply(v, x)
        y = fused_tail_scores_cs_seam(v, y_lo, t)
        return y[:, :, 0, : W // 2], y[:, :, 1, : W // 2]

    def det_s2d(v, x, q=False):
        p1 = s2d_conv12_pool(v, x.astype(dt), quant=q)
        y_lo, t = trunk_pool.apply(v, p1)
        y = fused_tail_scores_cs_seam(v, y_lo, t)
        return y[:, :, 0, : W // 2], y[:, :, 1, : W // 2]

    variants = {
        "tail": jax.jit(det_tail),
        "s2d": jax.jit(lambda v, x: det_s2d(v, x, False)),
        "s2d-int8": jax.jit(lambda v, x: det_s2d(v, x, True)),
    }
    only = os.environ.get("LIGHTLY_OCR_S2D_VARIANTS", "").strip()
    if only:  # e.g. "tail,s2d" — re-measure a subset after an edit
        variants = {k: v for k, v in variants.items()
                    if k in only.split(",")}
    results, outs = {}, {}
    for name, fn in variants.items():
        results[name] = trace_stage(
            f"det int8-serving + {name}", fn, det_vars, canv, flop=det_flop
        )
        outs[name] = fn(det_vars, canv)

    if "tail" not in outs:
        return
    ta, la = (np.asarray(a, np.float32) for a in outs["tail"])
    fga = (ta > 0.4) | (la > 0.4)
    for name in [k for k in outs if k != "tail"]:
        tb, lb = (np.asarray(a, np.float32) for a in outs[name])
        md = max(np.max(np.abs(ta - tb)), np.max(np.abs(la - lb)))
        fgb = (tb > 0.4) | (lb > 0.4)
        flips = int(np.sum(fga != fgb))
        print(
            f"{name}: score maxdiff {md:.2e}, fg-mask flips {flips} of "
            f"{fga.size}", flush=True,
        )
        a, b = results["tail"], results[name]
        if a and b:
            print(f"{name}: tail {a:.1f} ms -> {b:.1f} ms ({a / b:.3f}x)",
                  flush=True)


if __name__ == "__main__":
    main()
