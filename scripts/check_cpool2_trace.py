"""Device-trace A/B for the cpool2 fused stem (VERDICT r2 next #1).

Traces the full detector-scores stage exactly as the serving program
builds it (seam trunk + seam-split Pallas tail) at the bench shape
(b16 960x640), with and without the fused conv1_2+pool+conv2_1 kernel,
in both the int8 serving graph (cpool2q w8a8) and the bf16 graph
(cpool2).  The XLA chain the kernel replaces measured 18.4 ms of the
99.4 ms device budget (BENCH.md trunk profile: conv1_2 9.58 + pool
1.98 + layout copy 1.89 + conv2_1 4.98); reference topology it fuses:
``ocr/modules/vgg_bn.py:44-48``.

Numerics gate: the thresholded fg masks (the only consumer of the
score maps) must match between variants; score maxdiff reported.

    nohup python scripts/check_cpool2_trace.py > /tmp/cpool2_trace.log 2>&1 &
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from profile_trace import trace_stage  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from lightly_ocr_tpu.models.vgg_unet import (
        VGG_UNet,
        VGG_UNetTrunk,
        VggStemPrefix,
    )
    from lightly_ocr_tpu.ops.pallas_stem import (
        fused_conv12_pool_conv21,
        fused_conv12_pool_conv21_q,
    )
    from lightly_ocr_tpu.ops.pallas_tail import fused_tail_scores_cs_seam

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    B, H, W = 16, 960, 640
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    det_vars = VGG_UNet(dtype=dt).init(
        jax.random.key(0), jnp.zeros((1, 96, 64, 3))
    )
    canv = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))
    det_flop = B * 570e9 * (H * W) / (1024 * 768)

    results = {}
    outs = {}
    for quant in (True, False):
        tag = "int8" if quant else "bf16"
        trunk_seam = VGG_UNetTrunk(dtype=dt, quant=quant, seam=True)
        stem_prefix = VggStemPrefix(dtype=dt, quant=quant)
        trunk_c21 = VGG_UNetTrunk(
            dtype=dt, quant=quant, from_c21=True, seam=True
        )
        c21 = fused_conv12_pool_conv21_q if quant else fused_conv12_pool_conv21

        def det_tail(v, x, trunk_seam=trunk_seam):
            y_lo, t = trunk_seam.apply(v, x)
            y = fused_tail_scores_cs_seam(v, y_lo, t)
            return y[:, :, 0, : W // 2], y[:, :, 1, : W // 2]

        def det_cpool2(v, x, stem_prefix=stem_prefix, trunk_c21=trunk_c21,
                       c21=c21):
            p1 = c21(v, stem_prefix.apply(v, x))
            y_lo, t = trunk_c21.apply(v, p1)
            y = fused_tail_scores_cs_seam(v, y_lo, t)
            return y[:, :, 0, : W // 2], y[:, :, 1, : W // 2]

        results[f"{tag}-tail"] = trace_stage(
            f"det {tag} seam tail (default)", jax.jit(det_tail),
            det_vars, canv, flop=det_flop,
        )
        outs[f"{tag}-tail"] = jax.jit(det_tail)(det_vars, canv)
        results[f"{tag}-cpool2"] = trace_stage(
            f"det {tag} + cpool2", jax.jit(det_cpool2),
            det_vars, canv, flop=det_flop,
        )
        outs[f"{tag}-cpool2"] = jax.jit(det_cpool2)(det_vars, canv)

    # numerics: fg-mask agreement + score maxdiff per graph
    for tag in ("int8", "bf16"):
        (ta, la) = outs[f"{tag}-tail"]
        (tb, lb) = outs[f"{tag}-cpool2"]
        ta, la, tb, lb = (np.asarray(a, np.float32) for a in (ta, la, tb, lb))
        md = max(np.max(np.abs(ta - tb)), np.max(np.abs(la - lb)))
        fga = (ta > 0.4) | (la > 0.4)
        fgb = (tb > 0.4) | (lb > 0.4)
        flips = int(np.sum(fga != fgb))
        print(
            f"{tag}: score maxdiff {md:.2e}, fg-mask flips {flips} "
            f"of {fga.size}", flush=True,
        )
        a, b = results[f"{tag}-tail"], results[f"{tag}-cpool2"]
        if a and b:
            print(f"{tag}: tail {a:.1f} ms -> cpool2 {b:.1f} ms "
                  f"({a / b:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
