"""Device-trace A/B: canvas 960x640 vs 928x640 (height-only shrink).

The bench receipt (600x400, magnify 1.5) needs a 900x600 canvas; the
g64 bucket rounds it to 960x640, but rounding HEIGHT at g32 gives
928x640 — 3.3% fewer detector rows at the SAME lane-friendly W=640
(the earlier 928x608 g32 experiment lost on its tile-unfriendly
304-wide maps, so only the height moves here).  H2=464 = 8x58 needs
the generalized seam-row search (rows=58, halo overhead 1.069x vs
96's 1.042x).  Traces the full int8 detector stage exactly as serving
builds it (seam trunk + seam-split Pallas tail), plus the CC + box
stages, at both canvases.  Reference geometry being shrunk:
``ocr/tools/imgproc.py:38-65`` pads to ANY multiple of 32, so 928 is
reference-exact for this receipt; the bucket just stops overshooting.

    nohup python scripts/check_canvas928_trace.py > /tmp/c928.log 2>&1 &
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
    from lightly_ocr_tpu.ops.pallas_cc import label_components_checked
    from lightly_ocr_tpu.ops.pallas_tail import (
        _pick_rows_seam,
        fused_tail_scores_cs_seam,
    )

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    B = 16
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    det_vars = VGG_UNet(dtype=dt).init(
        jax.random.key(0), jnp.zeros((1, 96, 64, 3))
    )
    trunk_seam = VGG_UNetTrunk(dtype=dt, quant=True, seam=True)

    results = {}
    for H, W in ((960, 640), (928, 640)):
        print(f"--- canvas {H}x{W}: seam rows "
              f"{_pick_rows_seam(H // 2, W // 2)}", flush=True)
        canv = jnp.asarray(
            rng.standard_normal((B, H, W, 3)).astype(np.float32)
        )
        det_flop = B * 570e9 * (H * W) / (1024 * 768)

        def det(v, x, W=W):
            y_lo, t = trunk_seam.apply(v, x)
            y = fused_tail_scores_cs_seam(v, y_lo, t)
            return y[:, :, 0, : W // 2], y[:, :, 1, : W // 2]

        ms = trace_stage(
            f"det int8 seam {H}x{W}", jax.jit(det), det_vars, canv,
            flop=det_flop,
        )
        tm, lm = jax.jit(det)(det_vars, canv)
        fg = (tm > 0.4) | (lm > 0.4)
        cc_ms = trace_stage(
            f"cc {H}x{W}", jax.jit(label_components_checked), fg
        )
        results[(H, W)] = (ms, cc_ms)

    (a, ca), (b, cb) = results[(960, 640)], results[(928, 640)]
    if a and b:
        print(f"det: 960x640 {a:.2f} ms -> 928x640 {b:.2f} ms "
              f"({a / b:.3f}x, {a - b:+.2f} ms)", flush=True)
    if ca and cb:
        print(f"cc:  960x640 {ca:.2f} ms -> 928x640 {cb:.2f} ms "
              f"({ca - cb:+.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
