"""Device-trace sweep of the fused tail's ROW-block geometry at the
bench shape (b16, 960x640 canvas -> 480x320 half-res tail, seam form).

The halo discipline recomputes 2*HALO = 8 extra rows per slab, so the
interior overhead is (rows+8)/rows: 1.17x at the long-standing default
rows=48, 1.083x at 96, 1.067x at 120.  ``_pick_rows`` never tried
above 48 (the old per-row-sliced kernel's compile cost scaled with
slab volume; the flattened-dot body no longer does).  This measures
rows in {48, 96, 120, 160} with jax.profiler device spans and checks
output equality against rows=48.

    nohup python scripts/check_tail_rows_hw.py > /tmp/tail_rows.log 2>&1 &
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from profile_trace import trace_stage  # noqa: E402

B, H, W = 16, 960, 640


def main():
    import jax
    import jax.numpy as jnp

    from lightly_ocr_tpu.models.vgg_unet import (
        VGG_UNet,
        VGG_UNetTrunk,
        _upsample_to,
    )
    from lightly_ocr_tpu.ops.pallas_tail import (
        _scores_from_x,
        tail_params,
    )

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    trunk = VGG_UNetTrunk(seam=True)
    x = jnp.asarray(
        rng.standard_normal((B, H, W, 3)).astype(np.float32), jnp.bfloat16
    )
    # full-model variable tree (the trunk reads a subset; tail_params
    # needs upconv4/conv_cls) — init at a small shape, params are
    # shape-independent
    v = VGG_UNet().init(
        key, jnp.zeros((1, 64, 64, 3), jnp.bfloat16), train=False
    )
    y_lo, t = jax.jit(
        lambda v, x: trunk.apply(v, x, train=False)
    )(v, x)
    y_lo, t = jax.block_until_ready((y_lo, t))
    H2, W2 = t.shape[1], t.shape[2]
    print(f"trunk out: y_lo {y_lo.shape} t {t.shape}", flush=True)

    outs = {}
    for rows in (48, 96, 120, 160):
        if H2 % rows:
            print(f"rows={rows}: skipped (H2={H2} not divisible)")
            continue

        def run(v, y_lo, t, rows=rows):
            # seam-form upconv4 1x1 (mirrors fused_tail_scores_cs_seam)
            (k1, b1, *wts) = tail_params(v)
            ya = jax.lax.dot_general(
                y_lo.astype(jnp.bfloat16), k1[:64],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ya = _upsample_to(ya, H2, W2)
            yb = jax.lax.dot_general(
                t.astype(jnp.bfloat16), k1[64:],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            xseam = jnp.maximum(ya + yb + b1[None], 0.0).astype(jnp.bfloat16)
            return _scores_from_x(xseam, rows, W2, W2, tuple(wts), False)

        fn = jax.jit(run)
        ms = trace_stage(f"seam tail rows={rows}", fn, v, y_lo, t)
        outs[rows] = np.asarray(jax.device_get(fn(v, y_lo, t)), np.float32)

    base = outs.get(48)
    for rows, o in outs.items():
        if rows == 48 or base is None:
            continue
        print(
            f"rows={rows}: max|diff| vs 48 = {np.abs(o - base).max():.3e}",
            flush=True,
        )
    print("done", flush=True)


if __name__ == "__main__":
    main()
