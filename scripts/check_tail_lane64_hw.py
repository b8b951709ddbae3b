"""Device feasibility + A/B of a 64-LANE slab for the fused tail.

The production kernel pads the seam activation's channels 64 -> 128
before the slab DMA because Mosaic rejects a 64-wide LANE SLICE of a
128-lane buffer.  But a buffer whose full lane extent IS 64 needs no
slicing — if Mosaic accepts the async copy, the halo-pad copy (2.87 ms
on device at b16, the largest XLA-side op of the fused path) and the
slab DMA traffic both halve.

Variants at the bench shape (b16, 480x320 seam tail, rows=120):
  pad128  — shipped form: channel-pad to 128, slab [S, Wd, 128]
  lane64  — no channel pad, slab [S, Wd, 64], stage A consumes directly

    nohup python scripts/check_tail_lane64_hw.py > /tmp/tail_lane64.log 2>&1 &
"""
import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from profile_trace import trace_stage  # noqa: E402

B, H, W = 16, 960, 640
ROWS = 120
HALO = 4


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lightly_ocr_tpu.models.vgg_unet import (
        VGG_UNet,
        VGG_UNetTrunk,
        _upsample_to,
    )
    from lightly_ocr_tpu.ops.pallas_tail import tail_params

    print("backend:", jax.default_backend(), flush=True)

    def conv3_same(src, wk, bias):
        S, Wd, C = src.shape
        Co = wk.shape[-1] // 3
        xp = jnp.pad(src, ((1, 1), (1, 7), (0, 0)))
        Wp = Wd + 8
        xr = jnp.concatenate([xp[u : u + S] for u in range(3)], axis=-1)
        y = jax.lax.dot_general(
            xr.reshape(S * Wp, 3 * C),
            wk,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(S, Wp, 3 * Co)
        acc = y[:, 0:Wd, 0:Co]
        for v in (1, 2):
            acc = acc + y[:, v : v + Wd, v * Co : (v + 1) * Co]
        out = jnp.maximum(acc + bias.reshape(1, 1, Co), 0.0)
        return out.astype(src.dtype)

    def tail_kernel(
        rows, cols, h2, w2, lanes,
        xp_hbm,
        wa_ref, ba_ref, w0_ref, b0_ref, w2_ref, b2_ref, w4_ref, b4_ref,
        w6_ref, b6_ref, w8_ref, b8_ref,
        out_ref,
        slabs, sems,
    ):
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        ni = pl.num_programs(1)
        nj = pl.num_programs(2)
        nsteps = pl.num_programs(0) * ni * nj

        def dma(b_, i_, j_, slot):
            return pltpu.make_async_copy(
                xp_hbm.at[
                    b_,
                    pl.ds(i_ * rows, rows + 2 * HALO),
                    pl.ds(j_ * cols, cols + 2 * HALO),
                ],
                slabs.at[slot],
                sems.at[slot],
            )

        k = (b * ni + i) * nj + j
        slot = jax.lax.rem(k, 2)

        @pl.when(k == 0)
        def _():
            dma(b, i, j, slot).start()

        @pl.when(k + 1 < nsteps)
        def _():
            kn = k + 1
            bn = kn // (ni * nj)
            rn = jax.lax.rem(kn, ni * nj)
            dma(
                bn, rn // nj, jax.lax.rem(rn, nj), jax.lax.rem(kn, 2)
            ).start()

        dma(b, i, j, slot).wait()
        S = rows + 2 * HALO
        Wd = cols + 2 * HALO
        slab = slabs[slot]

        def rezero(t):
            r_img = (
                jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
                + i * rows - HALO
            )
            c_img = (
                jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
                + j * cols - HALO
            )
            ok = (r_img >= 0) & (r_img < h2) & (c_img >= 0) & (c_img < w2)
            return jnp.where(ok, t, jnp.zeros_like(t))

        src0 = slab if lanes == 64 else slab[:, :, 0:64]
        x = rezero(conv3_same(src0, wa_ref[:], ba_ref[:]))
        x = rezero(conv3_same(x, w0_ref[:], b0_ref[:]))
        x = rezero(conv3_same(x, w2_ref[:], b2_ref[:]))
        x = conv3_same(x, w4_ref[:], b4_ref[:])
        xf = x.reshape(S * Wd, x.shape[-1])
        e = jnp.maximum(
            jax.lax.dot_general(
                xf, w6_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b6_ref[:].reshape(1, -1),
            0.0,
        ).astype(x.dtype)
        o = (
            jax.lax.dot_general(
                e, w8_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b8_ref[:].reshape(1, -1)
        )
        oc = o.reshape(S, Wd, 2)[HALO : HALO + rows, HALO : HALO + cols]
        out_ref[0] = jnp.transpose(oc, (0, 2, 1)).astype(out_ref.dtype)

    def scores_from_x(x, rows, cols, W2P, wts, lanes):
        B_, H2, W2, _ = x.shape
        xp = jnp.pad(
            x,
            (
                (0, 0),
                (HALO, HALO),
                (HALO, HALO + (W2P - W2)),
                (0, lanes - 64),
            ),
        )
        (wa, ba, w0, b0, w2, b2, w4, b4, w6, b6, w8, b8) = wts
        kernel = functools.partial(tail_kernel, rows, cols, H2, W2, lanes)
        wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B_, H2 // rows, W2P // cols),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [wspec] * 12,
            out_specs=pl.BlockSpec(
                (1, rows, 2, cols), lambda b, i, j: (b, i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B_, H2, 2, W2P), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM(
                    (2, rows + 2 * HALO, cols + 2 * HALO, lanes),
                    jnp.bfloat16,
                ),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            ),
        )(xp, wa, ba, w0, b0, w2, b2, w4, b4, w6, b6, w8, b8)

    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    trunk = VGG_UNetTrunk(seam=True)
    x = jnp.asarray(
        rng.standard_normal((B, H, W, 3)).astype(np.float32), jnp.bfloat16
    )
    v = VGG_UNet().init(
        key, jnp.zeros((1, 64, 64, 3), jnp.bfloat16), train=False
    )
    y_lo, t = jax.block_until_ready(
        jax.jit(lambda v, x: trunk.apply(v, x, train=False))(v, x)
    )
    H2, W2 = t.shape[1], t.shape[2]
    print(f"trunk out: y_lo {y_lo.shape} t {t.shape}", flush=True)

    outs = {}
    for name, lanes in (("pad128", 128), ("lane64", 64)):

        def run(v, y_lo, t, lanes=lanes):
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
            xs = jnp.maximum(ya + yb + b1[None], 0.0).astype(jnp.bfloat16)
            return scores_from_x(xs, ROWS, W2, W2, tuple(wts), lanes)

        fn = jax.jit(run)
        try:
            trace_stage(f"seam tail rows={ROWS} {name}", fn, v, y_lo, t)
            outs[name] = np.asarray(
                jax.device_get(fn(v, y_lo, t)), np.float32
            )
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    if len(outs) == 2:
        d = np.abs(outs["pad128"] - outs["lane64"]).max()
        print(f"score maxdiff pad128 vs lane64: {d:.3e}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
