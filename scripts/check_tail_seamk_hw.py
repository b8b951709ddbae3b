"""Device A/B of seam-fused tail variants vs the shipped seam path.

The shipped fused tail pays ~7.5 ms of XLA-side work around the kernel
(device trace at b16 960x640, rows=120): the halo+channel pad copy
2.87 ms, the bilinear upsample fusion 2.70 ms, the seam 1x1 dots +
relu 1.87 ms.  Two variants attack it, sharing three kernel changes —
CLAMPED dim-0 DMA starts (dim 0/1 of a 4D HBM memref are untiled, so
dynamic starts carry no alignment constraint), a W-halo-free slab
(with one full-width col block the W halo is pure zero padding that
``_conv3_same``'s internal pad already provides), and NO rezero mask
(every slab row is now a real image row; interior-edge ring garbage is
excluded by the extraction discipline exactly as before):

  control   — shipped ``fused_tail_scores_cs_seam`` (pad + XLA seam)
  clamp128  — XLA still computes xs = relu(up(ya) + yb + b1) but emits
              it at 128 channels via an N-zero-padded k1 (the pad fuses
              into the dot), and the kernel DMAs it UNPADDED with
              clamped row starts: the 2.87 ms pad copy disappears for
              ~+0.8 ms of wider relu-fusion write.
  seamk     — the seam moves INTO the kernel: DMA raw ``t`` (already
              128-lane, zero XLA-side cost) + the H/4-res 1x1 y-dot
              output (N-padded to 128), upsample 2x bilinear
              (half-pixel, edge-renormalized — exact
              ``jax.image.resize`` semantics) in VMEM, add + ReLU, then
              the usual conv chain.  Kills ALL the XLA-side ops except
              one quarter-res dot.

Numerics gate: fg-mask (>0.4 on either map) must match control
exactly; score maxdiff reported.

    nohup python scripts/check_tail_seamk_hw.py > /tmp/tail_seamk.log 2>&1 &
    python scripts/check_tail_seamk_hw.py --interpret   # CPU logic check
"""
import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

HALO = 4


def _conv3_same(src, wk, bias):
    import jax
    import jax.numpy as jnp

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


def _head(x, w0, b0, w2, b2, w4, b4, w6, b6, w8, b8):
    """conv_cls chain from the 64-ch xs slab to the 2-ch scores."""
    import jax
    import jax.numpy as jnp

    S, Wd, _ = x.shape
    x = _conv3_same(x, w0, b0)
    x = _conv3_same(x, w2, b2)
    x = _conv3_same(x, w4, b4)
    xf = x.reshape(S * Wd, x.shape[-1])
    e = jnp.maximum(
        jax.lax.dot_general(
            xf, w6, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b6.reshape(1, -1),
        0.0,
    ).astype(x.dtype)
    o = (
        jax.lax.dot_general(
            e, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b8.reshape(1, -1)
    )
    return o.reshape(S, Wd, 2)


def clamp128_kernel(
    rows, h2, w2,
    xs_hbm,
    wa_ref, ba_ref, w0_ref, b0_ref, w2_ref, b2_ref, w4_ref, b4_ref,
    w6_ref, b6_ref, w8_ref, b8_ref,
    out_ref,
    slabs, sems,
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    nsteps = pl.num_programs(0) * ni
    S = rows + 2 * HALO

    def st_of(i_):
        return jnp.clip(i_ * rows - HALO, 0, h2 - S)

    def dma(b_, i_, slot):
        return pltpu.make_async_copy(
            xs_hbm.at[b_, pl.ds(st_of(i_), S)],
            slabs.at[slot],
            sems.at[slot],
        )

    k = b * ni + i
    slot = jax.lax.rem(k, 2)

    @pl.when(k == 0)
    def _():
        dma(b, i, slot).start()

    @pl.when(k + 1 < nsteps)
    def _():
        kn = k + 1
        dma(kn // ni, jax.lax.rem(kn, ni), jax.lax.rem(kn, 2)).start()

    dma(b, i, slot).wait()

    x = _conv3_same(slabs[slot][:, :, 0:64], wa_ref[:], ba_ref[:])
    o = _head(
        x, w0_ref[:], b0_ref[:], w2_ref[:], b2_ref[:], w4_ref[:],
        b4_ref[:], w6_ref[:], b6_ref[:], w8_ref[:], b8_ref[:],
    )
    # roff = i*rows - st takes exactly three values (first / interior /
    # last block); Mosaic has no value-level dynamic_slice, so branch
    # on i with static slices.
    _emit_extract(o, i, ni, rows, out_ref)


def _emit_extract(o, i, ni, rows, out_ref):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def put(roff):
        oc = o[roff : roff + rows]
        out_ref[0] = jnp.transpose(oc, (0, 2, 1)).astype(out_ref.dtype)

    @pl.when(i == 0)
    def _():
        put(0)

    @pl.when((i > 0) & (i < ni - 1))
    def _():
        put(HALO)

    @pl.when((i == ni - 1) & (ni > 1))
    def _():
        put(2 * HALO)


def seamk_kernel(
    rows, h2, w2, ydt,
    t_hbm, ya_hbm,
    k1b_ref, b1_ref,
    wa_ref, ba_ref, w0_ref, b0_ref, w2_ref, b2_ref, w4_ref, b4_ref,
    w6_ref, b6_ref, w8_ref, b8_ref,
    out_ref,
    tslabs, yslabs, yaup_s, tsems, ysems,
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    nsteps = pl.num_programs(0) * ni
    S = rows + 2 * HALO
    SY = S // 2 + 2
    h4, w4 = h2 // 2, w2 // 2

    def st_of(i_):
        return jnp.clip(i_ * rows - HALO, 0, h2 - S)

    def sy_of(i_):
        return jnp.clip(st_of(i_) // 2 - 1, 0, h4 - SY)

    def dma_t(b_, i_, slot):
        return pltpu.make_async_copy(
            t_hbm.at[b_, pl.ds(st_of(i_), S)],
            tslabs.at[slot],
            tsems.at[slot],
        )

    def dma_y(b_, i_, slot):
        return pltpu.make_async_copy(
            ya_hbm.at[b_, pl.ds(sy_of(i_), SY)],
            yslabs.at[slot],
            ysems.at[slot],
        )

    k = b * ni + i
    slot = jax.lax.rem(k, 2)

    @pl.when(k == 0)
    def _():
        dma_t(b, i, slot).start()
        dma_y(b, i, slot).start()

    @pl.when(k + 1 < nsteps)
    def _():
        kn = k + 1
        bn, in_, sl = kn // ni, jax.lax.rem(kn, ni), jax.lax.rem(kn, 2)
        dma_t(bn, in_, sl).start()
        dma_y(bn, in_, sl).start()

    dma_t(b, i, slot).wait()
    dma_y(b, i, slot).wait()

    # --- y path: W-upsample at SY rows, then H-interleave ------------
    ys = yslabs[slot][:, :, 0:64].astype(jnp.float32)  # [SY, w4, 64]
    ypw = jnp.pad(ys, ((0, 0), (1, 7), (0, 0)))
    pc_ = ypw[:, 0:w4]
    cc_ = ypw[:, 1 : 1 + w4]
    nc_ = ypw[:, 2 : 2 + w4]
    c_idx = jax.lax.broadcasted_iota(jnp.int32, cc_.shape, 1)
    ew = jnp.where(c_idx == 0, cc_, 0.25 * pc_ + 0.75 * cc_)
    ow = jnp.where(c_idx == w4 - 1, cc_, 0.75 * cc_ + 0.25 * nc_)
    # sublane-pair MERGE: [SY, w4, 2, 64] -> [SY, 2*w4, 64]
    yw = jnp.stack([ew, ow], axis=2).reshape(SY, 2 * w4, 64)
    # H taps with edge duplication baked into the extended slab.
    # d = st//2 - sy takes exactly three values tied to the block
    # index (0 for i==0, 1 interior, 2 for i==ni-1); Mosaic has no
    # value-level dynamic_slice, so branch on i with static slices,
    # writing the upsampled rows through the yaup scratch.
    ye = jnp.concatenate([yw[0:1], yw, yw[SY - 1 : SY]], axis=0)

    def hmix(dd):
        prev = ye[dd : dd + S // 2]
        cur = ye[dd + 1 : dd + 1 + S // 2]
        nxt = ye[dd + 2 : dd + 2 + S // 2]
        eh = 0.25 * prev + 0.75 * cur
        oh = 0.75 * cur + 0.25 * nxt
        yaup_s[:] = jnp.stack([eh, oh], axis=1).reshape(S, 2 * w4, 64)

    @pl.when(i == 0)
    def _():
        hmix(0)

    @pl.when((i > 0) & (i < ni - 1))
    def _():
        hmix(1)

    @pl.when((i == ni - 1) & (ni > 1))
    def _():
        hmix(2)

    ya_up = yaup_s[:]

    # --- t path: 1x1 dot K=128 -> 64 ----------------------------------
    tf = tslabs[slot].reshape(S * w2, 128)
    yb = jax.lax.dot_general(
        tf, k1b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(S, w2, 64)

    xs = jnp.maximum(ya_up + yb + b1_ref[:].reshape(1, 1, -1), 0.0).astype(
        jnp.bfloat16
    )
    x = _conv3_same(xs, wa_ref[:], ba_ref[:])
    o = _head(
        x, w0_ref[:], b0_ref[:], w2_ref[:], b2_ref[:], w4_ref[:],
        b4_ref[:], w6_ref[:], b6_ref[:], w8_ref[:], b8_ref[:],
    )
    _emit_extract(o, i, ni, rows, out_ref)


def build_clamp128(v, rows, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lightly_ocr_tpu.models.vgg_unet import _upsample_to
    from lightly_ocr_tpu.ops.pallas_tail import tail_params

    (k1, b1, wa, ba, w0, b0, w2_, b2, w4_, b4, w6, b6, w8, b8) = tail_params(v)
    k1a = jnp.pad(k1[:64], ((0, 0), (0, 64)))
    k1b = jnp.pad(k1[64:], ((0, 0), (0, 64)))
    b1p = jnp.pad(b1.reshape(-1), (0, 64)).reshape(1, 1, 1, -1)

    def run(y_lo, t):
        B, H2, W2, _ = t.shape
        S = rows + 2 * HALO
        ya = jax.lax.dot_general(
            y_lo.astype(jnp.bfloat16), k1a, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ya = _upsample_to(ya, H2, W2)
        yb = jax.lax.dot_general(
            t.astype(jnp.bfloat16), k1b, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        xs = jnp.maximum(ya + yb + b1p, 0.0).astype(jnp.bfloat16)
        kernel = functools.partial(clamp128_kernel, rows, H2, W2)
        wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B, H2 // rows),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [wspec] * 12,
            out_specs=pl.BlockSpec(
                (1, rows, 2, W2), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, H2, 2, W2), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, S, W2, 128), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(xs, wa, ba, w0, b0, w2_, b2, w4_, b4, w6, b6, w8, b8)

    return run


def build_seamk(v, rows, interpret, ydt="float32"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lightly_ocr_tpu.ops.pallas_tail import tail_params

    (k1, b1, wa, ba, w0, b0, w2_, b2, w4_, b4, w6, b6, w8, b8) = tail_params(v)
    k1a = jnp.pad(k1[:64], ((0, 0), (0, 64)))
    k1b = k1[64:]
    ydtype = jnp.dtype(ydt)

    def run(y_lo, t):
        B, H2, W2, _ = t.shape
        S = rows + 2 * HALO
        SY = S // 2 + 2
        # quarter-res 1x1, N zero-padded to 128 lanes (fuses the pad
        # into the dot's own output write — no separate pad copy)
        ya = jax.lax.dot_general(
            y_lo.astype(jnp.bfloat16), k1a, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(ydtype)
        kernel = functools.partial(seamk_kernel, rows, H2, W2, ydt)
        wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B, H2 // rows),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2 + [wspec] * 14,
            out_specs=pl.BlockSpec(
                (1, rows, 2, W2), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, H2, 2, W2), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, S, W2, 128), jnp.bfloat16),
                pltpu.VMEM((2, SY, W2 // 2, 128), ydtype),
                pltpu.VMEM((S, W2, 64), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(
            t.astype(jnp.bfloat16), ya, k1b,
            jnp.asarray(b1, jnp.float32).reshape(1, 1, -1),
            wa, ba, w0, b0, w2_, b2, w4_, b4, w6, b6, w8, b8,
        )

    return run


def main():
    import jax

    if INTERPRET:
        # plugin registration wins over JAX_PLATFORMS (see tests/conftest)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from lightly_ocr_tpu.models.vgg_unet import VGG_UNet, VGG_UNetTrunk
    from lightly_ocr_tpu.ops.pallas_tail import fused_tail_scores_cs_seam

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    if INTERPRET:
        B, H, W, rows = 2, 96, 64, 16
    else:
        B, H, W, rows = 16, 960, 640, 120

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
    print(f"trunk out: y_lo {y_lo.shape} t {t.shape} rows={rows}", flush=True)

    runs = {
        "control": lambda y, tt: fused_tail_scores_cs_seam(
            v, y, tt, interpret=INTERPRET
        ),
        "clamp128": build_clamp128(v, rows, INTERPRET),
        # rows=96 for seamk: its extra y-slab + yaup scratch put the
        # rows=120 geometry 16.8M over the 110M scoped-vmem limit
        "seamk": build_seamk(v, rows if INTERPRET else 96, INTERPRET),
    }
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    ctl_cache = "/tmp/tail_seamk_control.npy"
    outs = {}
    if only:
        keep = set(only[0].split(","))
        if os.path.exists(ctl_cache) and "control" not in keep:
            # editing this file re-keys every kernel in it (the Pallas
            # backend_config embeds source locations), so reuse the
            # saved control output instead of a 12-min recompile
            outs["control"] = np.load(ctl_cache)
            print("control: loaded cached output", flush=True)
        else:
            keep.add("control")
        runs = {k: f for k, f in runs.items() if k in keep}

    for name, fn in runs.items():
        jfn = jax.jit(fn)
        try:
            if INTERPRET:
                outs[name] = np.asarray(
                    jax.device_get(jfn(y_lo, t)), np.float32
                )
                print(f"{name}: ok {outs[name].shape}", flush=True)
            else:
                from profile_trace import trace_stage

                trace_stage(f"tail rows={rows} {name}", jfn, y_lo, t)
                outs[name] = np.asarray(
                    jax.device_get(jfn(y_lo, t)), np.float32
                )
                if name == "control":
                    np.save(ctl_cache, outs[name])
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    if "control" in outs:
        ref = outs["control"][:, :, :, :W2]
        fg_ref = (ref[:, :, 0] > 0.4) | (ref[:, :, 1] > 0.4)
        for name in ("clamp128", "seamk"):
            if name not in outs:
                continue
            got = outs[name][:, :, :, :W2]
            md = float(np.abs(ref - got).max())
            fg = (got[:, :, 0] > 0.4) | (got[:, :, 1] > 0.4)
            flips = int(np.sum(fg != fg_ref))
            print(
                f"{name}: score maxdiff {md:.3e}, fg-mask flips {flips} "
                f"of {fg.size}", flush=True,
            )
    print("done", flush=True)


if __name__ == "__main__":
    main()
