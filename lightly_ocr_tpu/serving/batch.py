"""Whole-batch OCR as ONE jitted XLA program.

The TPU-throughput path (BASELINE config 5: 64 concurrent receipts):
``[B, H, W, 3]`` same-bucket canvases -> CRAFT forward -> vmapped
on-device box extraction -> per-image top-M crops gathered straight from
the (grayscale) canvases -> one CRNN dispatch over ``B*M`` crops ->
indices + confidences.  No host roundtrip between stages; the only host
work is final text decoding.

Crops are taken from the ORIGINAL-resolution grayscale images, exactly
as the reference does (``net.py:108-111``): detected boxes are mapped
from canvas space back to image space inside the program (x ``2 /
plan.ratio`` with the unbatched path's per-corner truncation), so at
``plan.ratio < 1`` (receipts larger than the canvas) recognizer inputs
never pay a second downscale.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from lightly_ocr_tpu.config import Config
from lightly_ocr_tpu.models.crnn import CRNNet
from lightly_ocr_tpu.models.decode import decode_crops, load_lm_prior
from lightly_ocr_tpu.models.vgg_unet import (
    VGG_UNet,
    VGG_UNetTrunk,
    VggStemPrefix,
)
from lightly_ocr_tpu.ops.crop import crop_resize_normalize_matmul
from lightly_ocr_tpu.ops.detection import get_det_boxes
from lightly_ocr_tpu.text.converters import build_converter


class BatchedOCR:
    """Compiles one program per (batch, canvas, boxes-per-image) shape.

    Pass ``mesh`` (a ``('data', 'model')`` :class:`jax.sharding.Mesh`) to
    shard inference over the data axis: the program is wrapped in
    ``jax.shard_map`` with the canvas batch split across devices and the
    weights replicated — the TPU counterpart of the reference wrapping
    its nets in ``nn.DataParallel`` for inference (``net.py:62-63,
    137-138``).  The batch must be divisible by the data-axis size.
    """

    def __init__(
        self,
        cfg: Config,
        det_variables: dict,
        rec_variables: dict,
        boxes_per_image: int = 32,
        dtype: Any = jnp.bfloat16,
        mesh: Any = None,
    ):
        self.cfg = cfg
        self.dtype = dtype
        self.det_net = VGG_UNet(dtype=dtype, quant=cfg.quant_int8)
        self.det_trunk = VGG_UNetTrunk(dtype=dtype, quant=cfg.quant_int8)
        self.det_stem = VggStemPrefix(dtype=dtype, quant=cfg.quant_int8)
        self.det_trunk_fs = VGG_UNetTrunk(
            dtype=dtype, quant=cfg.quant_int8, from_stem=True
        )
        # seam=True trunks return the pre-concat (upconv3_out, slice1)
        # pair for the seam-split Pallas tail — the 192-ch H/2 concat
        # never materializes (943 MB bf16 at b16 960x640)
        self.det_trunk_seam = VGG_UNetTrunk(
            dtype=dtype, quant=cfg.quant_int8, seam=True
        )
        self.det_trunk_fs_seam = VGG_UNetTrunk(
            dtype=dtype, quant=cfg.quant_int8, from_stem=True, seam=True
        )
        self.det_trunk_pool_seam = VGG_UNetTrunk(
            dtype=dtype, quant=cfg.quant_int8, from_pool=True, seam=True
        )
        self.det_trunk_c21_seam = VGG_UNetTrunk(
            dtype=dtype, quant=cfg.quant_int8, from_c21=True, seam=True
        )
        self.rec_net = CRNNet(cfg, dtype=dtype, quant=cfg.quant_int8)
        self.det_variables = det_variables
        self.rec_variables = rec_variables
        self.boxes_per_image = boxes_per_image
        self.converter = build_converter(cfg.prediction, cfg.character)
        # single-char lookup table for the vectorized host decode
        self._chartab = np.asarray(self.converter.character, dtype="<U1")
        self.mesh = mesh
        self._program = self._build()
        self._compiled: dict = {}  # (shapes/dtypes) -> AOT executable

    def _fused_kernel_plan(
        self, h: int, w: int
    ) -> "tuple[bool, bool, bool | str, bool]":
        """(use_stem, use_tail, use_cpool, use_s2d) for canvas
        ``(h, w)`` — TPU only.  ``use_cpool`` is ``False`` or the
        fused-stem depth to run: ``"pool"`` (conv1_2+pool) / ``"c21"``
        (+conv2_1).  ``use_s2d`` = the space-to-depth stem
        (``ops/s2d_stem.py``; replaces conv1_1+conv1_2+pool1, resumes
        via the from_pool seam trunk — 70.5 -> 64.5 ms detector device
        trace at b16 960x640, BENCH.md round 4; mutually exclusive
        with stem/cpool, which replace the same convs).

        The Pallas TAIL is ON by default on TPU: with the packed
        single-dot kernel it beats the plain flax graph on device
        traces (81.9 vs 83.7 ms detector forward at b16 960x640) and
        compiles in ~17 s at production widths.  The stage set comes
        from ``Config.fused_stages`` (so a deployment is reproducible
        from one config artifact); ``LIGHTLY_OCR_ENABLE_FUSED``
        overrides it for A/B (``=none`` disables, or an explicit comma
        list).  The STEM stays opt-in (`=stem,tail`): the G=2 strided
        conv1_2 regressed end-to-end (83.5 vs 101 receipts/s) and the
        Pallas stem never beat XLA on device."""
        import os

        from lightly_ocr_tpu.ops.pallas_stem import (
            conv_pool_supported,
            stem_supported,
        )
        from lightly_ocr_tpu.ops.pallas_tail import fused_tail_supported

        env = os.environ.get("LIGHTLY_OCR_ENABLE_FUSED")
        explicit = env is not None
        if env is None:
            enabled = set(self.cfg.derived_fused_stages)
        elif env.strip().lower() in ("", "none", "off", "0"):
            enabled = set()
        else:
            enabled = {t.strip() for t in env.split(",")}
        on_tpu = jax.default_backend() == "tpu"
        use_tail = (
            on_tpu and fused_tail_supported(h // 2) and "tail" in enabled
        )
        use_stem = (
            use_tail
            and stem_supported(h)
            and not self.cfg.quant_int8
            and "stem" in enabled
        )
        # conv1_2+pool fused kernels (opt-in pending device A/B): ride
        # the seam tail path, so they require use_tail and the Pallas
        # impl; mutually exclusive with the old stem (all replace
        # conv1_2).  "cpool" = conv1_2+pool; "cpool2" = one stage
        # deeper (conv1_2+pool+conv2_1) — use_cpool carries which.
        use_cpool: bool | str = False
        if (
            use_tail
            and not use_stem
            and conv_pool_supported(h, w)
            and self._fused_impls()[2]  # Pallas (channels-second) impl
        ):
            if "cpool2" in enabled:
                use_cpool = "c21"
            elif "cpool" in enabled:
                use_cpool = "pool"
        from lightly_ocr_tpu.ops.s2d_stem import s2d_supported

        use_s2d = (
            use_tail
            and not use_stem
            and not use_cpool
            and self._fused_impls()[2]  # seam (channels-second) tail
            and s2d_supported(h, w)
            and "s2d" in enabled
        )
        # warn only on EXPLICIT requests that cannot be honored — the
        # default-on tail silently falls back off-TPU / at odd heights
        if explicit and "tail" in enabled and not use_tail:
            import logging

            logging.getLogger(__name__).warning(
                "fused tail requested but not active (%s) — running "
                "without it",
                "backend is %r, not tpu" % jax.default_backend()
                if not on_tpu
                else "canvas height %d: H/2=%d unsupported by the "
                     "tail kernel" % (h, h // 2),
            )
        if explicit and "stem" in enabled and not use_stem:
            import logging

            logging.getLogger(__name__).warning(
                "fused stem requested but not active (requires the "
                "fused tail enabled, a supported canvas height, and "
                "quant_int8 off) — running without it"
            )
        if (
            explicit
            and ({"cpool", "cpool2"} & enabled)
            and not use_cpool
        ):
            import logging

            logging.getLogger(__name__).warning(
                "fused conv1_2+pool requested but not active (requires "
                "the fused Pallas tail with the Pallas impl — not "
                "rowpack —, an even-split canvas, and no 'stem' in the "
                "enable set) — running without it"
            )
        if explicit and "s2d" in enabled and not use_s2d:
            import logging

            logging.getLogger(__name__).warning(
                "s2d stem requested but not active (requires the seam "
                "Pallas tail — not rowpack —, an even canvas, and no "
                "stem/cpool stage in the enable set) — running "
                "without it"
            )
        return use_stem, use_tail, use_cpool, use_s2d

    def _fused_impls(self):
        """(stem_conv, tail_scores, tail_is_cs): the Pallas slab
        kernels by default (``ops/pallas_{stem,tail}.py`` — the
        packed-dot tail wins on device traces and compiles in ~1 min
        at production widths); ``Config.fused_impl="rowpack"`` (env
        override ``LIGHTLY_OCR_FUSED_IMPL``) selects the row-packed
        XLA convs (``ops/rowpack.py``) for A/B.
        ``tail_is_cs`` declares the tail's output layout — channels-
        second ``[B, H2, 2, W2P]`` (Pallas native) vs channels-last —
        so the caller dispatches on impl identity, not shape sniffing.
        """
        import os

        impl = (
            os.environ.get("LIGHTLY_OCR_FUSED_IMPL", "").strip()
            or self.cfg.fused_impl
        )
        if impl == "rowpack":
            from lightly_ocr_tpu.ops.rowpack import (
                stem_conv_rowpacked,
                tail_scores_rowpacked,
            )

            return stem_conv_rowpacked, tail_scores_rowpacked, False
        from lightly_ocr_tpu.ops.pallas_stem import fused_stem_conv
        from lightly_ocr_tpu.ops.pallas_tail import fused_tail_scores_cs_seam

        return fused_stem_conv, fused_tail_scores_cs_seam, True

    def _build(self):
        cfg = self.cfg
        M = self.boxes_per_image
        det_net, rec_net = self.det_net, self.rec_net
        lm = load_lm_prior(cfg)

        det_trunk = self.det_trunk
        det_stem, det_trunk_fs = self.det_stem, self.det_trunk_fs
        det_trunk_seam = self.det_trunk_seam
        det_trunk_fs_seam = self.det_trunk_fs_seam
        det_trunk_pool_seam = self.det_trunk_pool_seam
        det_trunk_c21_seam = self.det_trunk_c21_seam
        plan_for = self._fused_kernel_plan

        fused_impls = self._fused_impls

        def detector_scores(det_vars, canvases):
            # detector forward on the whole batch -> (tmaps, lmaps)
            # f32 [B, H2, W2] each.  On TPU the channel-poor tail
            # (upconv4 3x3 + cls head) runs as the fused Pallas slab
            # kernel by default (LIGHTLY_OCR_FUSED_IMPL=rowpack selects
            # the row-packed XLA A/B impl; LIGHTLY_OCR_ENABLE_FUSED
            # gates stages); XLA keeps the well-shaped middle either
            # way.  The seam is a (tmaps, lmaps) TUPLE so the Pallas
            # tail can hand over its native channels-second layout as
            # two views — the channels-last normalization it would
            # otherwise pay is a 471 MB f32 transpose (~3.5 ms device,
            # the largest single op of the fused path).
            stem_conv, tail_scores, tail_is_cs = fused_impls()

            use_stem, use_tail, use_cpool, use_s2d = plan_for(
                canvases.shape[1], canvases.shape[2]
            )
            if use_tail:
                w2 = canvases.shape[2] // 2
                if tail_is_cs:
                    # seam-split Pallas path: the trunk hands over the
                    # PRE-concat (upconv3_out, slice1) pair and the
                    # tail folds the seam into upconv4's linear 1x1
                    # (fused_tail_scores_cs_seam) — the 192-ch H/2
                    # concat never materializes.
                    if use_cpool == "c21":
                        from lightly_ocr_tpu.ops.pallas_stem import (
                            fused_conv12_pool_conv21,
                            fused_conv12_pool_conv21_q,
                        )

                        # int8 serving graph -> w8a8 kernel (half the
                        # slab DMA bytes, 2x MXU peak on the packed
                        # dots); float graph -> bf16 kernel
                        c21 = (
                            fused_conv12_pool_conv21_q
                            if cfg.quant_int8
                            else fused_conv12_pool_conv21
                        )
                        x0 = det_stem.apply(det_vars, canvases)
                        p1 = c21(det_vars, x0)
                        y_lo, t = det_trunk_c21_seam.apply(det_vars, p1)
                    elif use_cpool:
                        from lightly_ocr_tpu.ops.pallas_stem import (
                            fused_conv12_pool,
                        )

                        import os as _os

                        pool_impl = (
                            _os.environ.get(
                                "LIGHTLY_OCR_CPOOL_POOL", ""
                            ).strip()
                            or cfg.cpool_pool
                        )
                        x0 = det_stem.apply(det_vars, canvases)
                        p1 = fused_conv12_pool(
                            det_vars, x0, pool_impl=pool_impl
                        )
                        y_lo, t = det_trunk_pool_seam.apply(det_vars, p1)
                    elif use_stem:
                        x0 = det_stem.apply(det_vars, canvases)
                        s1c = stem_conv(det_vars, x0)
                        y_lo, t = det_trunk_fs_seam.apply(det_vars, s1c)
                    elif use_s2d:
                        from lightly_ocr_tpu.ops.s2d_stem import (
                            s2d_conv12_pool,
                        )

                        # conv1_1+conv1_2+pool1 as phase-packed dense
                        # convs (no full-res layout anywhere); resumes
                        # at conv2_1 via the from_pool seam trunk.
                        # Cast to the serving dtype FIRST — the flax
                        # modules cast internally, but s2d picks its
                        # compute dtype from the input's.
                        p1 = s2d_conv12_pool(
                            det_vars, canvases.astype(self.dtype)
                        )
                        y_lo, t = det_trunk_pool_seam.apply(det_vars, p1)
                    else:
                        y_lo, t = det_trunk_seam.apply(det_vars, canvases)
                    y = tail_scores(det_vars, y_lo, t)
                    # channels-second [B, H2, 2, W2P] (Pallas impl's
                    # native layout; W2P >= W2 col-block padding, and
                    # pad columns carry bias-propagated garbage — the
                    # :w2 slice is mandatory, see fused_tail_scores_cs)
                    return y[:, :, 0, :w2], y[:, :, 1, :w2]
                if use_stem:
                    x0 = det_stem.apply(det_vars, canvases)
                    s1c = stem_conv(det_vars, x0)
                    y192 = det_trunk_fs.apply(det_vars, s1c)
                else:
                    y192 = det_trunk.apply(det_vars, canvases)
                y = tail_scores(det_vars, y192)
                return y[..., 0], y[..., 1]
            y, _ = det_net.apply(det_vars, canvases)
            y = y.astype(jnp.float32)
            return y[..., 0], y[..., 1]

        def postprocess(rec_vars, y, gray, inv_ratio, extents):
            # on-device box extraction: on TPU the CC labeling runs
            # batched as a Pallas kernel (grid = one VMEM-resident image
            # per step; vmapping the kernel would collapse the grid into
            # one oversized block), then the rest is vmapped with the
            # labels threaded through.
            tmaps, lmaps = y  # (region, affinity) f32 [B, H2, W2] each
            if jax.default_backend() == "tpu":
                from lightly_ocr_tpu.ops.pallas_cc import (
                    label_components_checked,
                )

                fg = (tmaps > cfg.low_text) | (lmaps > cfg.link_threshold)
                # fast-bound 4: CC rounds cost ~0.7 ms each at b16
                # 480x320; gaussian text blobs converge in 1-2, and a
                # pessimistic ink-letter sweep measured 12/13 masks
                # converged at 4 (only an adversarial snake needs more
                # — which the residual check escalates past anyway)
                labels = label_components_checked(
                    fg,
                    rounds=min(cfg.cc_max_iters, 4),
                    max_rounds=max(cfg.cc_max_iters, 24),
                )
            else:
                from lightly_ocr_tpu.ops.detection import label_components

                fg = (tmaps > cfg.low_text) | (lmaps > cfg.link_threshold)
                labels = jax.vmap(
                    lambda m: label_components(m, cfg.cc_max_iters)
                )(fg)
            det = jax.vmap(
                lambda t, l, lab: get_det_boxes(
                    t,
                    l,
                    text_threshold=cfg.text_threshold,
                    link_threshold=cfg.link_threshold,
                    low_text=cfg.low_text,
                    max_boxes=M,
                    cc_rounds=cfg.cc_max_iters,
                    precomputed_labels=lab,
                )
            )(tmaps, lmaps, labels)
            boxes, valid = det.boxes, det.valid  # [B,M,4,2], [B,M]

            # 3) heatmap -> ORIGINAL-image coords (x2 net ratio, then
            # 1/plan.ratio — PER IMAGE: mixed-size batches carry one
            # resize ratio each), truncated per corner exactly like the
            # unbatched boxes_to_rects, then clipped to each image's
            # TRUE extent (gray may be padded up to a shared bucket so
            # distinct upload sizes reuse one compiled program)
            scaled = jnp.trunc(boxes * (2.0 * inv_ratio[:, None, None, None]))
            c0 = jnp.min(scaled[..., 0], axis=2)
            r0 = jnp.min(scaled[..., 1], axis=2)
            c1 = jnp.max(scaled[..., 0], axis=2)
            r1 = jnp.max(scaled[..., 1], axis=2)
            H0 = extents[:, 0][:, None]  # [B,1] true per-image height
            W0 = extents[:, 1][:, None]
            r0 = jnp.clip(r0, 0.0, H0)
            r1 = jnp.clip(r1, 0.0, H0)
            c0 = jnp.clip(c0, 0.0, W0)
            c1 = jnp.clip(c1, 0.0, W0)
            valid = valid & (r1 > r0) & (c1 > c0)
            rects = jnp.stack([r0, c0, r1, c1], axis=-1)  # [B, M, 4]
            rects = jnp.where(valid[..., None], rects, jnp.asarray([0, 0, 1, 1], jnp.float32))

            # 4) crop every rect from its own ORIGINAL-resolution gray
            # image — separable interpolation as two MXU matmuls (cubic
            # kernel = reference's PIL BICUBIC recognizer feed)
            crops = jax.vmap(
                lambda g, r: crop_resize_normalize_matmul(
                    g, r, cfg.height, cfg.width, "cubic"
                )
            )(gray, rects)  # [B, M, h, w, 1]
            crops = crops.reshape(-1, cfg.height, cfg.width, 1)

            # 5) recognize all B*M crops in one dispatch, decoded by
            # the SHARED models/decode.py implementation (greedy / CTC
            # prefix beam + optional LM prior / attention beam) — the
            # per-image engine uses the same function, so the two
            # paths cannot drift
            idx, conf = decode_crops(rec_net, rec_vars, crops, cfg, lm)
            B = tmaps.shape[0]
            return {
                "rects": rects,
                "valid": valid,
                "pred_idx": idx.reshape(B, M, -1),
                "confidence": conf.astype(jnp.float32).reshape(B, M),
            }

        def program(det_vars, rec_vars, canvases, gray, inv_ratio, extents):
            y = detector_scores(det_vars, canvases)
            return postprocess(rec_vars, y, gray, inv_ratio, extents)

        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            from lightly_ocr_tpu.parallel.mesh import DATA_AXIS

            out_specs = {
                "rects": P(DATA_AXIS),
                "valid": P(DATA_AXIS),
                "pred_idx": P(DATA_AXIS),
                "confidence": P(DATA_AXIS),
            }
            return jax.jit(
                jax.shard_map(
                    program,
                    mesh=self.mesh,
                    in_specs=(
                        P(),
                        P(),
                        P(DATA_AXIS),
                        P(DATA_AXIS),
                        P(DATA_AXIS),
                        P(DATA_AXIS),
                    ),
                    out_specs=out_specs,
                    check_vma=False,
                )
            )

        import os

        mono_env = os.environ.get("LIGHTLY_OCR_MONOLITH", "")
        # The monolith is the default even with the Pallas tail inside:
        # the packed-dot kernel's Mosaic compile is ~1 min at the
        # default full-width production geometry (the pre-col-blocking
        # SIGKILLs are history), and the split costs ~10% throughput
        # on the tunnel (one extra RPC submission per batch).
        # Config.monolith drives it; LIGHTLY_OCR_MONOLITH=0/1 overrides
        # for A/B.
        if mono_env:
            want_split = mono_env == "0"
        else:
            want_split = not cfg.monolith
        if jax.default_backend() == "tpu" and want_split:
            # Split the chain into separately-jitted dispatches — A/B
            # and bench --stage-times only (LIGHTLY_OCR_MONOLITH=0).
            # Measured cost of the split on the axon tunnel: ~10%
            # throughput (2 RPC submissions per batch), so the default
            # is the single program.  Units:
            # detector scores (stem prefix + fused conv1_2 + trunk +
            # fused tail) | post (CC + boxes + crops + recognizer).
            scores_fn = jax.jit(detector_scores)
            post_fn = jax.jit(postprocess)
            self._stage_fns = (scores_fn, post_fn)  # for bench --stage-times

            def chained(det_vars, rec_vars, canvases, gray, inv_ratio,
                        extents):
                y = scores_fn(det_vars, canvases)
                return post_fn(rec_vars, y, gray, inv_ratio, extents)

            return chained
        return jax.jit(program)

    def __call__(
        self,
        canvases: jax.Array,
        gray: jax.Array,
        inv_ratio=1.0,
        extents=None,
    ) -> dict:
        """canvases [B,H,W,3] normalized; gray [B,H0,W0] ORIGINAL-
        resolution luma in [0,255] (may be zero-padded up to a shared
        bucket); inv_ratio = 1/plan.ratio (canvas -> original scale),
        scalar or per-image [B]; extents = true per-image (h0, w0)
        [B,2] (defaults to gray's full extent).  Output rects are
        original-image coords."""
        B = canvases.shape[0]
        inv_ratio = jnp.broadcast_to(
            jnp.asarray(inv_ratio, jnp.float32).reshape(-1), (B,)
        )
        if extents is None:
            extents = jnp.tile(
                jnp.asarray(
                    [[gray.shape[1], gray.shape[2]]], jnp.float32
                ),
                (B, 1),
            )
        else:
            extents = jnp.asarray(extents, jnp.float32)
        args = (
            self.det_variables,
            self.rec_variables,
            canvases,
            gray,
            inv_ratio,
            extents,
        )
        return self._resolve(canvases, gray, inv_ratio, extents)(*args)

    def _resolve(self, canvases, gray, inv_ratio, extents):
        """Executable for this input shape, via the persistent AOT
        cache (utils/aotcache) when the program is a plain jit — the
        tunnel's remote compiles are multi-minute and non-persistent,
        so serving/bench cold starts load a serialized executable
        instead of recompiling."""
        if not hasattr(self._program, "lower"):
            return self._program  # split dispatch path: plain chained fn
        key = (
            canvases.shape, str(canvases.dtype), gray.shape, str(gray.dtype)
        )
        fn = self._compiled.get(key)
        if fn is None:
            from lightly_ocr_tpu.utils.aotcache import cached_compile

            fn = cached_compile(
                self._program,
                (
                    self.det_variables,
                    self.rec_variables,
                    canvases,
                    gray,
                    inv_ratio,
                    extents,
                ),
                label="batched-ocr",
                devices=self.mesh.devices if self.mesh is not None else None,
            )
            self._compiled[key] = fn
        return fn

    def run_images(self, images: list) -> list[list[dict]]:
        """Host convenience: RGB uint8 images of ARBITRARY mixed sizes
        -> per-image [{text, confidence, rect}] with rects mapped back
        to original-image coordinates.

        Images are grouped by (canvas bucket, gray bucket) — both
        coarse quantizations — and each group is padded up to a
        power-of-two BATCH bucket, so real traffic with arbitrary
        upload sizes and arbitrary request counts compiles a bounded
        number of programs (the reference's per-size canvases,
        ``imgproc.py``, would be a recompile storm under jit).  Within
        a group each image keeps its own resize ratio and true extent;
        those travel as program DATA, not shape."""
        import numpy as np

        from lightly_ocr_tpu.ops.image import (
            make_detector_input,
            pick_canvas_bucket,
            pick_gray_bucket,
            plan_aspect_resize,
        )

        cfg = self.cfg
        luma = np.asarray([0.299, 0.587, 0.114], np.float32)
        groups: dict = {}
        for i, img in enumerate(images):
            h, w = img.shape[:2]
            cb = pick_canvas_bucket(
                h, w, cfg.canvas_size, cfg.magnify_ratio,
                granularity=cfg.bucket_granularity,
            )
            gb = pick_gray_bucket(h, w, cfg.gray_granularity)
            groups.setdefault((cb, gb), []).append(i)

        results: list = [None] * len(images)
        for (cb, gb), idxs in groups.items():
            # pad the group to a power-of-two batch so the BATCH dim is
            # bucketed too — otherwise every distinct request count
            # compiles (and AOT-caches) its own multi-minute program
            B = 1 << (len(idxs) - 1).bit_length()
            canv = []  # device-resident: resize runs on device, no pull
            grays = np.zeros((B, *gb), np.float32)
            inv_ratios = np.ones((B,), np.float32)
            extents = np.ones((B, 2), np.float32)  # 1x1: pad rows inert
            for j, i in enumerate(idxs):
                img = np.asarray(images[i], np.float32)
                h, w = img.shape[:2]
                plan = plan_aspect_resize(
                    h, w, cfg.canvas_size, cfg.magnify_ratio,
                    canvas_bucket=cb,
                )
                c, _ = make_detector_input(jnp.asarray(img), plan)
                canv.append(c)
                # full-resolution luma (host: the device round-trip
                # would cost two tunnel transfers per image), zero-
                # padded to the gray bucket — padding is outside every
                # (clipped) rect
                grays[j, :h, :w] = img @ luma
                inv_ratios[j] = 1.0 / plan.ratio
                extents[j] = (float(h), float(w))
            canv.extend(
                [jnp.zeros((*cb, 3), jnp.float32)] * (B - len(idxs))
            )
            out = self(
                jnp.stack(canv),
                jnp.asarray(grays),
                jnp.asarray(inv_ratios),
                jnp.asarray(extents),
            )
            for i, items in zip(idxs, self.decode(out)):
                results[i] = items
        return results

    def decode(self, out: dict) -> list[list[dict]]:
        """Device outputs -> per-image [{text, confidence, rect}].

        The text decode is vectorized: character lookup / EOS stops /
        CTC collapse masks are computed for the whole [B, M, T] block in
        numpy, and per-box work is reduced to a string slice (attention)
        or one small fancy-index + join (CTC).  Equivalent to running the
        converter per box (tested), ~10x less host time per dispatch.
        """
        # one batched device->host pull (4 separate np.asarray calls
        # would each pay a tunnel round-trip on remote backends)
        host = jax.device_get(
            {k: out[k] for k in ("valid", "pred_idx", "confidence", "rects")}
        )
        valid = np.asarray(host["valid"])
        idx = np.asarray(host["pred_idx"])
        conf = np.asarray(host["confidence"])
        rects = np.asarray(host["rects"])
        B, M, T = idx.shape
        if self.cfg.prediction == "CTC":
            if self.cfg.ctc_decode == "beam":
                # beam output is already a final label sequence —
                # only drop the blank padding (re-collapsing would eat
                # genuine double letters)
                keep = idx != 0
            else:
                # collapse repeats then drop blanks: keep positions
                # that are non-blank AND differ from the previous
                # step's index; the join below reuses this block-level
                # char lookup
                prev = np.concatenate(
                    [np.full((B, M, 1), -1, idx.dtype), idx[..., :-1]],
                    axis=-1,
                )
                keep = (idx != 0) & (idx != prev)
            chars = self._chartab[idx]  # [B, M, T] '<U1'
        else:
            chars = np.ascontiguousarray(self._chartab[idx])
            full = chars.view(f"<U{T}")[..., 0]  # [B, M] full strings
            eos = idx == self.converter.eos_index
            stop = np.where(eos.any(-1), eos.argmax(-1), T)
            # '[GO]' (index 0) is a multi-char token the '<U1' table
            # truncates; rows that emit it before EOS (rare — an
            # untrained/confused decoder) take the converter fallback
            go_before_stop = ((idx == 0) & (np.arange(T) < stop[..., None])).any(-1)
        results = []
        for b in range(B):
            items = []
            for m in np.nonzero(valid[b])[0]:
                if self.cfg.prediction == "CTC":
                    text = "".join(chars[b, m][keep[b, m]])
                elif go_before_stop[b, m]:
                    text = self.converter.decode_trimmed(idx[b, m][None])[0]
                else:
                    text = full[b, m][: stop[b, m]]
                items.append(
                    {
                        "text": text,
                        "confidence": float(conf[b, m]),
                        "rect": rects[b, m].tolist(),
                    }
                )
            results.append(items)
        return results
