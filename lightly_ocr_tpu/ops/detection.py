"""CRAFT score-map post-processing as one jitted XLA program.

The reference extracts word boxes on the host with OpenCV
(``ocr/tools/det_utils.py:35-94``): binary thresholds, 4-connectivity
``cv2.connectedComponentsWithStats``, a *per-component Python loop* doing
area/peak filtering, square-kernel dilation sized by
``niter = floor(sqrt(size*min(w,h)/(w*h))*2)``, ``cv2.minAreaRect`` +
``boxPoints``, a square-box axis-align special case, and a clockwise roll.
That loop is one of the three hot paths called out in SURVEY §3.1.

This module re-derives the same geometry as dense, batched tensor math:

* **Connected components**: iterated *segmented min-scans* — labels start
  as linear indices; each round propagates the row-wise then column-wise
  running minimum within foreground runs (an associative scan, so XLA can
  parallelize it), which converges in a handful of rounds for text-shaped
  blobs.  4-connectivity is preserved because propagation only ever moves
  along rows/columns.
* **Stats**: one segment-reduction pass (area, text peak, bbox).
* **minAreaRect + dilation, exactly and without materializing the dilated
  mask**: ``cv2.dilate`` with a box kernel is a Minkowski sum, and the
  support function of a Minkowski sum is the sum of support functions —
  so the rotated extents of the *dilated* component equal the extents of
  the raw component plus ``he*(|cos t|+|sin t|)`` (plus a half-pixel
  centre shift when the kernel side is even, matching OpenCV's anchor).
  A dense sweep over D angles turns min-area-rect into two MXU matmuls +
  segment min/max, vectorized over ALL components at once; D=128 keeps
  the quantization error far inside the >=99% box-IoU budget.

Static shapes: at most ``max_boxes`` components survive, padded with a
validity mask.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_BIG = jnp.int32(2**30)


# ---------------------------------------------------------------------------
# Connected-component labeling
# ---------------------------------------------------------------------------


def _segmented_min_scan(values: jax.Array, boundary: jax.Array, axis: int,
                        reverse: bool) -> jax.Array:
    """Running min along ``axis`` that resets at ``boundary`` elements.

    Implementation: native ``cummax`` assigns each element its segment's
    start position, then Hillis-Steele doubling takes mins over shifted
    copies gated by same-segment membership — plain pads/compares/selects
    that XLA fuses, much cheaper on TPU than a tuple-typed
    ``associative_scan``.
    """
    n = values.shape[axis]
    if reverse:
        values = jnp.flip(values, axis)
        boundary = jnp.flip(boundary, axis)

    # segment id = position of the most recent boundary (cummax; native)
    pos_shape = [1] * values.ndim
    pos_shape[axis] = n
    pos = jnp.arange(n, dtype=jnp.int32).reshape(pos_shape)
    seg = jax.lax.cummax(jnp.where(boundary, pos, -1), axis=axis)

    out = values
    shift = 1
    while shift < n:
        shifted = jnp.roll(out, shift, axis=axis)
        seg_shifted = jnp.roll(seg, shift, axis=axis)
        idx = jax.lax.broadcasted_iota(jnp.int32, out.shape, axis)
        ok = (idx >= shift) & (seg_shifted == seg)
        out = jnp.where(ok, jnp.minimum(out, shifted), out)
        shift *= 2

    if reverse:
        out = jnp.flip(out, axis)
    return out


def label_components(
    fg: jax.Array, max_rounds: int = 24, unrolled_rounds: int = 4
) -> jax.Array:
    """4-connectivity CC labeling of a [H, W] bool mask.

    Returns int32 labels = the minimum linear index in each component;
    background pixels get H*W.  Equivalent to the labeling relation of
    ``cv2.connectedComponentsWithStats(connectivity=4)`` (label *values*
    differ; the partition is identical).

    One round = full segmented min-scans L->R, R->L, T->B, B->T, so a
    round propagates across any monotone staircase; text blobs converge
    in 1-2 rounds.  The first ``unrolled_rounds`` run unconditionally
    (no convergence sync); a while_loop mops up pathological shapes up
    to ``max_rounds``.
    """
    H, W = fg.shape
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    labels = jnp.where(fg, idx, _BIG)
    bg = ~fg

    def one_round(labels):
        labels = _segmented_min_scan(labels, bg, axis=1, reverse=False)
        labels = _segmented_min_scan(labels, bg, axis=1, reverse=True)
        labels = _segmented_min_scan(labels, bg, axis=0, reverse=False)
        labels = _segmented_min_scan(labels, bg, axis=0, reverse=True)
        return jnp.where(fg, labels, _BIG)

    unrolled = max(1, min(unrolled_rounds, max_rounds))
    for _ in range(unrolled):
        prev = labels
        labels = one_round(labels)

    if max_rounds > unrolled:

        def cond(state):
            labels, prev, i = state
            return (i < max_rounds) & jnp.any(labels != prev)

        def body(state):
            labels, _, i = state
            return one_round(labels), labels, i + 1

        labels, _, _ = jax.lax.while_loop(
            cond, body, (labels, prev, jnp.int32(unrolled))
        )
    return jnp.where(fg, labels, jnp.int32(H * W))


# ---------------------------------------------------------------------------
# Box extraction
# ---------------------------------------------------------------------------


class DetBoxes(NamedTuple):
    boxes: jax.Array  # [K, 4, 2] (x, y) heatmap-space corners, clockwise
    valid: jax.Array  # [K] bool
    labels: jax.Array  # [H, W] int32 component labels (for poly mode)
    cid: jax.Array  # [H, W] int32 compact component id (K = invalid)


@functools.partial(
    jax.jit,
    static_argnames=("max_boxes", "num_angles", "cc_rounds", "cc_impl"),
)
def get_det_boxes(
    textmap: jax.Array,
    linkmap: jax.Array,
    text_threshold: float = 0.7,
    link_threshold: float = 0.4,
    low_text: float = 0.4,
    max_boxes: int = 256,
    num_angles: int = 128,
    cc_rounds: int = 24,
    cc_impl: str = "xla",
    precomputed_labels: jax.Array | None = None,
) -> DetBoxes:
    """det_boxes_core (``det_utils.py:35-94``) as a single XLA program.

    ``cc_impl='pallas'`` runs the CC labeling as a VMEM-resident Pallas
    kernel (TPU only) — same labels, no HBM roundtrips between scan
    steps.  When this function is vmapped, pass ``precomputed_labels``
    from a batched :func:`~lightly_ocr_tpu.ops.pallas_cc.
    label_components_pallas` call instead (vmap would collapse the
    Pallas grid into one oversized VMEM block).
    """
    H, W = textmap.shape
    HW = H * W
    K = max_boxes

    text = textmap > low_text  # cv2.threshold uses strict >
    link = linkmap > link_threshold
    fg = text | link

    if precomputed_labels is not None:
        labels = jnp.where(fg, precomputed_labels, jnp.int32(HW))
    elif cc_impl == "pallas":
        from lightly_ocr_tpu.ops.pallas_cc import label_components_pallas

        labels = label_components_pallas(fg, rounds=min(cc_rounds, 6))
    else:
        labels = label_components(fg, cc_rounds)  # [H, W], bg = HW
    flat_labels = labels.reshape(-1)

    # --- candidate-first, scatter-free statistics ---
    # TPU scatters move ~0.5 GB/s regardless of index pattern (measured),
    # so per-component stats avoid them entirely: pick candidate roots
    # straight from the labels (a root's label IS its linear index), map
    # pixels to a small candidate id by binary search, then reduce every
    # statistic as dense masked min/max/sum over the K2 candidate bins —
    # pure fused VPU work.  Cap: 2*max_boxes candidates pre-filter (the
    # reference has no cap; overflow drops trailing components).
    K2 = 2 * K
    lin = jnp.arange(HW, dtype=jnp.int32)
    roots_flat = flat_labels == lin

    # Candidate extraction is TWO-LEVEL when the map is tall enough: a
    # flat top_k over all HW pixels lowers to a full sort on TPU —
    # 2.91 ms of the 4.4 ms box stage at b16 480x320 (device trace).
    # A root is its component's smallest linear index, i.e. the
    # LEFTMOST root pixel of its topmost row — so extract up to J
    # leftmost roots per row with a masked-min scan (J cheap [H, W]
    # passes, parallel across rows), then run the exact top_k over the
    # J*H survivors (~13x smaller sort).  CAVEAT (documented, bounded):
    # a row whose TOPMOST pixels start more than J components loses the
    # rightmost overflow even if global candidate slots remain — a
    # tighter drop than the K2 cap alone (which the reference lacks
    # entirely; tests/test_detection.py locks the semantics).  The flat
    # sort is kept for short maps where J*H would crowd K2 and the
    # sort is cheap anyway.
    J = min(32, W)
    if H >= 64 and K2 * 4 <= J * H:
        rootv = jnp.where(
            roots_flat.reshape(H, W), lin.reshape(H, W), _BIG
        )

        def _extract_min(x, _):
            m = jnp.min(x, axis=1)  # [H] leftmost remaining root/row
            return jnp.where(x == m[:, None], _BIG, x), m

        _, row_mins = jax.lax.scan(_extract_min, rootv, None, length=J)
        cand = -jax.lax.top_k(-row_mins.reshape(-1), K2)[0]
    else:
        cand = -jax.lax.top_k(jnp.where(roots_flat, -lin, -_BIG), K2)[0]
    cand_valid = cand < _BIG  # ascending root ids, padded with _BIG

    # pixel -> candidate id, ONLY for the per-pixel ``cid`` output (poly
    # mode).  The box sweep below compares labels against candidate
    # label VALUES directly, so this searchsorted is dead code whenever
    # the caller consumes just boxes/valid (the batched serving path)
    # and XLA eliminates it.  'compare_all' rather than the default
    # 'scan' method, which serializes on TPU (~70 ms device time for
    # this one op, measured); even dense comparison materializes a
    # [HW, 2K] compare — ~20 ms at batch 16 — which is why it must not
    # sit on the box path.
    cid1 = jnp.clip(
        jnp.searchsorted(cand, flat_labels, method="compare_all"), 0, K2 - 1
    )
    cid1 = jnp.where(jnp.take(cand, cid1) == flat_labels, cid1, K2)

    # --- ONE chunked per-(candidate, row) sweep for every statistic ---
    # Two cid views: ALL component pixels (area/peak/extent stats, as
    # cv2's connectedComponentsWithStats sees them) and the geometry
    # view with link-only pixels dropped (det_utils.py:60).  Per-row
    # extreme columns are exact support-function inputs because convex
    # hull vertices are always row extremes.
    # The sweep masks compare labels against candidate label VALUES
    # (``cand[k]``), never against the per-pixel compact id — that keeps
    # the expensive pixel->cid mapping off the box path entirely.
    # Layout: the masked reductions collapse the COLUMN axis, and TPU
    # reductions along the minor (lane) dimension pay cross-lane work
    # per output element while second-minor reductions are plain
    # per-lane accumulation — so the sweep runs on transposed
    # [chunk, W, H] views and reduces axis 1.
    lab_t = labels.T  # [W, H]; background = HW, roots < HW, pad = _BIG
    text2d = text  # [H, W] bool, textmap > low_text
    link2d = link
    geom_lab_t = jnp.where((link2d & ~text2d).T, jnp.int32(HW), lab_t)
    hot_t = (textmap >= text_threshold).astype(jnp.float32).T  # [W, H]
    cols_t = jnp.arange(W, dtype=jnp.float32)[:, None] * jnp.ones(
        (1, H), jnp.float32
    )
    neg_inf = jnp.float32(-1e30)
    pos_inf = jnp.float32(1e30)

    chunk = min(64, K2)

    def row_chunk(k0):
        kv = jax.lax.dynamic_slice_in_dim(cand, k0, chunk)[:, None, None]
        m_all = lab_t[None] == kv  # [chunk, W, H]
        m_geom = geom_lab_t[None] == kv
        cnt = jnp.sum(m_all, axis=1).astype(jnp.float32)  # [chunk, H]
        hot = jnp.max(jnp.where(m_all, hot_t[None], 0.0), axis=1)
        ax = jnp.max(jnp.where(m_all, cols_t[None], neg_inf), axis=1)
        an = jnp.min(jnp.where(m_all, cols_t[None], pos_inf), axis=1)
        rx_c = jnp.max(jnp.where(m_geom, cols_t[None], neg_inf), axis=1)
        lx_c = jnp.min(jnp.where(m_geom, cols_t[None], pos_inf), axis=1)
        return cnt, hot, an, ax, lx_c, rx_c

    if K2 <= chunk:
        cnt, hot, an, ax, lx2, rx2 = row_chunk(0)
    else:
        starts = jnp.arange(0, K2, chunk, dtype=jnp.int32)
        cnt, hot, an, ax, lx2, rx2 = (
            x.reshape(-1, H) for x in jax.lax.map(row_chunk, starts)
        )  # each [K2, H]

    area = jnp.sum(cnt, axis=1)
    peak_ok = jnp.max(hot, axis=1) > 0.5  # any pixel >= text_threshold
    maxx = jnp.max(ax, axis=1)
    minx = jnp.min(an, axis=1)
    rows_f = jnp.arange(H, dtype=jnp.float32)[None, :]
    maxy = jnp.max(jnp.where(cnt > 0, rows_f, neg_inf), axis=1)
    miny = (cand // W).astype(jnp.float32)  # root = topmost-leftmost pixel

    keep = cand_valid & (area >= 10) & peak_ok

    # --- compact K2 -> K slots, preserving scan order ---
    rank = jnp.cumsum(keep) - 1
    slot = jnp.where(keep & (rank < K), rank, K)
    sel = (
        jnp.full((K + 1,), K2, jnp.int32)
        .at[slot]
        .set(jnp.arange(K2, dtype=jnp.int32), mode="drop")[:K]
    )
    valid = sel < K2
    sel_c = jnp.minimum(sel, K2 - 1)

    k_area = jnp.where(valid, area[sel_c], 0.0)
    k_w = jnp.where(valid, maxx[sel_c] - minx[sel_c] + 1.0, 1.0)
    k_h = jnp.where(valid, maxy[sel_c] - miny[sel_c] + 1.0, 1.0)
    # niter = floor(sqrt(size * min(w,h) / (w*h)) * 2)   (det_utils.py:63)
    niter = jnp.floor(
        jnp.sqrt(k_area * jnp.minimum(k_w, k_h) / jnp.maximum(k_w * k_h, 1.0))
        * 2.0
    )
    he = niter / 2.0  # Minkowski half-extent of the (1+niter) box kernel
    shift = jnp.where(jnp.mod(niter, 2.0) == 1.0, 0.5, 0.0)  # even kernel

    # --- final compact id per pixel (exposed for poly mode) ---
    table2 = jnp.concatenate(
        [slot.astype(jnp.int32), jnp.full((1,), K, jnp.int32)]
    )
    cid = jnp.take(table2, cid1)

    # per-(component, row) extreme columns: gather the surviving
    # candidates' rows from the merged sweep
    lx = jnp.where(valid[:, None], lx2[sel_c], pos_inf)  # [K, H]
    rx = jnp.where(valid[:, None], rx2[sel_c], neg_inf)
    row_has = rx > -1e29
    yv = jnp.arange(H, dtype=jnp.float32)[None, :, None]  # [1, H, 1]
    lx_ = jnp.where(row_has, lx, 0.0)[:, :, None]  # [K, H, 1]
    rx_ = jnp.where(row_has, rx, 0.0)[:, :, None]
    big = jnp.float32(1e30)
    neg = jnp.where(row_has, 0.0, big)[:, :, None]
    pos = jnp.where(row_has, 0.0, -big)[:, :, None]

    # --- dense support sweep over D angles (theta in [0, 90)) ---
    d = num_angles
    theta = jnp.arange(d, dtype=jnp.float32) * (jnp.pi / 2.0 / d)
    c, s = jnp.cos(theta), jnp.sin(theta)  # c > 0, s >= 0 on [0, 90)
    cN, sN = c[None, None, :], s[None, None, :]
    # u=(c,s):  row min at left extreme, row max at right extreme
    ux_min = jnp.min(lx_ * cN + yv * sN + neg, axis=1)  # [K, D]
    ux_max = jnp.max(rx_ * cN + yv * sN + pos, axis=1)
    # v=(-s,c): row min at right extreme, row max at left extreme
    uy_min = jnp.min(-rx_ * sN + yv * cN + neg, axis=1)
    uy_max = jnp.max(-lx_ * sN + yv * cN + pos, axis=1)

    # dilation in support space: +/- he*(|c|+|s|), center shift for even
    # kernels (OpenCV anchor at K//2 shifts the sum by +0.5 per axis)
    grow = he[:, None] * (jnp.abs(c) + jnp.abs(s))[None, :]
    shift_x = shift[:, None] * (c + s)[None, :]
    shift_y = shift[:, None] * (c - s)[None, :]
    x0 = ux_min - grow + shift_x
    x1 = ux_max + grow + shift_x
    y0 = uy_min - grow + shift_y
    y1 = uy_max + grow + shift_y

    areas = (x1 - x0) * (y1 - y0)
    areas = jnp.where(jnp.isfinite(areas), areas, jnp.inf)
    best = jnp.argmin(areas, axis=1)  # [K]

    def pick(a):
        return jnp.take_along_axis(a, best[:, None], axis=1)[:, 0]

    bx0, bx1, by0, by1 = pick(x0), pick(x1), pick(y0), pick(y1)
    bc, bs = c[best], s[best]
    u_vec = jnp.stack([bc, bs], axis=1)  # [K, 2]
    v_vec = jnp.stack([-bs, bc], axis=1)

    # corners in rotated frame (clockwise with y-down): (x0,y0) (x1,y0)
    # (x1,y1) (x0,y1) mapped back through u, v
    cx = jnp.stack([bx0, bx1, bx1, bx0], axis=1)  # [K, 4]
    cy = jnp.stack([by0, by0, by1, by1], axis=1)
    corners = cx[..., None] * u_vec[:, None, :] + cy[..., None] * v_vec[:, None, :]

    # square-box special case (det_utils.py:79-84): near-square rects are
    # replaced by the axis-aligned bbox of the dilated points.
    side_w = bx1 - bx0
    side_h = by1 - by0
    ratio = jnp.maximum(side_w, side_h) / (jnp.minimum(side_w, side_h) + 1e-5)
    is_square = jnp.abs(1.0 - ratio) <= 0.1
    # axis-aligned extents of dilated geometry = theta=0 supports +/- he
    g_minx = ux_min[:, 0] - he + shift
    g_maxx = ux_max[:, 0] + he + shift
    g_miny = uy_min[:, 0] - he + shift
    g_maxy = uy_max[:, 0] + he + shift
    sq = jnp.stack(
        [
            jnp.stack([g_minx, g_miny], 1),
            jnp.stack([g_maxx, g_miny], 1),
            jnp.stack([g_maxx, g_maxy], 1),
            jnp.stack([g_minx, g_maxy], 1),
        ],
        axis=1,
    )  # [K, 4, 2]
    corners = jnp.where(is_square[:, None, None], sq, corners)

    # clip to the score-map bounds (the reference's dilation window is
    # clipped to the image, det_utils.py:66-69)
    corners = jnp.stack(
        [
            jnp.clip(corners[..., 0], 0.0, W - 1.0),
            jnp.clip(corners[..., 1], 0.0, H - 1.0),
        ],
        axis=-1,
    )

    # clockwise order starting at the corner with min x+y (det_utils.py:87-88)
    start = jnp.argmin(corners.sum(-1), axis=1)  # [K]
    roll_idx = (jnp.arange(4)[None, :] + start[:, None]) % 4
    corners = jnp.take_along_axis(corners, roll_idx[..., None], axis=1)

    corners = jnp.where(valid[:, None, None], corners, 0.0)
    return DetBoxes(
        boxes=corners, valid=valid, labels=labels, cid=cid.reshape(H, W)
    )


def boxes_to_rects(boxes: jax.Array, valid: jax.Array,
                   ratio_w: float, ratio_h: float) -> jax.Array:
    """Boxes -> axis-aligned [K, 4] rects (y0, x0, y1, x1) in original-image
    coordinates, mirroring ``adjustResultCoordinates`` x2 net ratio
    (``det_utils.py:259-265``) + the min/max reduction of ``net.py:93-97``
    (whose variable names swap x/y; the slicing is row-major, so the rect
    layout here is (row0, col0, row1, col1))."""
    scaled = boxes * jnp.asarray(
        [ratio_w * 2.0, ratio_h * 2.0], jnp.float32
    )
    as_int = scaled.astype(jnp.int32)
    x0 = jnp.min(as_int[..., 0], axis=1)
    y0 = jnp.min(as_int[..., 1], axis=1)
    x1 = jnp.max(as_int[..., 0], axis=1)
    y1 = jnp.max(as_int[..., 1], axis=1)
    rects = jnp.stack([y0, x0, y1, x1], axis=1)
    return jnp.where(valid[:, None], rects, 0)


__all__ = ["DetBoxes", "get_det_boxes", "boxes_to_rects", "label_components"]
