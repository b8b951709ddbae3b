"""Polygon refinement for curved text (the ``enable_poly`` path).

Host-side counterpart of ``ocr/tools/det_utils.py:97-245`` (``poly_core``)
— disabled by default in the reference (``net.py:50``) and here, but kept
for feature parity.  The reference leans on cv2 (getPerspectiveTransform,
warpPerspective, line); this is dependency-free numpy: the 4-point
homography is solved directly, the label patch is warped by inverse
nearest-neighbor mapping, and the edge-search "line draw" is a dense
sample along the segment.

Geometry reproduced: per box, scan warped columns for top/bottom label
contours; reject if the max contour height is close to the box height
(``max_len_ratio`` 0.7); pick 5 pivot points from 11 segments; expand by
``expand_ratio`` 1.45 around the local gradient; search outward (r in
[0.5, 2.0) step 0.2) for start/end edges clear of the label; unwarp the
14-point polygon.
"""
from __future__ import annotations

import math

import numpy as np

NUM_CP = 5
MAX_LEN_RATIO = 0.7
EXPAND_RATIO = 1.45
MAX_R = 2.0
STEP_R = 0.2


def perspective_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3x3 homography mapping 4 src points onto 4 dst points
    (cv2.getPerspectiveTransform equivalent, direct 8x8 solve)."""
    A, b = [], []
    for (x, y), (u, v) in zip(src, dst):
        A.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
        A.append([0, 0, 0, x, y, 1, -v * x, -v * y])
        b += [u, v]
    h = np.linalg.solve(np.asarray(A, np.float64), np.asarray(b, np.float64))
    return np.append(h, 1.0).reshape(3, 3)


def warp_nearest(labels: np.ndarray, M: np.ndarray, w: int, h: int) -> np.ndarray:
    """Inverse-map nearest warp of an int label image to (h, w)."""
    Minv = np.linalg.inv(M)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    ones = np.ones_like(xs)
    pts = np.stack([xs, ys, ones], axis=0).reshape(3, -1)
    src = Minv @ pts
    sx = np.round(src[0] / src[2]).astype(np.int64)
    sy = np.round(src[1] / src[2]).astype(np.int64)
    ok = (sx >= 0) & (sx < labels.shape[1]) & (sy >= 0) & (sy < labels.shape[0])
    out = np.zeros(h * w, labels.dtype)
    out[ok.reshape(-1)] = labels[sy.reshape(-1)[ok.reshape(-1)],
                                 sx.reshape(-1)[ok.reshape(-1)]]
    return out.reshape(h, w)


def _warp_coord(Minv: np.ndarray, pt) -> np.ndarray:
    v = Minv @ np.asarray([pt[0], pt[1], 1.0])
    return np.asarray([v[0] / v[2], v[1] / v[2]])


def _segment_hits_label(word_label: np.ndarray, p) -> bool:
    """Dense sampling along segment (p[0],p[1])-(p[2],p[3]) (the cv2.line
    + logical_and test, det_utils.py:208-222)."""
    n = int(max(abs(p[2] - p[0]), abs(p[3] - p[1]))) * 2 + 2
    xs = np.round(np.linspace(p[0], p[2], n)).astype(np.int64)
    ys = np.round(np.linspace(p[1], p[3], n)).astype(np.int64)
    ok = (xs >= 0) & (xs < word_label.shape[1]) & \
         (ys >= 0) & (ys < word_label.shape[0])
    if not ok.any():
        return False
    return bool(word_label[ys[ok], xs[ok]].any())


def refine_polygon(box: np.ndarray, labels: np.ndarray,
                   component_id: int) -> np.ndarray | None:
    """One box -> refined polygon [14, 2] or None (fall back to the box)."""
    w = int(np.linalg.norm(box[0] - box[1]) + 1)
    h = int(np.linalg.norm(box[1] - box[2]) + 1)
    if w < 10 or h < 10:
        return None

    tar = np.asarray([[0, 0], [w, 0], [w, h], [0, h]], np.float64)
    try:
        M = perspective_transform(np.asarray(box, np.float64), tar)
        Minv = np.linalg.inv(M)
    except np.linalg.LinAlgError:
        return None
    word_label = warp_nearest(labels, M, w, h)
    word_label = (word_label == component_id).astype(np.uint8)

    # column contours
    cp = []
    max_len = -1
    for i in range(w):
        region = np.flatnonzero(word_label[:, i])
        if len(region) < 2:
            continue
        cp.append((i, int(region[0]), int(region[-1])))
        max_len = max(max_len, int(region[-1]) - int(region[0]) + 1)
    if h * MAX_LEN_RATIO < max_len:
        return None

    # pivot points over 2*NUM_CP+1 segments
    tot_seg = NUM_CP * 2 + 1
    seg_w = w / tot_seg
    pp = [None] * NUM_CP
    cp_section = [[0.0, 0.0] for _ in range(tot_seg)]
    seg_height = [0] * NUM_CP
    seg_num = 0
    num_sec = 0
    prev_h = -1
    for (x, sy, ey) in cp:
        if (seg_num + 1) * seg_w <= x and seg_num <= tot_seg:
            if num_sec == 0:
                break
            cp_section[seg_num] = [
                cp_section[seg_num][0] / num_sec,
                cp_section[seg_num][1] / num_sec,
            ]
            num_sec = 0
            seg_num += 1
            prev_h = -1
        cy = (sy + ey) * 0.5
        cur_h = ey - sy + 1
        cp_section[seg_num] = [
            cp_section[seg_num][0] + x,
            cp_section[seg_num][1] + cy,
        ]
        num_sec += 1
        if seg_num % 2 == 0:
            continue
        if prev_h < cur_h:
            pp[(seg_num - 1) // 2] = (x, cy)
            seg_height[(seg_num - 1) // 2] = cur_h
            prev_h = cur_h
    if num_sec != 0:
        cp_section[-1] = [
            cp_section[-1][0] / num_sec,
            cp_section[-1][1] / num_sec,
        ]
    if any(p is None for p in pp) or seg_w < np.max(seg_height) * 0.25:
        return None

    half_char_h = float(np.median(seg_height)) * EXPAND_RATIO / 2.0

    new_pp = []
    for i, (x, cy) in enumerate(pp):
        dx = cp_section[i * 2 + 2][0] - cp_section[i * 2][0]
        dy = cp_section[i * 2 + 2][1] - cp_section[i * 2][1]
        if dx == 0:
            new_pp.append([x, cy - half_char_h, x, cy + half_char_h])
            continue
        rad = -math.atan2(dy, dx)
        c = half_char_h * math.cos(rad)
        s = half_char_h * math.sin(rad)
        new_pp.append([x - s, cy - c, x + s, cy + c])

    spp = epp = None
    grad_s = (pp[1][1] - pp[0][1]) / (pp[1][0] - pp[0][0]) + \
             (pp[2][1] - pp[1][1]) / (pp[2][0] - pp[1][0])
    grad_e = (pp[-2][1] - pp[-1][1]) / (pp[-2][0] - pp[-1][0]) + \
             (pp[-3][1] - pp[-2][1]) / (pp[-3][0] - pp[-2][0])
    for r in np.arange(0.5, MAX_R, STEP_R):
        dx = 2 * half_char_h * r
        last_chance = r + 2 * STEP_R >= MAX_R
        if spp is None:
            dy = grad_s * dx
            p = np.asarray(new_pp[0]) - np.asarray([dx, dy, dx, dy])
            if not _segment_hits_label(word_label, p) or last_chance:
                spp = p
        if epp is None:
            dy = grad_e * dx
            p = np.asarray(new_pp[-1]) + np.asarray([dx, dy, dx, dy])
            if not _segment_hits_label(word_label, p) or last_chance:
                epp = p
        if spp is not None and epp is not None:
            break
    if spp is None or epp is None:
        return None

    poly = [_warp_coord(Minv, (spp[0], spp[1]))]
    poly += [_warp_coord(Minv, (p[0], p[1])) for p in new_pp]
    poly.append(_warp_coord(Minv, (epp[0], epp[1])))
    poly.append(_warp_coord(Minv, (epp[2], epp[3])))
    poly += [_warp_coord(Minv, (p[2], p[3])) for p in reversed(new_pp)]
    poly.append(_warp_coord(Minv, (spp[2], spp[3])))
    return np.asarray(poly)


def refine_polygons(boxes: np.ndarray, valid: np.ndarray,
                    labels: np.ndarray, cid: np.ndarray) -> list:
    """Batch helper over DetBoxes outputs: list of polygon|None per valid
    box (None = keep the rectangle, as the reference does)."""
    out = []
    for k in np.nonzero(np.asarray(valid))[0]:
        comp_mask_ids = np.asarray(cid)
        # the component's label value in the cid map is k itself
        out.append(refine_polygon(np.asarray(boxes)[k], comp_mask_ids, int(k)))
    return out
