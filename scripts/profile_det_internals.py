"""Micro-profile of get_det_boxes internals at B=8, 512x384 maps.

nohup python scripts/profile_det_internals.py > /tmp/prof_det.log 2>&1 &
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fetch(x):
    import jax.numpy as jnp

    if isinstance(x, (tuple, list)):
        x = x[0]
    return float(jnp.sum(jnp.ravel(x)[:16].astype(jnp.float32)))


def timeit(tag, fn, *args, n=5):
    t0 = time.perf_counter()
    fetch(fn(*args))
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{tag:52s} med {med*1e3:8.2f} ms (compile {tc:5.1f}s)", flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp

    B, H, W = 8, 512, 384
    HW = H * W
    K = 32
    K2 = 64
    D = 128
    rng = np.random.default_rng(0)

    # synthetic label field with ~40 blobs per image
    tmap = rng.random((B, H, W)).astype(np.float32) * 0.3
    for b in range(B):
        for _ in range(40):
            r, c = rng.integers(20, H - 40), rng.integers(20, W - 60)
            tmap[b, r : r + 14, c : c + 48] = 0.9
    tmap = jnp.asarray(tmap)
    fg = tmap > 0.4

    from lightly_ocr_tpu.ops.pallas_cc import label_components_pallas

    labels = jax.jit(lambda m: label_components_pallas(m, rounds=6))(fg)
    labels = jnp.where(fg, labels, jnp.int32(HW))
    flat_labels = labels.reshape(B, HW)
    lin = jnp.arange(HW, dtype=jnp.int32)

    # 1) candidate root selection: top_k vs sort vs approx
    def cand_topk(fl):
        roots = fl == lin[None]
        return -jax.lax.top_k(jnp.where(roots, -fl, -(2**30)), K2)[0]

    timeit("cand: top_k [B,HW] k=64", jax.jit(cand_topk), flat_labels)

    def cand_sort(fl):
        roots = fl == lin[None]
        vals = jnp.where(roots, fl, 2**30)
        return jax.lax.sort(vals, dimension=1)[:, :K2]

    timeit("cand: full sort take-first", jax.jit(cand_sort), flat_labels)

    def cand_blocked(fl):
        # exact two-level: block-wise compaction then top_k over blocks
        nblk = 384  # HW/512
        roots = (fl == lin[None]).reshape(B, nblk, HW // nblk)
        vals = jnp.where(roots, fl.reshape(B, nblk, -1), 2**30)
        # per block: sort 512 -> first 64
        blk = jax.lax.sort(vals, dimension=2)[:, :, :K2].reshape(B, -1)
        return jax.lax.sort(blk, dimension=1)[:, :K2]

    timeit("cand: blocked sort (512-blocks)", jax.jit(cand_blocked), flat_labels)

    cand = jax.jit(cand_topk)(flat_labels)

    # 2) searchsorted pixel -> candidate id
    def cid_fn(fl, cd):
        c1 = jnp.clip(
            jax.vmap(jnp.searchsorted)(cd, fl), 0, K2 - 1
        )
        return jnp.where(
            jnp.take_along_axis(cd, c1, axis=1) == fl, c1, K2
        )

    timeit("cid: searchsorted + verify", jax.jit(cid_fn), flat_labels, cand)
    cid1 = jax.jit(cid_fn)(flat_labels, cand)

    # 3) current stats pass (5 flat masked reductions over [K2, HW])
    cols_f = jnp.tile(jnp.arange(W, dtype=jnp.float32), (H,))
    rows_f = jnp.repeat(jnp.arange(H, dtype=jnp.float32), W)
    tflat = tmap.reshape(B, HW)

    def stats_flat(c1, tf):
        def per_image(ci, tfi):
            m = ci[None, :] == jnp.arange(K2, dtype=jnp.int32)[:, None]
            area = jnp.sum(m, axis=1).astype(jnp.float32)
            peak = jnp.max(jnp.where(m, tfi[None], -1e30), axis=1)
            maxx = jnp.max(jnp.where(m, cols_f[None], -1e30), axis=1)
            minx = jnp.min(jnp.where(m, cols_f[None], 1e30), axis=1)
            maxy = jnp.max(jnp.where(m, rows_f[None], -1e30), axis=1)
            return area, peak, maxx, minx, maxy

        return jax.vmap(per_image)(c1, tf)

    timeit("stats: flat masked [K2,HW] x5", jax.jit(stats_flat), cid1, tflat)

    # 4) current rowext pass ([K, H, W] masked min/max)
    cid2d = cid1.reshape(B, H, W)
    cols2d = jnp.arange(W, dtype=jnp.float32)[None, :] * jnp.ones((H, 1))

    def rowext(c2):
        def per_image(ci):
            m = ci[None] == jnp.arange(K, dtype=jnp.int32)[:, None, None]
            rx = jnp.max(jnp.where(m, cols2d[None], -1e30), axis=2)
            lx = jnp.min(jnp.where(m, cols2d[None], 1e30), axis=2)
            return lx, rx

        return jax.vmap(per_image)(c2)

    timeit("rowext: masked [K,H,W] minmax", jax.jit(rowext), cid2d)

    # 5) merged per-row pass: count/texthigh/lx/rx in ONE [K2,H,W] sweep
    thigh = (tmap > 0.7).astype(jnp.float32)

    def merged_row(c2, th):
        def per_image(ci, thi):
            ks = jnp.arange(K2, dtype=jnp.int32)
            m = ci[None] == ks[:, None, None]  # [K2, H, W]
            cnt = jnp.sum(m, axis=2).astype(jnp.float32)  # [K2, H]
            hot = jnp.max(jnp.where(m, thi[None], 0.0), axis=2)
            rx = jnp.max(jnp.where(m, cols2d[None], -1e30), axis=2)
            lx = jnp.min(jnp.where(m, cols2d[None], 1e30), axis=2)
            return cnt, hot, lx, rx

        return jax.vmap(per_image)(c2, th)

    timeit("merged row pass [K2,H,W] x4", jax.jit(merged_row), cid2d, thigh)

    # 6) one-hot MXU matmul for count/hot per row
    def matmul_row(c2, th):
        def per_image(ci, thi):
            oh = jax.nn.one_hot(ci, K2, dtype=jnp.bfloat16)  # [H, W, K2]
            cnt = jnp.einsum(
                "hwk,hw->hk", oh, jnp.ones((H, W), jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            hot = jnp.einsum(
                "hwk,hw->hk", oh, thi.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return cnt, hot

        return jax.vmap(per_image)(c2, th)

    timeit("onehot matmul rows (cnt,hot)", jax.jit(matmul_row), cid2d, thigh)

    # 7) angle sweep (current form)
    lx = jnp.asarray(rng.random((B, K, H)).astype(np.float32))
    rx = lx + 5.0
    yv = jnp.arange(H, dtype=jnp.float32)[None, None, :, None]
    theta = jnp.arange(D, dtype=jnp.float32) * (np.pi / 2 / D)
    c, s = jnp.cos(theta), jnp.sin(theta)

    def sweep(lxv, rxv):
        lx_ = lxv[..., None]
        rx_ = rxv[..., None]
        ux_min = jnp.min(lx_ * c + yv * s, axis=2)
        ux_max = jnp.max(rx_ * c + yv * s, axis=2)
        uy_min = jnp.min(-rx_ * s + yv * c, axis=2)
        uy_max = jnp.max(-lx_ * s + yv * c, axis=2)
        return ux_min, ux_max, uy_min, uy_max

    timeit("angle sweep [B,K,H,D]", jax.jit(sweep), lx, rx)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
