"""Slow numpy oracles mirroring the reference semantics for testing.

These re-implement, in plain Python/numpy, the behavior of:
* the CUDA window gathers (tf_ops/2d_conv_{random,select}_k/fused_conv_g.cu)
* the cylindrical projection (model_util.py:181-292)

They exist only to validate the vectorized JAX/Pallas implementations.
"""

import math

import numpy as np


def oracle_window_select(
    xyz1, xyz2, centers_hw, kernel_size, k, distance, stride=(1, 1), mode="knn", perm=None
):
    """Direct transliteration of the CUDA scan loops (per center).

    Returns idx (B, N, K) flat into H2*W2 and mask (B, N, K).
    """
    b, h1, w1, _ = xyz1.shape
    _, h2, w2, _ = xyz2.shape
    kh, kw = kernel_size
    t = kh * kw
    sh, sw = stride
    if perm is None:
        perm = np.arange(t)

    n = centers_hw.shape[0]
    idx_out = np.zeros((b, n, k), dtype=np.int64)
    mask_out = np.zeros((b, n, k), dtype=np.float32)

    for bi in range(b):
        for ni in range(n):
            ch, cw = centers_hw[ni]
            c = xyz1[bi, ch, cw]
            if float(np.dot(c, c)) <= 1e-10:
                continue
            cands = []  # (scan_position, dist_sq, flat_idx)
            for pos in range(t):
                khw = perm[pos]
                hh = ch // sh + khw // kw - kh // 2
                ww = cw // sw + khw % kw - kw // 2
                if hh < 0 or hh >= h2:
                    continue
                ww = ww % w2
                q = xyz2[bi, hh, ww]
                if float(np.dot(q, q)) <= 1e-10:
                    continue
                d = max(float(np.dot(c - q, c - q)), 1e-10)
                if d > distance * distance:
                    continue
                cands.append((pos, d, hh * w2 + ww))
            if mode == "first_k":
                chosen = cands[:k]
            else:
                chosen = sorted(cands, key=lambda c: c[1])[:k]
            for s, (_, _, flat) in enumerate(chosen):
                idx_out[bi, ni, s] = flat
                mask_out[bi, ni, s] = 1.0
    return idx_out, mask_out


def oracle_project(points, features, height, width, sensor):
    """Min-range cylindrical projection for a single cloud (N, 3)."""
    az_res = 2 * math.pi / width
    up = sensor.vertical_fov_up_deg * math.pi / 180
    down = sensor.vertical_fov_down_deg * math.pi / 180
    v_res = (up - down) / (height - 1)
    v_off = -down / v_res

    img = np.zeros((height, width, 3), dtype=np.float64)
    fimg = (
        np.zeros((height, width, features.shape[-1]), dtype=np.float64)
        if features is not None
        else None
    )
    best_r = np.full((height, width), np.inf)
    for i, p in enumerate(points):
        r = float(np.linalg.norm(p))
        if r * r <= 1e-10:
            continue
        col = int((math.pi - math.atan2(p[1], p[0])) / az_res)
        beta = math.asin(max(-1.0, min(1.0, p[2] / r)))
        row = height - int(beta / v_res + v_off)
        row = min(max(row, 0), height - 1)
        col = min(max(col, 0), width - 1)
        if r < best_r[row, col]:
            best_r[row, col] = r
            img[row, col] = p
            if fimg is not None:
                fimg[row, col] = features[i]
    return img, fimg
