"""Independent numpy (float64) reference rasterizer for golden-image tests.

Deliberately written as a straightforward per-pixel evaluation — a separate
derivation from the Pallas kernel's plane-equation form — so the two
implementations cross-check each other. Mirrors Vulkan rules: pixel centers
at +0.5, y-down viewport, depth in [0,1], CW front / back cull, depth LESS.
"""

from __future__ import annotations

import numpy as np


def viewport(clip, width, height):
    w = clip[..., 3:4]
    ndc = clip[..., :3] / w
    x = (ndc[..., 0] + 1) * 0.5 * width
    y = (ndc[..., 1] + 1) * 0.5 * height
    return np.stack([x, y], -1), ndc[..., 2], 1.0 / w[..., 0]


def clip_triangles_near(clip, indices, values):
    """Float64 Sutherland–Hodgman clip of indexed triangles against the
    near plane z_clip = 0 (an independent derivation from the kernel's
    canonical-rotation split). Returns (clip (M,3,4), values (M,3,K),
    indices (M,3)) with per-corner attributes lerped homogeneously."""
    clip = np.asarray(clip, np.float64)
    values = np.asarray(values, np.float64)
    out_c, out_v = [], []
    for tri in np.asarray(indices):
        poly = [(clip[i], values[i]) for i in tri]
        res = []
        for j in range(len(poly)):
            cur_c, cur_v = poly[j]
            prv_c, prv_v = poly[j - 1]
            cin, pin = cur_c[2] >= 0, prv_c[2] >= 0
            if cin != pin:
                t = prv_c[2] / (prv_c[2] - cur_c[2])
                res.append((prv_c + t * (cur_c - prv_c),
                            prv_v + t * (cur_v - prv_v)))
            if cin:
                res.append((cur_c, cur_v))
        for k in range(1, len(res) - 1):   # fan-triangulate
            out_c.append([res[0][0], res[k][0], res[k + 1][0]])
            out_v.append([res[0][1], res[k][1], res[k + 1][1]])
    if not out_c:
        return (np.zeros((0, 3, 4)), np.zeros((0, 3) + values.shape[1:]),
                np.zeros((0, 3), np.int64))
    m = len(out_c)
    return (np.asarray(out_c), np.asarray(out_v),
            np.arange(3 * m).reshape(m, 3))


def rasterize_reference(clip, indices, width, height,
                        cull="back", front="cw", depth_test=True,
                        init_depth=None):
    """Returns (depth (H,W), tri (H,W) int, bary (H,W,3) float64)."""
    clip = np.asarray(clip, np.float64)
    tri = clip[indices]                    # (T,3,4)
    xy, z, inv_w = viewport(tri, width, height)
    T = tri.shape[0]

    ys, xs = np.mgrid[0:height, 0:width]
    px = xs + 0.5
    py = ys + 0.5

    depth = (np.full((height, width), np.inf) if init_depth is None
             else np.asarray(init_depth, np.float64).copy())
    if not depth_test:
        depth = np.full((height, width), np.inf)
    tri_id = np.full((height, width), -1, np.int64)
    bary = np.zeros((height, width, 3))

    for t in range(T):
        (x0, y0), (x1, y1), (x2, y2) = xy[t]
        area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        sign = 1.0 if front == "cw" else -1.0
        if cull == "back" and not (area2 * sign > 0):
            continue
        if cull == "front" and not (area2 * sign < 0):
            continue
        if abs(area2) < 1e-12 or np.any(tri[t, :, 3] <= 1e-6):
            continue
        l0 = ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) / area2
        l1 = ((x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)) / area2
        l2 = 1.0 - l0 - l1
        zp = l0 * z[t, 0] + l1 * z[t, 1] + l2 * z[t, 2]
        cov = (l0 >= 0) & (l1 >= 0) & (l2 >= 0) & (zp >= 0) & (zp <= 1)
        if depth_test:
            win = cov & (zp < depth)
        else:
            win = cov  # draw order: later triangles overwrite
        depth = np.where(win, zp, depth)
        tri_id = np.where(win, t, tri_id)
        for i, l in enumerate((l0, l1, l2)):
            bary[..., i] = np.where(win, l, bary[..., i])
    return depth, tri_id, bary, inv_w


def interpolate(values, indices, tri_id, bary, inv_w):
    """Perspective-correct interpolation of per-vertex values (N,K)."""
    tv = np.asarray(values, np.float64)[indices]    # (T,3,K)
    t = np.maximum(tri_id, 0)
    iw = inv_w[t]                                   # (H,W,3)
    lp = bary * iw
    lp /= np.maximum(lp.sum(-1, keepdims=True), 1e-300)
    return np.einsum("hwi,hwik->hwk", lp, tv[t])


def sample_bilinear(tex, uv, mode="mirrored_repeat"):
    """Numpy bilinear sampler matching ops/sampling.py semantics."""
    h, w = tex.shape[:2]
    u = uv[..., 0] * w - 0.5
    v = uv[..., 1] * h - 0.5
    x0 = np.floor(u).astype(np.int64)
    y0 = np.floor(v).astype(np.int64)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]

    def wrap(i, n):
        if mode == "repeat":
            return np.mod(i, n)
        if mode == "mirrored_repeat":
            m = np.mod(i, 2 * n)
            return np.where(m >= n, 2 * n - 1 - m, m)
        return np.clip(i, 0, n - 1)

    x0w, x1w = wrap(x0, w), wrap(x0 + 1, w)
    y0w, y1w = wrap(y0, h), wrap(y0 + 1, h)
    t00, t10 = tex[y0w, x0w], tex[y0w, x1w]
    t01, t11 = tex[y1w, x0w], tex[y1w, x1w]
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy
