"""Literal, sequential numpy rasterizer — the ground-truth micro-oracle.

Implements exactly the per-Gaussian / per-pixel semantics of the reference
CUDA rasterizer (forward.cu preprocess + blend, with per-tile binning and the
depth sort of rasterizer_impl.cu), as straightforward Python loops.  Slow —
only used on tiny scenes to anchor the JAX oracle, which in turn anchors the
production Pallas path.
"""
import math

import numpy as np

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396]
SH_C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435]


def quat_to_R(q):
    r, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
    ])


def eval_sh_np(deg, sh, d):
    res = SH_C0 * sh[0]
    if deg > 0:
        x, y, z = d
        res = res - SH_C1 * y * sh[1] + SH_C1 * z * sh[2] - SH_C1 * x * sh[3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            res = (res + SH_C2[0] * xy * sh[4] + SH_C2[1] * yz * sh[5]
                   + SH_C2[2] * (2 * zz - xx - yy) * sh[6]
                   + SH_C2[3] * xz * sh[7] + SH_C2[4] * (xx - yy) * sh[8])
            if deg > 2:
                res = (res + SH_C3[0] * y * (3 * xx - yy) * sh[9]
                       + SH_C3[1] * xy * z * sh[10]
                       + SH_C3[2] * y * (4 * zz - xx - yy) * sh[11]
                       + SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[12]
                       + SH_C3[4] * x * (4 * zz - xx - yy) * sh[13]
                       + SH_C3[5] * z * (xx - yy) * sh[14]
                       + SH_C3[6] * x * (xx - 3 * yy) * sh[15])
    return res


def render_np(
    xyz, shs, log_scale, quat_raw, opacity_logit,
    viewmat, projmat, campos, tanfovx, tanfovy, W, H, deg, bg,
    tile=16,
):
    """Returns dict with render (3,H,W), depth (H,W), final_T, acc, radii."""
    P = xyz.shape[0]
    focal_x = W / (2 * tanfovx)
    focal_y = H / (2 * tanfovy)
    grid_x = (W + tile - 1) // tile
    grid_y = (H + tile - 1) // tile

    # per-gaussian preprocess
    g = []
    radii = np.zeros(P, dtype=np.int32)
    for i in range(P):
        p = xyz[i]
        p_view = viewmat[:3, :3] @ p + viewmat[:3, 3]
        if p_view[2] <= 0.2:
            continue
        ph = projmat @ np.append(p, 1.0)
        pw = 1.0 / (ph[3] + 1e-7)
        ndc = ph[:3] * pw
        px = ((ndc[0] + 1) * W - 1) * 0.5
        py = ((ndc[1] + 1) * H - 1) * 0.5

        S = np.exp(log_scale[i])
        q = quat_raw[i] / np.linalg.norm(quat_raw[i])
        R = quat_to_R(q)
        M = R @ np.diag(S)
        Sigma = M @ M.T

        Wr = viewmat[:3, :3]
        t = p_view.copy()
        limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
        t[0] = min(limx, max(-limx, t[0] / t[2])) * t[2]
        t[1] = min(limy, max(-limy, t[1] / t[2])) * t[2]
        J = np.array([
            [focal_x / t[2], 0, -focal_x * t[0] / t[2] ** 2],
            [0, focal_y / t[2], -focal_y * t[1] / t[2] ** 2],
        ])
        cov2d = J @ Wr @ Sigma @ Wr.T @ J.T
        cov2d[0, 0] += 0.3
        cov2d[1, 1] += 0.3
        det = cov2d[0, 0] * cov2d[1, 1] - cov2d[0, 1] ** 2
        if det == 0:
            continue
        conic = np.array([cov2d[1, 1], -cov2d[0, 1], cov2d[0, 0]]) / det
        mid = 0.5 * (cov2d[0, 0] + cov2d[1, 1])
        lam = mid + math.sqrt(max(0.1, mid * mid - det))
        radius = math.ceil(3 * math.sqrt(lam))
        rminx = min(grid_x, max(0, int((px - radius) / tile)))
        rminy = min(grid_y, max(0, int((py - radius) / tile)))
        rmaxx = min(grid_x, max(0, int((px + radius + tile - 1) / tile)))
        rmaxy = min(grid_y, max(0, int((py + radius + tile - 1) / tile)))
        if (rmaxx - rminx) * (rmaxy - rminy) == 0:
            continue

        d = p - campos
        d = d / np.linalg.norm(d)
        rgb = np.maximum(eval_sh_np(deg, shs[i], d) + 0.5, 0.0)

        op = 1.0 / (1.0 + np.exp(-opacity_logit[i]))
        radii[i] = radius
        g.append(dict(i=i, px=px, py=py, conic=conic, rgb=rgb, op=float(op),
                      depth=p_view[2], rect=(rminx, rminy, rmaxx, rmaxy)))

    # per-tile depth-sorted lists (stable: ties by insertion order = index)
    tiles = {}
    for gg in sorted(g, key=lambda v: v["depth"]):
        rminx, rminy, rmaxx, rmaxy = gg["rect"]
        for ty in range(rminy, rmaxy):
            for tx in range(rminx, rmaxx):
                tiles.setdefault((tx, ty), []).append(gg)

    out = np.zeros((3, H, W))
    out_d = np.zeros((H, W))
    final_T = np.ones((H, W))
    accs = np.full((H, W), 1e-6)
    for py_i in range(H):
        for px_i in range(W):
            lst = tiles.get((px_i // tile, py_i // tile), [])
            T = 1.0
            C = np.zeros(3)
            D = 0.0
            acc = 1e-6
            for gg in lst:
                dx = gg["px"] - px_i
                dy = gg["py"] - py_i
                a, b, c = gg["conic"]
                power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
                if power > 0:
                    continue
                alpha = min(0.99, gg["op"] * math.exp(power))
                if alpha < 1.0 / 255.0:
                    continue
                test_T = T * (1 - alpha)
                if test_T < 1e-4:
                    break
                C += gg["rgb"] * alpha * T
                D += gg["depth"] * alpha * T
                acc += alpha * T
                T = test_T
            out[:, py_i, px_i] = C + T * bg
            out_d[py_i, px_i] = D / acc if acc > 0.5 else 0.0
            final_T[py_i, px_i] = T
            accs[py_i, px_i] = acc
    return {"render": out, "depth": out_d, "final_T": final_T, "acc": accs,
            "radii": radii}
