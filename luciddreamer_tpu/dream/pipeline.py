"""The "dreaming" loop: lift a single image to a 3D point cloud by
iterative warp -> inpaint -> depth-lift, then build the traindata dict.

JAX re-architecture of LucidDreamer.generate_pcd (luciddreamer.py:329-573).
Host python drives the per-view loop (each view calls the external
inpaint/depth models anyway); all geometry ops (projection, splatting,
mask morphology, depth alignment, border compensation) are jitted JAX.

Reference quirks handled deliberately:
* the reference's per-view depth-scale optimization is a silent NO-OP —
  ``torch.tensor([[sc, ...]])`` detaches ``sc`` from the graph, so its Adam
  loop (luciddreamer.py:425-440) never updates sc and the scale stays 1.0.
  ``align="reference"`` reproduces that; the default ``align="closed_form"``
  solves the same least-squares problem exactly (it is linear in sc).
* scipy griddata -> forward splat + neighbor fill (see dream/warp.py);
* the border-depth compensation's scattered interpolation (linear with
  nearest fallback, luciddreamer.py:478-480) -> k-NN inverse-distance
  weighting on device.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.config import CameraConfig
from luciddreamer_tpu.dream import warp
from luciddreamer_tpu.dream.protocols import (
    get_depth_estimator,
    get_inpainter,
)
from luciddreamer_tpu.trajectory import get_pcdgen_poses, w2c_pose_to_c2w

ANCHOR_CAP = 8192      # static capacity for border-compensation anchors


@dataclasses.dataclass
class DreamConfig:
    inpainter: str = "classic"
    depth_estimator: str = "radial"
    model_name: str | None = None  # SD checkpoint (HF id / diffusers dir)
    #                                for sd / sd_controlnet backends
    #                                (reference run.py:17, --model_name)
    align: str = "closed_form"     # "closed_form" | "adam" | "reference"
    fill_iters: int = 8
    store_frame_depth: bool = True  # extra vs reference: keep warped depth
    #                                 so training can use the real depth loss


def _to_image01(rgb_cond) -> np.ndarray:
    arr = np.asarray(rgb_cond)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    return np.clip(arr.astype(np.float32), 0.0, 1.0)


def _condition_input(image01, cam: CameraConfig, inpainter, prompt,
                     negative_prompt, steps, rng):
    """Center-crop or outpaint the conditioning image to HxW
    (luciddreamer.py:333-353)."""
    h_in, w_in = image01.shape[:2]
    H, W = cam.image_height, cam.image_width
    from PIL import Image

    if w_in / h_in > 1.1 or h_in / w_in > 1.1:
        # aspect far from square: paste on a square canvas, outpaint borders
        res = max(w_in, h_in)
        canvas = np.zeros((res, res, 3), np.float32)
        mask = np.ones((res, res), np.float32)
        y0 = int(res / 2 - h_in / 2)
        x0 = int(res / 2 - w_in / 2)
        canvas[y0 : y0 + h_in, x0 : x0 + w_in] = image01
        mask[y0 : y0 + h_in, x0 : x0 + w_in] = 0.0
        canvas = np.asarray(
            Image.fromarray((canvas * 255).astype(np.uint8)).resize((W, H))
        ).astype(np.float32) / 255.0
        mask = np.asarray(
            Image.fromarray((mask * 255).astype(np.uint8)).resize((W, H))
        ).astype(np.float32) / 255.0
        out = inpainter(canvas, mask, prompt, negative_prompt, steps, rng)
        return np.asarray(out)
    # nearly square: center crop + resize
    if w_in > h_in:
        crop = image01[:, int(w_in / 2 - h_in / 2) : int(w_in / 2 + h_in / 2)]
    else:
        crop = image01[int(h_in / 2 - w_in / 2) : int(h_in / 2 + w_in / 2), :]
    return np.asarray(
        Image.fromarray((crop * 255).astype(np.uint8)).resize((W, H))
    ).astype(np.float32) / 255.0


@functools.partial(jax.jit, static_argnames=("H", "W", "fill_iters"))
def _warp_view(points, colors, pt_valid, K, R, T, H, W, fill_iters):
    """Project the cloud into (R, T); splat color (and depth) images and the
    mask pipeline (one dreamed/aligned view's geometry, luciddreamer.py:386-409)."""
    pix, z, valid = warp.project(points, K, R, T, H, W)
    valid = valid & pt_valid
    img, _ = warp.splat_linear(pix, colors, valid, H, W, fill_iters)
    img = warp.edge_blend(img)
    image2, mask2 = warp.warp_masks(pix, valid, img, H, W)
    dimg, _ = warp.splat_linear(pix, z[:, None], valid, H, W, fill_iters)
    depth2 = warp.edge_blend(dimg)[:, :, 0]
    mask_hf = warp.border_mask(mask2)
    return image2, mask2, depth2, mask_hf, pix, z, valid


def _align_scale(mode, points, pix, valid, depth, K, R, T):
    """Depth-scale factor sc minimizing ||pcd - sc * unproject(depth)||^2
    over re-projected correspondences (luciddreamer.py:424-440)."""
    if mode == "reference":
        return jnp.float32(1.0)                     # the reference's no-op
    H, W = depth.shape
    u = jnp.clip(jnp.round(pix[0]), 0, W - 1).astype(jnp.int32)
    v = jnp.clip(jnp.round(pix[1]), 0, H - 1).astype(jnp.int32)
    d = depth[v, u]
    # unproject the measured depth along each correspondence pixel ray
    rays = jnp.stack([u.astype(jnp.float32) * d, v.astype(jnp.float32) * d, d])
    cam = jnp.linalg.inv(K) @ rays
    Rinv = jnp.linalg.inv(R)
    world = Rinv @ cam - Rinv @ T.reshape(3, 1)     # (3, N)
    w = valid.astype(jnp.float32)
    num = jnp.sum(points * world * w[None, :])
    den = jnp.sum(world * world * w[None, :]) + 1e-12
    if mode == "closed_form":
        return num / den
    # mode == "adam": the reference's intended 100-step Adam (lr 1e-3,
    # torch defaults), actually wired up
    def loss(sc):
        diff = (points - sc * world) * w[None, :]
        return jnp.sum(diff**2) / jnp.maximum(jnp.sum(w) * 3, 1.0)

    g = jax.grad(loss)

    def body(_, st):
        sc, m, vv, t = st
        gr = g(sc)
        t = t + 1
        m = 0.9 * m + 0.1 * gr
        vv = 0.999 * vv + 0.001 * gr * gr
        mh = m / (1 - 0.9**t)
        vh = vv / (1 - 0.999**t)
        return sc - 1e-3 * mh / (jnp.sqrt(vh) + 1e-8), m, vv, t

    sc, *_ = jax.lax.fori_loop(
        0, 100, body, (jnp.float32(1.0), 0.0, 0.0, jnp.float32(0.0))
    )
    return sc


@functools.partial(jax.jit, static_argnames=("H", "W"))
def _border_compensation(points, pix, z, valid, border_sel, depth, mask2, sc,
                         K, R, T, H, W):
    """New-point lift with border-depth compensation
    (luciddreamer.py:442-490): measure, at mask-boundary correspondences,
    the camera-depth offset between the existing cloud and the newly lifted
    surface; interpolate that offset over the hole pixels; lift hole pixels
    at sc*depth + offset.  Returns (new_points (3, H*W), new_valid (H*W))."""
    Kinv = jnp.linalg.inv(K)
    Rinv = jnp.linalg.inv(R)
    Tc = T.reshape(3, 1)
    cam_origin = -Rinv @ Tc                                   # (3, 1)

    u = jnp.clip(jnp.round(pix[0]), 0, W - 1).astype(jnp.int32)
    v = jnp.clip(jnp.round(pix[1]), 0, H - 1).astype(jnp.int32)
    d_meas = depth[v, u]
    rays = jnp.stack([u.astype(jnp.float32) * d_meas,
                      v.astype(jnp.float32) * d_meas, d_meas])
    corr_world = sc * (Rinv @ (Kinv @ rays) - Rinv @ Tc)      # (3, N)

    bsel = border_sel & valid
    vec_cam = corr_world - cam_origin                          # (3, N)
    vec_pcd = points - cam_origin
    coeff = jnp.sum(vec_pcd * vec_cam, 0) / jnp.maximum(
        jnp.sum(vec_cam * vec_cam, 0), 1e-12
    )
    comp_world = cam_origin + vec_cam * coeff[None, :]
    comp_cam_z = (R @ comp_world + Tc)[2]
    corr_cam_z = (R @ corr_world + Tc)[2]
    comp_depth = comp_cam_z - corr_cam_z                       # (N,)

    # anchors: border correspondences (+4 zero corners appended below).
    # Valid border anchors are scattered through the N-point cloud, so
    # COMPACT them to the front before the static ANCHOR_CAP truncation
    # (top_k over the 0/1 mask is stable: it keeps valid anchors in index
    # order).  A plain [:ANCHOR_CAP] slice would silently drop most anchors
    # as soon as the cloud exceeds the cap (reference semantics keep ALL
    # border anchors, luciddreamer.py:442-490).
    n = bsel.shape[0]
    k = min(ANCHOR_CAP, n)
    _, sel_idx = jax.lax.top_k(bsel.astype(jnp.int32), k)
    sel_valid = bsel[sel_idx]                                  # (k,)
    anchor_xy = jnp.where(sel_valid[:, None], pix.T[sel_idx], 1e6)  # (k, 2)
    anchor_val = jnp.where(sel_valid, comp_depth[sel_idx], 0.0)

    corners_xy = jnp.array(
        [[0.0, 0.0], [0.0, H - 1.0], [W - 1.0, 0.0], [W - 1.0, H - 1.0]]
    )
    anchor_xy = jnp.concatenate([anchor_xy, corners_xy], 0)
    anchor_val = jnp.concatenate([anchor_val, jnp.zeros(4)], 0)

    # offsets at every pixel (only hole pixels are kept)
    xg, yg = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32), indexing="xy")
    query = jnp.stack([xg.reshape(-1), yg.reshape(-1)], axis=-1)
    new_depth = warp.idw_interpolate(anchor_xy, anchor_val, query)

    base = warp.unproject(depth, K, R, T) * 0.0  # placeholder shape (3,H*W)
    d_flat = depth.reshape(-1)
    px = xg.reshape(-1)
    py = yg.reshape(-1)
    cam1 = Kinv @ jnp.stack([px * d_flat, py * d_flat, d_flat])
    cam2 = Kinv @ jnp.stack([px * new_depth, py * new_depth, new_depth])
    cam_total = cam1 + cam2                                    # (3, H*W)
    world = sc * (Rinv @ cam_total - Rinv @ Tc)
    hole = (1.0 - mask2.reshape(-1)) > 0.5
    return world, hole


def generate_pcd(
    rgb_cond,
    prompt: str = "",
    negative_prompt: str = "",
    pcdgenpath: str = "lookdown",
    seed: int = 1,
    diff_steps: int = 30,
    cam: Optional[CameraConfig] = None,
    inpainter=None,
    depth_estimator=None,
    config: Optional[DreamConfig] = None,
    progress_callback=None,
):
    """Single image + prompt -> traindata dict (luciddreamer.py:497-505
    schema): pcd_points (3, N), pcd_colors (N, 3), frames with warped images
    + Blender c2w matrices (and, beyond the reference, warped depths)."""
    cfg = config or DreamConfig()
    cam = cam or CameraConfig()
    inpainter = inpainter or get_inpainter(cfg.inpainter,
                                           model=cfg.model_name)
    depth_estimator = depth_estimator or get_depth_estimator(cfg.depth_estimator)
    H, W = cam.image_height, cam.image_width
    K = jnp.asarray(cam.K)
    rng = jax.random.PRNGKey(seed)

    image01 = _to_image01(rgb_cond)
    rng, sub = jax.random.split(rng)
    image_curr = np.asarray(
        _condition_input(image01, cam, inpainter, prompt, negative_prompt,
                         diff_steps, sub)
    )

    render_poses = get_pcdgen_poses(pcdgenpath)
    depth_curr = np.asarray(depth_estimator(image_curr))
    cd = depth_curr[H // 2 - 10 : H // 2 + 10, W // 2 - 10 : W // 2 + 10]
    center_depth = float(np.mean(cd))

    # ---- initialize the cloud from view 0 ----
    R0 = jnp.asarray(render_poses[0, :3, :3], jnp.float32)
    T0 = jnp.asarray(render_poses[0, :3, 3:4], jnp.float32)
    pts = np.asarray(warp.unproject(jnp.asarray(depth_curr), K, R0, T0))
    cols = image_curr.reshape(-1, 3).astype(np.float32)

    # ---- dreaming loop ----
    for i in range(1, len(render_poses)):
        if progress_callback:
            progress_callback("dream", i, len(render_poses))
        R = jnp.asarray(render_poses[i, :3, :3], jnp.float32)
        T = jnp.asarray(render_poses[i, :3, 3:4], jnp.float32)
        points = jnp.asarray(pts)
        colors = jnp.asarray(cols)
        pt_valid = jnp.ones(points.shape[1], bool)

        image2, mask2, _, mask_hf, pix, z, valid = _warp_view(
            points, colors, pt_valid, K, R, T, H, W, cfg.fill_iters
        )

        rng, sub = jax.random.split(rng)
        image_curr = np.asarray(
            inpainter(np.asarray(image2), 1.0 - np.asarray(mask2),
                      prompt, negative_prompt, diff_steps, sub)
        )
        depth_curr = jnp.asarray(np.asarray(depth_estimator(image_curr)))

        sc = _align_scale(cfg.align, points, pix, valid, depth_curr, K, R, T)

        u = jnp.clip(jnp.round(pix[0]), 0, W - 1).astype(jnp.int32)
        v = jnp.clip(jnp.round(pix[1]), 0, H - 1).astype(jnp.int32)
        border_sel = mask_hf[v, u] > 0.5
        new_world, hole = _border_compensation(
            points, pix, z, valid, border_sel, depth_curr, mask2, sc,
            K, R, T, H, W,
        )
        hole_np = np.asarray(hole)
        pts = np.concatenate([pts, np.asarray(new_world)[:, hole_np]], axis=1)
        cols = np.concatenate(
            [cols, image_curr.reshape(-1, 3)[hole_np]], axis=0
        )

    # ---- traindata + aligning loop (luciddreamer.py:497-570) ----
    traindata = {
        "camera_angle_x": cam.fov_x,
        "W": W,
        "H": H,
        "pcd_points": pts,
        "pcd_colors": cols,
        "frames": [],
    }
    internal_poses = get_pcdgen_poses("hemisphere", {"center_depth": center_depth})
    points = jnp.asarray(pts)
    colors = jnp.asarray(cols)
    pt_valid = jnp.ones(points.shape[1], bool)

    for i in range(len(render_poses)):
        if progress_callback:
            progress_callback("align", i, len(render_poses))
        for j in range(len(internal_poses)):
            Rw2i = render_poses[i, :3, :3]
            Tw2i = render_poses[i, :3, 3:4]
            Ri2j = internal_poses[j, :3, :3]
            Ti2j = internal_poses[j, :3, 3:4]
            Rw2j = Ri2j @ Rw2i
            Tw2j = Ri2j @ Tw2i + Ti2j
            pose = np.concatenate([Rw2j, Tw2j], axis=1)
            c2w = w2c_pose_to_c2w(pose)

            imagej, maskj, depthj, *_ = _warp_view(
                points, colors, pt_valid,
                K, jnp.asarray(Rw2j, jnp.float32),
                jnp.asarray(Tw2j, jnp.float32), H, W, cfg.fill_iters,
            )
            frame = {
                "image": np.round(np.asarray(imagej) * 255).astype(np.uint8),
                "transform_matrix": c2w.tolist(),
            }
            if cfg.store_frame_depth:
                frame["depth"] = np.asarray(depthj * maskj)
            traindata["frames"].append(frame)

    return traindata
