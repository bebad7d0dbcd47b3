"""Legacy dataset readers: COLMAP reconstructions and NeRF-synthetic
(Blender) scenes.

Equivalents of readColmapSceneInfo / readNerfSyntheticInfo and the
scene-type dispatch (scene/dataset_readers.py:147-200,288-329,431-434).
Each returns the same structure as Scene consumes: train views (Camera +
image), a point cloud, and the nerf++ extent.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

from luciddreamer_tpu.core.transforms import focal2fov, fov2focal, make_camera
from luciddreamer_tpu.scene.colmap import qvec2rotmat, read_model
from luciddreamer_tpu.scene.scene import TrainView, _nerfpp_radius


@dataclass
class SceneData:
    views: list
    points: np.ndarray        # (N, 3)
    colors: np.ndarray        # (N, 3) in [0, 1]
    cameras_extent: float


def _load_image(path):
    from PIL import Image

    arr = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return arr.transpose(2, 0, 1)


def read_colmap_scene(root: str, images_dir: str = "images") -> SceneData:
    """sparse/0 reconstruction + images (dataset_readers.py:147-200)."""
    sparse = os.path.join(root, "sparse", "0")
    if not os.path.isdir(sparse):
        sparse = os.path.join(root, "sparse")
    cams, images, (xyz, rgb, _err) = read_model(sparse)

    views = []
    for im in sorted(images.values(), key=lambda i: i.name):
        cam = cams[im.camera_id]
        R = qvec2rotmat(im.qvec)
        t = im.tvec
        if cam.model == "SIMPLE_PINHOLE":
            fx = fy = cam.params[0]
        elif cam.model == "PINHOLE":
            fx, fy = cam.params[0], cam.params[1]
        else:
            raise ValueError(
                f"unsupported COLMAP camera model {cam.model} "
                "(undistort first, as the reference requires)"
            )
        fovx = focal2fov(fx, cam.width)
        fovy = focal2fov(fy, cam.height)
        w2c = np.eye(4)
        w2c[:3, :3] = R
        w2c[:3, 3] = t
        c2w = np.linalg.inv(w2c)
        camera = make_camera(c2w, fovx, fovy, cam.width, cam.height)
        img_path = os.path.join(root, images_dir, im.name)
        image = _load_image(img_path) if os.path.exists(img_path) else None
        views.append(TrainView(camera=camera, image=image))

    centers = np.stack([np.asarray(v.camera.campos) for v in views])
    return SceneData(
        views=views,
        points=xyz.astype(np.float32),
        colors=rgb.astype(np.float32) / 255.0,
        cameras_extent=_nerfpp_radius(centers),
    )


def read_nerf_synthetic(root: str, white_background: bool = False,
                        split: str = "train") -> SceneData:
    """transforms_{split}.json Blender scenes
    (dataset_readers.py:288-329); random point cloud init as the reference
    does when no ply exists (100k points in [-1.3, 1.3]^3)."""
    with open(os.path.join(root, f"transforms_{split}.json")) as f:
        meta = json.load(f)
    fovx = float(meta["camera_angle_x"])
    from PIL import Image

    views = []
    for fr in meta["frames"]:
        path = os.path.join(root, fr["file_path"])
        for ext in ("", ".png", ".jpg"):
            if os.path.exists(path + ext):
                path = path + ext
                break
        im = np.asarray(Image.open(path).convert("RGBA"), np.float32) / 255.0
        bg = 1.0 if white_background else 0.0
        rgb = im[..., :3] * im[..., 3:4] + bg * (1 - im[..., 3:4])
        H, W = rgb.shape[:2]
        c2w = np.array(fr["transform_matrix"], np.float64)
        c2w[:3, 1:3] *= -1                   # OpenGL -> COLMAP
        fovy = focal2fov(fov2focal(fovx, W), H)
        views.append(TrainView(
            camera=make_camera(c2w, fovx, fovy, W, H),
            image=rgb.transpose(2, 0, 1).astype(np.float32),
        ))

    rng = np.random.default_rng(0)
    pts = (rng.random((100_000, 3), dtype=np.float32) * 2.6 - 1.3)
    cols = rng.random((100_000, 3), dtype=np.float32)
    centers = np.stack([np.asarray(v.camera.campos) for v in views])
    return SceneData(views=views, points=pts, colors=cols,
                     cameras_extent=_nerfpp_radius(centers))


SCENE_LOADERS = {
    "colmap": read_colmap_scene,
    "blender": read_nerf_synthetic,
}
