"""Scene binding: traindata dict -> cameras + initial Gaussians.

Equivalent of the reference Scene / readDataInfo path
(scene/__init__.py:15-41, scene/dataset_readers.py:332-428):

* traindata schema (built by the dreaming loop, luciddreamer.py:497-505):
  {"camera_angle_x": fovx, "W": int, "H": int,
   "pcd_points": (3, N) float, "pcd_colors": (N, 3) float in [0,1],
   "frames": [{"image": HxWx3 float/uint8 array or PIL image,
               "transform_matrix": 4x4 Blender c2w}, ...]}
* per frame: c2w y/z columns are sign-flipped (OpenGL -> COLMAP) and inverted
  to w2c (dataset_readers.py:339-347);
* preset render paths get fov * 1.2 (dataset_readers.py:375);
* scene extent = 1.1 * max camera-center distance from their centroid
  (getNerfppNorm, dataset_readers.py:55-76).
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from luciddreamer_tpu.core.transforms import focal2fov, fov2focal, make_camera
from luciddreamer_tpu.core.types import Camera
from luciddreamer_tpu.trajectory import get_camera_paths


@dataclass
class TrainView:
    """A training camera plus its ground-truth image (3, H, W) float32.

    ``depth`` is the warped metric depth (H, W) stored by the dream stage
    (DreamConfig.store_frame_depth) — None when the traindata has no depth.
    The reference declares but never wires a depth loss (arguments.py:17);
    here the depth rides along so train.loop can consume it for real.
    """

    camera: Camera
    image: np.ndarray
    depth: np.ndarray | None = None
    _canny: np.ndarray | None = None

    @property
    def canny_mask(self):
        """(H, W) float32 inverse-Canny mask of the gt image, lazily
        computed with the reference's per-camera parameters
        (scene/cameras.py:42-43: thresholds (50, 150), isEdge1=False)."""
        if self._canny is None:
            from luciddreamer_tpu.train.losses import image2canny

            hwc = np.asarray(self.image).transpose(1, 2, 0)
            object.__setattr__(
                self, "_canny", image2canny(hwc, 50, 150, isEdge1=False)
            )
        return self._canny


def _frame_to_camera(transform_matrix, fovx, fovy, W, H) -> Camera:
    c2w = np.array(transform_matrix, dtype=np.float64)
    c2w[:3, 1:3] *= -1          # OpenGL/Blender -> COLMAP axes
    return make_camera(c2w, fovx, fovy, W, H)


def _to_image_array(image) -> np.ndarray:
    """-> (3, H, W) float32 in [0, 1], clamped (scene/cameras.py:42)."""
    arr = np.asarray(image)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    if arr.ndim == 3 and arr.shape[-1] in (3, 4):
        if arr.shape[-1] == 4:
            arr = arr[..., :3] * arr[..., 3:4]      # premultiply alpha
        arr = arr.transpose(2, 0, 1)
    return np.clip(arr.astype(np.float32), 0.0, 1.0)


def _nerfpp_radius(centers: np.ndarray) -> float:
    center = centers.mean(axis=0, keepdims=True)
    diagonal = float(np.linalg.norm(centers - center, axis=1).max())
    return diagonal * 1.1


class Scene:
    """Binds traindata to train views, preset cameras, and the point cloud."""

    def __init__(self, traindata: dict, presets: dict | None = None):
        fovx = float(traindata["camera_angle_x"])
        frames = traindata["frames"]
        first = _to_image_array(frames[0]["image"])
        H, W = first.shape[1], first.shape[2]
        fovy = focal2fov(fov2focal(fovx, W), H)

        self.train_views: list[TrainView] = []
        for fr in frames:
            cam = _frame_to_camera(fr["transform_matrix"], fovx, fovy, W, H)
            depth = fr.get("depth") if isinstance(fr, dict) else None
            self.train_views.append(
                TrainView(
                    camera=cam,
                    image=_to_image_array(fr["image"]),
                    depth=None if depth is None
                    else np.asarray(depth, np.float32),
                )
            )

        centers = np.stack(
            [np.asarray(v.camera.campos) for v in self.train_views]
        )
        self.cameras_extent = _nerfpp_radius(centers)

        # preset render paths at fov*1.2 (dataset_readers.py:375)
        presets = presets if presets is not None else get_camera_paths()
        pfovx = fovx * 1.2
        pfovy = focal2fov(fov2focal(pfovx, W), H)
        self.preset_cameras: dict[str, list[Camera]] = {}
        for name, data in presets.items():
            self.preset_cameras[name] = [
                _frame_to_camera(fr["transform_matrix"], pfovx, pfovy, W, H)
                for fr in data["frames"]
            ]

        self.pcd_points = np.asarray(traindata["pcd_points"], np.float32).T
        self.pcd_colors = np.asarray(traindata["pcd_colors"], np.float32)

    def get_train_views(self):
        return self.train_views

    def get_preset_cameras(self, name: str):
        return self.preset_cameras[name]


def load_camera_json(path: str, H: int = 512, W: int = 512):
    """cameras/*.json -> Camera list for scene-less rendering
    (utils/camera.py:24-52): fovy derived from fovx via focal equality; the
    frames hold Blender c2w matrices (3x4 or 4x4)."""
    with open(path) as f:
        meta = json.load(f)
    fovx = float(meta["camera_angle_x"])
    fovy = focal2fov(fov2focal(fovx, W), H)
    cams = []
    for fr in meta["frames"]:
        m = np.array(fr["transform_matrix"], dtype=np.float64)
        if m.shape == (3, 4):
            m = np.concatenate([m, np.array([[0.0, 0, 0, 1]])], axis=0)
        cams.append(_frame_to_camera(m, fovx, fovy, W, H))
    return cams
