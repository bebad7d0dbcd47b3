"""Camera/projection math (JAX + numpy twins).

Semantics match /root/reference/utils/graphics.py:33-83 and
scene/cameras.py:58-61, but in plain math convention (no glm transposes):
``x_view = world2view @ [x, 1]``, ``x_clip = proj @ x_view``.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def world2view(R: np.ndarray, t: np.ndarray, translate=None, scale: float = 1.0) -> np.ndarray:
    """World->camera 4x4 from rotation R (c2w rotation, stored as in the
    reference: the reference keeps R transposed and builds Rt[:3,:3] = R.T,
    utils/graphics.py:41-52).  Here R is the *camera-to-world* rotation and t
    the world->camera translation, matching the reference call convention.
    Optional recentering: camera center shifted by ``translate`` and scaled.
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        if translate is None:
            translate = np.zeros(3)
        C2W = np.linalg.inv(Rt)
        cam_center = (C2W[:3, 3] + np.asarray(translate)) * scale
        C2W[:3, 3] = cam_center
        Rt = np.linalg.inv(C2W)
    return Rt.astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style projection, z in [0, 1] (utils/graphics.py:55-75)."""
    tan_y = math.tan(fovy / 2.0)
    tan_x = math.tan(fovx / 2.0)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_x
    P[1, 1] = 1.0 / tan_y
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: int) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def ndc2pix(v, S):
    """NDC [-1,1] -> pixel center coords (auxiliary.h:41-44)."""
    return ((v + 1.0) * S - 1.0) * 0.5


def homogeneous_transform(points, matrix):
    """Apply a 4x4 to (..., 3) points; returns (..., 4)."""
    p = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    return p @ matrix.T


def make_camera(
    c2w: np.ndarray,
    fovx: float,
    fovy: float,
    width: int,
    height: int,
    znear: float = 0.01,
    zfar: float = 100.0,
):
    """Build a renderer Camera from a 4x4 camera-to-world matrix."""
    from luciddreamer_tpu.core.types import Camera

    c2w = np.asarray(c2w, dtype=np.float64)
    w2c = np.linalg.inv(c2w)
    proj = projection_matrix(znear, zfar, fovx, fovy).astype(np.float64)
    full = proj @ w2c
    campos = c2w[:3, 3]
    return Camera(
        viewmatrix=jnp.asarray(w2c, dtype=jnp.float32),
        projmatrix=jnp.asarray(full, dtype=jnp.float32),
        campos=jnp.asarray(campos, dtype=jnp.float32),
        tanfovx=jnp.asarray(math.tan(fovx / 2.0), dtype=jnp.float32),
        tanfovy=jnp.asarray(math.tan(fovy / 2.0), dtype=jnp.float32),
        height=int(height),
        width=int(width),
        znear=znear,
        zfar=zfar,
    )


def camera_from_w2c(
    w2c: np.ndarray, fovx: float, fovy: float, width: int, height: int,
    znear: float = 0.01, zfar: float = 100.0,
):
    c2w = np.linalg.inv(np.asarray(w2c, dtype=np.float64))
    return make_camera(c2w, fovx, fovy, width, height, znear, zfar)
