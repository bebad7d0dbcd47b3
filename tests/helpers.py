"""Shared test utilities: random scenes and cameras."""
import math

import jax.numpy as jnp
import numpy as np

from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.core.transforms import make_camera


def make_random_gaussians(P, rng, sh_degree=3, spread=1.0, scale_range=(-4.5, -2.0),
                          capacity=None, center=(0.0, 0.0, 3.0)):
    """Random Gaussians in a blob around ``center`` (camera at origin, +z fwd)."""
    capacity = capacity or P
    n_rest = (sh_degree + 1) ** 2 - 1
    xyz = rng.normal(size=(capacity, 3)) * spread + np.asarray(center)
    f_dc = rng.normal(size=(capacity, 1, 3)) * 0.5
    f_rest = rng.normal(size=(capacity, n_rest, 3)) * 0.1
    scaling = rng.uniform(*scale_range, size=(capacity, 3))
    rotation = rng.normal(size=(capacity, 4))
    rotation /= np.linalg.norm(rotation, axis=-1, keepdims=True)
    opacity = rng.uniform(-2.0, 3.0, size=(capacity, 1))
    alive = np.arange(capacity) < P
    return GaussianParams(
        xyz=jnp.asarray(xyz, jnp.float32),
        features_dc=jnp.asarray(f_dc, jnp.float32),
        features_rest=jnp.asarray(f_rest, jnp.float32),
        scaling=jnp.asarray(scaling, jnp.float32),
        rotation=jnp.asarray(rotation, jnp.float32),
        opacity=jnp.asarray(opacity, jnp.float32),
        alive=jnp.asarray(alive),
    )


def make_test_camera(W=32, H=32, fov=0.8279):
    """Camera at the origin looking down +z (identity c2w)."""
    c2w = np.eye(4)
    return make_camera(c2w, fov, fov, W, H)


def params_to_np(params: GaussianParams):
    shs = np.asarray(params.get_features(), dtype=np.float64)
    return dict(
        xyz=np.asarray(params.xyz, np.float64),
        shs=shs,
        log_scale=np.asarray(params.scaling, np.float64),
        quat_raw=np.asarray(params.rotation, np.float64),
        opacity_logit=np.asarray(params.opacity[:, 0], np.float64),
    )


def camera_to_np(cam):
    return dict(
        viewmat=np.asarray(cam.viewmatrix, np.float64),
        projmat=np.asarray(cam.projmatrix, np.float64),
        campos=np.asarray(cam.campos, np.float64),
        tanfovx=float(cam.tanfovx),
        tanfovy=float(cam.tanfovy),
        W=cam.width,
        H=cam.height,
    )
