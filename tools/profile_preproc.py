"""Bisect the 26 ms preprocess: time each stage in isolation on the TPU."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.core import covariance, sh as shlib
from luciddreamer_tpu.core.transforms import make_camera
from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.render.preprocess import preprocess_gaussians

P = 1_000_000
rng = np.random.default_rng(42)
params = GaussianParams(
    xyz=jnp.asarray(rng.normal(size=(P, 3)) + [0, 0, 3.0], jnp.float32),
    features_dc=jnp.asarray(rng.normal(size=(P, 1, 3)) * 0.5, jnp.float32),
    features_rest=jnp.asarray(rng.normal(size=(P, 15, 3)) * 0.1, jnp.float32),
    scaling=jnp.asarray(rng.uniform(-5.5, -3.5, size=(P, 3)), jnp.float32),
    rotation=jnp.asarray(rng.normal(size=(P, 4)), jnp.float32),
    opacity=jnp.asarray(rng.uniform(-2.0, 3.0, size=(P, 1)), jnp.float32),
    alive=jnp.ones(P, bool),
)
cam = make_camera(np.eye(4), 0.8279, 0.8279, 512, 512)


def timeit(name, fn, *args, reps=10):
    f = jax.jit(fn)
    float(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            float(f(*args))
        best = min(best, (time.time() - t0) / reps)
    print(f"{name:40s} {best*1e3:8.2f} ms", flush=True)


timeit("full preprocess", lambda p: jnp.sum(preprocess_gaussians(
    p, cam, 3).mean2d), params)
timeit("full preprocess (sum all)", lambda p: sum(
    jnp.sum(v.astype(jnp.float32)) for v in
    [preprocess_gaussians(p, cam, 3).rgb]), params)

timeit("activations only", lambda p: (
    jnp.sum(p.get_opacity()) + jnp.sum(p.get_scaling())
    + jnp.sum(p.get_rotation())), params)
timeit("get_features", lambda p: jnp.sum(p.get_features()), params)
timeit("sh eval", lambda p: jnp.sum(shlib.sh_to_rgb_clamped(
    3, p.get_features(), p.xyz, cam.campos)), params)
timeit("cov3d", lambda p: jnp.sum(covariance.build_cov3d(
    p.get_scaling(), p.get_rotation())), params)
timeit("cov3d+proj2d", lambda p: jnp.sum(covariance.project_cov3d_to_2d(
    p.xyz, covariance.build_cov3d(p.get_scaling(), p.get_rotation()),
    cam.viewmatrix, cam.focal_x, cam.focal_y, cam.tanfovx, cam.tanfovy)),
    params)


def proj_only(p):
    mx, my, mz = p.xyz[..., 0], p.xyz[..., 1], p.xyz[..., 2]
    pm = cam.projmatrix
    hom_x = pm[0, 0] * mx + pm[0, 1] * my + pm[0, 2] * mz + pm[0, 3]
    hom_y = pm[1, 0] * mx + pm[1, 1] * my + pm[1, 2] * mz + pm[1, 3]
    p_w = pm[3, 0] * mx + pm[3, 1] * my + pm[3, 2] * mz + pm[3, 3]
    return jnp.sum(hom_x + hom_y + p_w)


timeit("projection only", proj_only, params)
