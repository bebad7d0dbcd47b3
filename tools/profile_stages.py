"""Stage-by-stage TPU timing at bench scale (1M gaussians, 512x512)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.transforms import make_camera
from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.render.preprocess import preprocess_gaussians
from luciddreamer_tpu.render.binning import build_tile_bins, num_tiles_for
from luciddreamer_tpu.render.tiled import render_tiled

P = 1_000_000
H = W = 512
TILE = 16
CHUNK = 128
PAIR_CAP = 4_000_000

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
cam = make_camera(np.eye(4), 0.8279, 0.8279, W, H)
bg = jnp.zeros(3)


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:28s} {dt*1e3:9.2f} ms")
    return out


@jax.jit
def f_pre(p):
    return preprocess_gaussians(p, cam, 3, TILE, 1.0)


@jax.jit
def f_bin(p):
    proc = preprocess_gaussians(p, cam, 3, TILE, 1.0)
    return build_tile_bins(proc, H, W, TILE, PAIR_CAP, CHUNK)


@jax.jit
def f_fwd(p):
    out = render_tiled(p, cam, bg, active_sh_degree=3, chunk=CHUNK,
                       pair_cap=PAIR_CAP, backend="pallas")
    return out["render"], out["depth"], out["num_pairs"]


def loss(pdict):
    p = GaussianParams.from_param_pytree(pdict, params.alive)
    out = render_tiled(p, cam, bg, active_sh_degree=3, chunk=CHUNK,
                       pair_cap=PAIR_CAP, backend="pallas")
    return jnp.mean(jnp.abs(out["render"] - 0.5)) + 0.1 * jnp.mean(out["depth"])


f_grad = jax.jit(jax.grad(loss))

proc = timeit("preprocess", f_pre, params)
print("  tiles_touched sum:", int(jnp.sum(proc.tiles_touched)))
bins = timeit("preprocess+binning", f_bin, params)
print("  num_pairs:", int(bins.num_pairs), "overflow:", bool(bins.overflow))
out = timeit("full forward", f_fwd, params)
timeit("full fwd+bwd (grad)", f_grad, params.param_pytree())
