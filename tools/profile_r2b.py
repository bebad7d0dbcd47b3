"""Round-2 profiling (b): where do the ~890 ms of the bench iteration go?"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.transforms import make_camera
from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.render.preprocess import preprocess_gaussians
from luciddreamer_tpu.render.binning import build_tile_bins
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


def timeit(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:46s} {dt*1e3:9.2f} ms")
    return out


# 1. full bench loss grad
def loss(pdict):
    p = GaussianParams.from_param_pytree(pdict, params.alive)
    out = render_tiled(p, cam, bg, active_sh_degree=3, chunk=CHUNK,
                       pair_cap=PAIR_CAP, backend="pallas")
    return jnp.mean(jnp.abs(out["render"] - 0.5)) + 0.1 * jnp.mean(out["depth"])


pdict = params.param_pytree()
timeit("FULL grad(loss)  [bench repro]", jax.jit(jax.grad(loss)), pdict)

# 2. forward only
timeit("FULL forward (loss only)", jax.jit(loss), pdict)

# 3. preprocess forward
prep = jax.jit(functools.partial(
    preprocess_gaussians, camera=cam, active_sh_degree=3, tile_size=TILE))
proc = timeit("preprocess fwd", prep, params)

# 4. binning forward (given proc)
binf = jax.jit(functools.partial(
    build_tile_bins, height=H, width=W, tile_size=TILE,
    pair_cap=PAIR_CAP, chunk=CHUNK))
bins = timeit("build_tile_bins fwd (given proc)", binf, proc)

# 5. binning fwd+bwd through attrs (the packed_gather VJP)
def bin_loss(proc):
    b = build_tile_bins(proc, H, W, TILE, PAIR_CAP, CHUNK)
    return jnp.sum(b.attrs * 1e-6)

timeit("build_tile_bins fwd+bwd (attr VJP)", jax.jit(jax.grad(bin_loss)), proc)

# 6. preprocess fwd+bwd
def prep_loss(params):
    pr = preprocess_gaussians(params, cam, 3, TILE)
    return (jnp.sum(pr.mean2d * 1e-6) + jnp.sum(pr.conic * 1e-6)
            + jnp.sum(pr.rgb * 1e-6) + jnp.sum(pr.depth * 1e-6)
            + jnp.sum(pr.opacity * 1e-6))

timeit("preprocess fwd+bwd", jax.jit(jax.grad(prep_loss)), params)
