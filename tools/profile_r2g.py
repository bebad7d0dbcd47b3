"""Trustworthy (host-pull) stage timing of the full fwd+bwd pipeline."""
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
from luciddreamer_tpu.render.pallas_blend import _fwd_call, _bwd_call

P = 1_000_000
H = W = 512
TILE = 16
CHUNK = 128
PAIR_CAP = 4_000_000
GRID = 32

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
pdict = params.param_pytree()


def timeit(name, fn, *args, reps=3):
    f = jax.jit(fn)
    float(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            float(f(*args))
        best = min(best, (time.time() - t0) / reps)
    print(f"{name:46s} {best*1e3:9.2f} ms", flush=True)


def loss(pdict):
    p = GaussianParams.from_param_pytree(pdict, params.alive)
    out = render_tiled(p, cam, bg, active_sh_degree=3, chunk=CHUNK,
                       pair_cap=PAIR_CAP, backend="pallas")
    return jnp.mean(jnp.abs(out["render"] - 0.5)) + 0.1 * jnp.mean(out["depth"])


def grad_sum(pdict):
    gr = jax.grad(loss)(pdict)
    return sum(jnp.sum(v) for v in jax.tree.leaves(gr))


timeit("FULL grad (host-pull)", grad_sum, pdict)
timeit("FULL forward (loss)", loss, pdict)

prep = functools.partial(preprocess_gaussians, camera=cam,
                         active_sh_degree=3, tile_size=TILE)
timeit("preprocess fwd", lambda p: jnp.sum(prep(p).mean2d), params)

proc = jax.block_until_ready(jax.jit(prep)(params))
binf = functools.partial(build_tile_bins, height=H, width=W, tile_size=TILE,
                         pair_cap=PAIR_CAP, chunk=CHUNK)
timeit("binning fwd", lambda pr: jnp.sum(binf(pr).attrs), proc)

bins = jax.block_until_ready(jax.jit(binf)(proc))
fwd = functools.partial(_fwd_call, grid_x=GRID, grid_y=GRID,
                        tile_size=TILE, chunk=CHUNK)
timeit("blend fwd kernel", lambda a, ct, ck: jnp.sum(fwd(a, ct, ck)),
       bins.attrs, bins.chunk_tile, bins.chunk_k0)

state = jax.block_until_ready(jax.jit(fwd)(bins.attrs, bins.chunk_tile,
                                           bins.chunk_k0))
dstate = jnp.ones_like(state)
bwd = functools.partial(_bwd_call, grid_x=GRID, grid_y=GRID,
                        tile_size=TILE, chunk=CHUNK)
timeit("blend bwd kernel",
       lambda a, ct, ck, s, d: jnp.sum(bwd(a, ct, ck, s, d)),
       bins.attrs, bins.chunk_tile, bins.chunk_k0, state, dstate)


# plain-gather VJP (the scatter-add the custom packed_gather VJP avoids)
from luciddreamer_tpu.render.binning import gaussian_attr_table

table = jax.block_until_ready(jax.jit(gaussian_attr_table)(proc))
dattrs = jnp.ones_like(bins.attrs)


def table_vjp(table, d):
    _, vjp = jax.vjp(lambda t: t[bins.gid], table)
    return jnp.sum(vjp(d)[0])


timeit("plain gather VJP (scatter-add)", table_vjp, table, dattrs)
