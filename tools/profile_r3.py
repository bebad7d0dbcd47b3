"""Stage timing of the full fwd+bwd pipeline (round-3 segment-stream
binning).  Host-pull forcing (axon's block_until_ready doesn't sync)."""
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


def timeit(name, fn, *args, reps=5):
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

bins = jax.jit(binf)(proc)
bins = jax.tree.map(lambda x: jax.device_put(x), bins)
float(jnp.sum(bins.attrs))

fwd = functools.partial(_fwd_call, grid_x=GRID, grid_y=GRID,
                        tile_size=TILE, chunk=CHUNK)
timeit("blend fwd kernel",
       lambda a, ct, ck, lo, hi, sc: jnp.sum(fwd(a, ct, ck, lo, hi, sc)),
       bins.attrs, bins.seg_tile, bins.seg_k0, bins.seg_lo, bins.seg_hi,
       bins.seg_chunk)

state = jax.jit(fwd)(bins.attrs, bins.seg_tile, bins.seg_k0, bins.seg_lo,
                     bins.seg_hi, bins.seg_chunk)
float(jnp.sum(state))
dstate = jnp.ones_like(state)
bwd = functools.partial(_bwd_call, grid_x=GRID, grid_y=GRID,
                        tile_size=TILE, chunk=CHUNK)
timeit("blend bwd kernel",
       lambda a, ct, ck, lo, hi, sc, s, d: jnp.sum(
           bwd(a, ct, ck, lo, hi, sc, s, d)),
       bins.attrs, bins.seg_tile, bins.seg_k0, bins.seg_lo, bins.seg_hi,
       bins.seg_chunk, state, dstate)

print("num_pairs:", int(bins.num_pairs), "overflow:", bool(bins.overflow))
