"""Chained-K stage timing (cancels the ~25ms axon dispatch overhead):
cost = (t_K2 - t_K1) / (K2 - K1) with data-dependent chaining."""
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

P = 1_000_000; H = W = 512; TILE = 16; CHUNK = 128; PAIR_CAP = 4_000_000

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


def run(f, *args):
    float(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(f(*args))
        best = min(best, time.time() - t0)
    return best


def chained(name, step, seed_args, k1=1, k2=3):
    """step(x, *args) -> scalar; chain by adding the scalar into x."""

    def mk(k):
        def f(x, *args):
            s = jnp.float32(0)
            for _ in range(k):
                s = step(x + s * 1e-20, *args)
            return s
        return jax.jit(f)

    t1 = run(mk(k1), *seed_args)
    t2 = run(mk(k2), *seed_args)
    per = (t2 - t1) / (k2 - k1)
    print(f"{name:44s} {per*1e3:9.2f} ms", flush=True)
    return per


def loss_from(pdict):
    p = GaussianParams.from_param_pytree(pdict, params.alive)
    out = render_tiled(p, cam, bg, active_sh_degree=3, chunk=CHUNK,
                       pair_cap=PAIR_CAP, backend="pallas")
    return jnp.mean(jnp.abs(out["render"] - 0.5)) + 0.1 * jnp.mean(out["depth"])


def gsum(pdict):
    gr = jax.grad(loss_from)(pdict)
    return sum(jnp.sum(v) for v in jax.tree.leaves(gr))


chained("FULL grad", lambda x: gsum(dict(pdict, xyz=x)), (params.xyz,))
chained("FULL forward", lambda x: loss_from(dict(pdict, xyz=x)), (params.xyz,))

prep = functools.partial(preprocess_gaussians, camera=cam,
                         active_sh_degree=3, tile_size=TILE)
chained("preprocess fwd",
        lambda x: jnp.sum(prep(params.replace(xyz=x)).mean2d), (params.xyz,))

proc = jax.block_until_ready(jax.jit(prep)(params))
binf = functools.partial(build_tile_bins, height=H, width=W, tile_size=TILE,
                         pair_cap=PAIR_CAP, chunk=CHUNK)
chained("binning fwd",
        lambda x: jnp.sum(binf(proc.replace(mean2d=proc.mean2d + x)).attrs),
        (jnp.zeros_like(proc.mean2d),))


def bin_grad(x):
    def f(m):
        return jnp.sum(binf(proc.replace(mean2d=m)).attrs ** 2)
    return jnp.sum(jax.grad(f)(proc.mean2d + x))


chained("binning fwd+bwd", bin_grad, (jnp.zeros_like(proc.mean2d),))

# blend alone: fixed bins, perturb attrs
bins = jax.block_until_ready(jax.jit(binf)(proc))
from luciddreamer_tpu.render.pallas_blend import _blend_pallas

GRID = 32


def blend_fwd(x):
    st = _blend_pallas(bins.attrs + x, bins.seg_tile, bins.seg_k0,
                       bins.seg_lo, bins.seg_hi, bins.seg_chunk,
                       GRID, GRID, TILE, CHUNK, False)
    return jnp.sum(st[:, :6, :])


chained("blend fwd (pallas)", blend_fwd, (jnp.zeros_like(bins.attrs),))


def blend_grad(x):
    return jnp.sum(jax.grad(
        lambda a: jnp.sum(_blend_pallas(a, bins.seg_tile, bins.seg_k0,
                                        bins.seg_lo, bins.seg_hi,
                                        bins.seg_chunk,
                                        GRID, GRID, TILE, CHUNK, False)
                          [:, :6, :] ** 2)
    )(bins.attrs + x))


chained("blend fwd+bwd (pallas)", blend_grad, (jnp.zeros_like(bins.attrs),))
