"""Round-4 stage timing: where do fwd 110ms / bwd 129ms go, and how do the
pair-scale ops scale with pair_cap?  Host-pull forcing (axon's
block_until_ready doesn't sync)."""
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
    print(f"{name:52s} {best*1e3:9.2f} ms", flush=True)
    return best


# how many pairs does the bench scene actually produce?
prep = functools.partial(preprocess_gaussians, camera=cam,
                         active_sh_degree=3, tile_size=TILE)
proc = jax.block_until_ready(jax.jit(prep)(params))
total = int(jnp.sum(proc.tiles_touched))
print(f"actual pairs: {total:,}  visible: {int(jnp.sum(proc.visible)):,}",
      flush=True)

for pair_cap in (4_000_000, 2 * ((total // CHUNK) + 2) * CHUNK // 2):
    print(f"--- pair_cap {pair_cap:,}")

    def loss(pdict):
        p = GaussianParams.from_param_pytree(pdict, params.alive)
        out = render_tiled(p, cam, bg, active_sh_degree=3, chunk=CHUNK,
                           pair_cap=pair_cap, backend="pallas")
        return (jnp.mean(jnp.abs(out["render"] - 0.5))
                + 0.1 * jnp.mean(out["depth"]))

    def grad_sum(pdict):
        gr = jax.grad(loss)(pdict)
        return sum(jnp.sum(v) for v in jax.tree.leaves(gr))

    timeit("FULL grad (fwd+bwd)", grad_sum, pdict)
    timeit("FULL forward (loss)", loss, pdict)

    binf = functools.partial(build_tile_bins, height=H, width=W,
                             tile_size=TILE, pair_cap=pair_cap, chunk=CHUNK)
    timeit("preprocess fwd", lambda p: jnp.sum(prep(p).mean2d), params)
    timeit("binning fwd", lambda pr: jnp.sum(binf(pr).attrs), proc)

    def bin_grad(pr):
        def f(tbl_in):
            pr2 = pr.replace(mean2d=tbl_in)
            return jnp.sum(binf(pr2).attrs ** 2)
        return jnp.sum(jax.grad(f)(pr.mean2d))

    timeit("binning fwd+bwd", bin_grad, proc)

# gather scaling: per-lookup bound?
tbl = jnp.asarray(rng.normal(size=(P + 1, 16)), jnp.float32)
for n in (1_000_000, 2_000_000, 4_000_000):
    idx = jnp.asarray(rng.integers(0, P, size=n), jnp.int32)

    def g16(t, i):
        return jnp.sum(t[i]) + jnp.sum(t[i + 1])   # 2 gathers

    timeit(f"2x row gather 16w n={n:,}", g16, tbl, idx)
