"""Sanity: time real build_tile_bins vs the r2d-style inline variant, both
with forced materialization via checksum."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.transforms import make_camera
from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.render.preprocess import preprocess_gaussians
from luciddreamer_tpu.render.binning import build_tile_bins

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
proc = jax.block_until_ready(
    jax.jit(functools.partial(
        preprocess_gaussians, camera=cam, active_sh_degree=3, tile_size=TILE
    ))(params))

print("backend:", jax.default_backend(), jax.devices()[:1], flush=True)

binf = jax.jit(functools.partial(
    build_tile_bins, height=H, width=W, tile_size=TILE,
    pair_cap=PAIR_CAP, chunk=CHUNK))

# warm
out = jax.block_until_ready(binf(proc))
print("num_pairs", int(out.num_pairs), flush=True)

for trial in range(3):
    t0 = time.time()
    for _ in range(3):
        out = jax.block_until_ready(binf(proc))
    print(f"build_tile_bins (block)   {(time.time()-t0)/3*1e3:9.2f} ms",
          flush=True)

# checksum variant — forces a device-side reduction of the big outputs
csum = jax.jit(lambda pr: jnp.sum(
    build_tile_bins(pr, H, W, TILE, PAIR_CAP, CHUNK).attrs))
jax.block_until_ready(csum(proc))
for trial in range(3):
    t0 = time.time()
    for _ in range(3):
        jax.block_until_ready(csum(proc))
    print(f"build_tile_bins (csum)    {(time.time()-t0)/3*1e3:9.2f} ms",
          flush=True)
