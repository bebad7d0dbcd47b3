"""Round-2 profiling: blend-kernel grid-step overhead + chunk scaling +
blocked cumsum replacement for the packed_gather backward."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from luciddreamer_tpu.core.transforms import make_camera
from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.render.preprocess import preprocess_gaussians
from luciddreamer_tpu.render.binning import build_tile_bins
from luciddreamer_tpu.render.pallas_blend import _fwd_call, _bwd_call

P = 1_000_000
H = W = 512
TILE = 16
PAIR_CAP = 4_000_000
GRID = 32
NUM_TILES = GRID * GRID

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


def timeit(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:42s} {dt*1e3:9.2f} ms")
    return out


# ---- bins at several chunk sizes ----
for chunk in (128, 256, 512):
    bins = jax.jit(
        functools.partial(build_tile_bins, height=H, width=W, tile_size=TILE,
                          pair_cap=PAIR_CAP, chunk=chunk)
    )(preprocess_gaussians(params, cam, 3, TILE))
    bins = jax.block_until_ready(bins)
    print(f"-- chunk={chunk}: num_pairs={int(bins.num_pairs)} "
          f"padded_rows={bins.attrs.shape[0]} chunks={bins.attrs.shape[0]//chunk}")

    fwd = jax.jit(functools.partial(
        _fwd_call, grid_x=GRID, grid_y=GRID, tile_size=TILE, chunk=chunk))
    state = timeit(f"fwd blend chunk={chunk}", fwd, bins.attrs,
                   bins.chunk_tile, bins.chunk_k0)

    dstate = jnp.ones_like(state)
    bwd = jax.jit(functools.partial(
        _bwd_call, grid_x=GRID, grid_y=GRID, tile_size=TILE, chunk=chunk))
    timeit(f"bwd blend chunk={chunk}", bwd, bins.attrs, bins.chunk_tile,
           bins.chunk_k0, state, dstate)


# ---- trivial-body kernel: isolate per-grid-step overhead ----
def _nop_kernel(ct_ref, ck_ref, attrs_ref, out_ref, *, chunk):
    i = pl.program_id(0)
    t = ct_ref[i]
    k0 = ck_ref[i]

    @pl.when(k0 == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] += jnp.sum(attrs_ref[:, :])


def nop_call(attrs, chunk_tile, chunk_k0, chunk):
    num_chunks = attrs.shape[0] // chunk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_chunks,),
        in_specs=[pl.BlockSpec((chunk, 16), lambda i, ct, ck: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 256), lambda i, ct, ck: (ct[i], 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_nop_kernel, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NUM_TILES + 1, 8, 256), jnp.float32),
    )(chunk_tile, chunk_k0, attrs)


for chunk in (128, 512):
    bins = jax.jit(
        functools.partial(build_tile_bins, height=H, width=W, tile_size=TILE,
                          pair_cap=PAIR_CAP, chunk=chunk)
    )(preprocess_gaussians(params, cam, 3, TILE))
    bins = jax.block_until_ready(bins)
    timeit(f"NOP kernel chunk={chunk}",
           jax.jit(functools.partial(nop_call, chunk=chunk)),
           bins.attrs, bins.chunk_tile, bins.chunk_k0)


# ---- blocked two-level cumsum vs XLA cumsum on (4.1M, 16) ----
x = jnp.asarray(rng.normal(size=(4_200_448, 16)), jnp.float32)


def xla_cumsum(x):
    return jnp.cumsum(x, axis=0)


def blocked_cumsum(x, blk=2048):
    n = x.shape[0]
    nb = n // blk
    xr = x[: nb * blk].reshape(nb, blk, -1)
    inner = jnp.cumsum(xr, axis=1)
    carry = jnp.concatenate(
        [jnp.zeros((1, x.shape[1]), x.dtype),
         jnp.cumsum(inner[:, -1, :], axis=0)], axis=0)
    out = (inner + carry[:-1, None, :]).reshape(nb * blk, -1)
    tail = x[nb * blk:]
    if tail.shape[0]:
        tail_out = jnp.cumsum(tail, axis=0) + carry[-1]
        out = jnp.concatenate([out, tail_out], axis=0)
    return out


a = timeit("XLA cumsum (4.2M,16)", jax.jit(xla_cumsum), x)
b = timeit("blocked cumsum (4.2M,16)", jax.jit(blocked_cumsum), x)
print("allclose:", bool(jnp.allclose(a, b, atol=1e-2)))
