"""Finer sub-op timing: binning internals + backward pieces."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.transforms import make_camera
from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.render.preprocess import preprocess_gaussians
from luciddreamer_tpu.render.binning import build_tile_bins, gaussian_attr_table
from luciddreamer_tpu.render.pallas_blend import _fwd_call, _bwd_call

P = 1_000_000
H = W = 512
TILE = 16
CHUNK = 128
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
    print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)
    return out


proc = jax.jit(lambda p: preprocess_gaussians(p, cam, 3, TILE, 1.0))(params)
proc = jax.block_until_ready(proc)
bins = jax.jit(lambda pr: build_tile_bins(pr, H, W, TILE, PAIR_CAP, CHUNK))(proc)
bins = jax.block_until_ready(bins)

# --- binning sub-ops ---------------------------------------------------


@jax.jit
def sub_expand(pr):
    counts = pr.tiles_touched.astype(jnp.int32)
    cum = jnp.cumsum(counts)
    offsets = cum - counts
    marks = jnp.zeros((PAIR_CAP,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, P - 1)
    slot = jnp.arange(PAIR_CAP, dtype=jnp.int32)
    rect = jnp.concatenate([pr.rect_min, pr.rect_max], axis=-1)
    rect_g = rect[g]
    local = slot - offsets[g]
    rw = jnp.maximum(rect_g[:, 2] - rect_g[:, 0], 1)
    tx = rect_g[:, 0] + local % rw
    ty = rect_g[:, 1] + local // rw
    tile = jnp.where(slot < cum[-1], ty * GRID + tx, NUM_TILES)
    return tile, g


@jax.jit
def sub_sort(tile, g):
    depth = proc.depth[g].astype(jnp.float32)
    return jax.lax.sort((tile, depth, g), num_keys=2, is_stable=True)


tile, g = timeit("expand pairs (scatter+cumsum)", sub_expand, proc)
tile_s, _, g_s = timeit("2-key stable sort (4M)", sub_sort, tile, g)


@jax.jit
def sub_hist(tile):
    return (jnp.zeros((NUM_TILES + 1,), jnp.int32).at[tile].add(1, mode="drop"))[:NUM_TILES]


timeit("tile histogram (scatter-add)", sub_hist, tile)


@jax.jit
def sub_hist_ss(tile_s):
    t = jnp.arange(NUM_TILES + 1, dtype=jnp.int32)
    b = jnp.searchsorted(tile_s, t)
    return b[1:] - b[:-1]


timeit("tile histogram (searchsorted)", sub_hist_ss, tile_s)

padded_cap = PAIR_CAP + NUM_TILES * CHUNK


@jax.jit
def sub_invscatter(tile_s, g_s):
    slot = jnp.arange(PAIR_CAP, dtype=jnp.int32)
    dest = jnp.where(tile_s < NUM_TILES, slot, padded_cap)  # fake dest, same cost shape
    inv = jnp.full((padded_cap,), PAIR_CAP, jnp.int32).at[dest].set(slot, mode="drop")
    return inv


inv = timeit("inverse-perm scatter (int32)", sub_invscatter, tile_s, g_s)


@jax.jit
def sub_rowgather(gid):
    return gaussian_attr_table(proc)[gid]


gid = bins.gid
attrs = timeit("attr table row gather (4.1Mx16)", sub_rowgather, gid)

# --- backward pieces ----------------------------------------------------

state = jax.jit(
    lambda a: _fwd_call(a, bins.chunk_tile, bins.chunk_k0, GRID, GRID, TILE, CHUNK)
)(bins.attrs)
state = jax.block_until_ready(state)
dstate = jnp.ones_like(state)

timeit("fwd blend kernel alone", lambda a: _fwd_call(
    a, bins.chunk_tile, bins.chunk_k0, GRID, GRID, TILE, CHUNK), bins.attrs)
timeit("bwd blend kernel alone", lambda a: _bwd_call(
    a, bins.chunk_tile, bins.chunk_k0, state, dstate, GRID, GRID, TILE, CHUNK),
    bins.attrs)

dattrs = jnp.ones_like(bins.attrs)


@jax.jit
def sub_scatteradd(dattrs, gid):
    return jnp.zeros((P + 1, 16), jnp.float32).at[gid].add(dattrs, mode="drop")


timeit("pair->gaussian scatter-add VJP", sub_scatteradd, dattrs, gid)


@jax.jit
def sub_sortreduce(dattrs, gid):
    order = jnp.argsort(gid)
    d_sorted = dattrs[order]
    s = jnp.cumsum(d_sorted, axis=0)
    ends = jnp.searchsorted(gid[order], jnp.arange(P + 1, dtype=jnp.int32) + 1)
    s_pad = jnp.concatenate([jnp.zeros((1, 16), jnp.float32), s])
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
    return s_pad[ends] - s_pad[starts]


timeit("pair->gaussian sort+cumsum-diff", sub_sortreduce, dattrs, gid)

# preprocess fwd+bwd alone
def ploss(pdict):
    p = GaussianParams.from_param_pytree(pdict, params.alive)
    pr = preprocess_gaussians(p, cam, 3, TILE, 1.0)
    return (jnp.sum(pr.mean2d) + jnp.sum(pr.conic) + jnp.sum(pr.rgb)
            + jnp.sum(pr.depth) + jnp.sum(pr.opacity))


timeit("preprocess fwd+bwd (autodiff)", jax.jit(jax.grad(ploss)), params.param_pytree())
