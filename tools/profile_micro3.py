"""Round-2 micro-profile #3: binning sub-stages, sort variants, kernel chunk."""
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.transforms import make_camera
from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.render.preprocess import preprocess_gaussians
from luciddreamer_tpu.render.binning import (
    build_tile_bins, num_tiles_for, gaussian_attr_table, packed_gather,
)

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
DISPATCH = None


def timeit(name, fn, *args, reps=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / reps * 1e3
    extra = f" (real ~{dt - DISPATCH:7.2f})" if DISPATCH else ""
    print(f"{name:40s} {dt:9.2f} ms{extra}")
    return out


DISPATCH = 0
d = timeit("dispatch (x+1 tiny)", jax.jit(lambda x: x + 1.0),
           jnp.ones((8,)), reps=30)
t0 = time.time()
for _ in range(30):
    jax.block_until_ready(jax.jit(lambda x: x + 1.0)(jnp.ones((8,))))
DISPATCH = (time.time() - t0) / 30 * 1e3

proc = jax.block_until_ready(
    jax.jit(lambda p: preprocess_gaussians(p, cam, 3, TILE, 1.0))(params))
grid_x, grid_y = num_tiles_for(H, W, TILE)
num_tiles = grid_x * grid_y


def stage_expand(proc):
    counts = proc.tiles_touched.astype(jnp.int32)
    cum = jnp.cumsum(counts)
    total = cum[-1]
    offsets = cum - counts
    order = jnp.argsort(proc.depth, stable=True)
    rank = jnp.zeros((P,), jnp.int32).at[order].set(jnp.arange(P, dtype=jnp.int32))
    marks = jnp.zeros((PAIR_CAP,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, P - 1)
    slot = jnp.arange(PAIR_CAP, dtype=jnp.int32)
    slot_valid = slot < total
    gtab = jnp.stack([
        offsets, rank,
        proc.rect_min[:, 0] | (proc.rect_min[:, 1] << 16),
        jnp.maximum(proc.rect_max[:, 0] - proc.rect_min[:, 0], 1),
    ], axis=-1)
    row = gtab[g]
    local = slot - row[:, 0]
    rw = row[:, 3]
    tx = (row[:, 2] & 0xFFFF) + local % rw
    ty = (row[:, 2] >> 16) + local // rw
    tile = jnp.where(slot_valid, ty * grid_x + tx, num_tiles)
    return tile, row[:, 1], g, slot, offsets, counts


@jax.jit
def f_expand(proc):
    return stage_expand(proc)


@jax.jit
def f_sort_2key_2pay(proc):
    tile, rank_g, g, slot, _, _ = stage_expand(proc)
    return jax.lax.sort((tile, rank_g, g, slot), num_keys=2, is_stable=False)


@jax.jit
def f_sort_2key_1pay(proc):
    tile, rank_g, g, slot, _, _ = stage_expand(proc)
    tile_s, _, slot_s = jax.lax.sort((tile, rank_g, slot), num_keys=2,
                                     is_stable=False)
    return tile_s, slot_s, g[slot_s]


@jax.jit
def f_sort_u32_1pay(proc):
    tile, rank_g, g, slot, _, _ = stage_expand(proc)
    key = (tile.astype(jnp.uint32) << jnp.uint32(21)) | rank_g.astype(jnp.uint32)
    key_s, slot_s = jax.lax.sort((key, slot), num_keys=1, is_stable=False)
    return key_s, slot_s, g[slot_s]


@jax.jit
def f_bin_full(proc):
    return build_tile_bins(proc, H, W, TILE, PAIR_CAP, CHUNK)


print(f"dispatch overhead ~{DISPATCH:.2f} ms")
print("== binning sub-stages ==")
timeit("expand (incl gtab gather)", f_expand, proc)
timeit("expand + sort 2key 2payload", f_sort_2key_2pay, proc)
timeit("expand + sort 2key 1payload + gat", f_sort_2key_1pay, proc)
timeit("expand + sort u32 1payload + gat", f_sort_u32_1pay, proc)
bins = timeit("binning full", f_bin_full, proc)

print("== binning VJP ==")
table = gaussian_attr_table(proc)


def attrs_only(proc_tbl):
    b = build_tile_bins(proc, H, W, TILE, PAIR_CAP, CHUNK)
    return b  # ints don't differentiate


@jax.jit
def f_bin_vjp(proc_in, d_attrs):
    def fn(pr):
        return build_tile_bins(pr, H, W, TILE, PAIR_CAP, CHUNK).attrs

    out, vjp = jax.vjp(fn, proc_in)
    return vjp(d_attrs)


d_attrs = jnp.ones_like(bins.attrs)
timeit("binning fwd+VJP(attrs)", f_bin_vjp, proc, d_attrs)

print("== pallas kernel chunk sweep ==")
from luciddreamer_tpu.render.pallas_blend import _fwd_call, _bwd_call

for ch in (128, 256, 512):
    b = jax.block_until_ready(jax.jit(
        lambda pr: build_tile_bins(pr, H, W, TILE, PAIR_CAP, ch))(proc))
    fwd = jax.jit(functools.partial(
        _fwd_call, grid_x=grid_x, grid_y=grid_y, tile_size=TILE, chunk=ch))
    st = timeit(f"fwd blend chunk={ch}", fwd, b.attrs, b.chunk_tile, b.chunk_k0)
    bwd = jax.jit(functools.partial(
        _bwd_call, grid_x=grid_x, grid_y=grid_y, tile_size=TILE, chunk=ch))
    timeit(f"bwd blend chunk={ch}", bwd, b.attrs, b.chunk_tile, b.chunk_k0,
           st, jnp.ones_like(st))

print("== preprocess VJP ==")


@jax.jit
def f_pre_vjp(p, d):
    def fn(pd):
        pp = GaussianParams.from_param_pytree(pd, params.alive)
        pr = preprocess_gaussians(pp, cam, 3, TILE, 1.0)
        return gaussian_attr_table(pr)

    out, vjp = jax.vjp(fn, p.param_pytree())
    return vjp(d)


timeit("preprocess fwd+VJP", f_pre_vjp, params, jnp.ones((P + 1, 16)))
