"""Round-2 profiling (c): bisect build_tile_bins' 174 ms via DCE cutoffs,
and test cheaper variants (packed 1-key sort, gid-by-gather, searchsorted
expansion)."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.transforms import make_camera
from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.render.preprocess import preprocess_gaussians
from luciddreamer_tpu.render.binning import gaussian_attr_table

P = 1_000_000
H = W = 512
TILE = 16
CHUNK = 128
PAIR_CAP = 4_000_064  # chunk-aligned
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
proc = jax.block_until_ready(
    jax.jit(functools.partial(
        preprocess_gaussians, camera=cam, active_sh_degree=3, tile_size=TILE
    ))(params))


def timeit(name, fn, *args, reps=3):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(jax.jit(fn)(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:52s} {dt*1e3:9.2f} ms")
    return out


pair_cap = ((PAIR_CAP + CHUNK - 1) // CHUNK) * CHUNK
padded_cap = pair_cap + NUM_TILES * CHUNK
num_chunks_cap = padded_cap // CHUNK


def stages(proc, upto):
    counts = proc.tiles_touched.astype(jnp.int32)
    cum = jnp.cumsum(counts)
    total = cum[-1]
    offsets = cum - counts
    order = jnp.argsort(proc.depth, stable=True)
    rank = jnp.zeros((P,), jnp.int32).at[order].set(
        jnp.arange(P, dtype=jnp.int32))
    if upto == 1:
        return offsets, rank

    marks = jnp.zeros((pair_cap,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, P - 1)
    slot = jnp.arange(pair_cap, dtype=jnp.int32)
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
    tile = jnp.where(slot_valid, ty * GRID + tx, NUM_TILES)
    if upto == 2:
        return tile, row[:, 1], g

    tile_s, _, g_s, slot_s = jax.lax.sort(
        (tile, row[:, 1], g, slot), num_keys=2, is_stable=False)
    if upto == 3:
        return tile_s, g_s, slot_s

    edges = jnp.searchsorted(
        tile_s, jnp.arange(NUM_TILES + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_start = edges[:NUM_TILES]
    tile_counts = edges[1:] - edges[:-1]
    padded_counts = jnp.maximum(
        ((tile_counts + CHUNK - 1) // CHUNK) * CHUNK, CHUNK)
    padded_cumsum = jnp.cumsum(padded_counts)
    padded_start = padded_cumsum - padded_counts
    if upto == 4:
        return tile_start, padded_start, g_s, slot_s

    pair_valid_s = tile_s < NUM_TILES
    tile_cl = jnp.minimum(tile_s, NUM_TILES - 1)
    j = jnp.arange(pair_cap, dtype=jnp.int32)
    dest = jnp.where(
        pair_valid_s, padded_start[tile_cl] + (j - tile_start[tile_cl]),
        padded_cap)
    slot2packed = jnp.full((pair_cap,), padded_cap, jnp.int32).at[slot_s].set(
        dest, mode="drop")
    gid = jnp.full((padded_cap,), P, jnp.int32).at[dest].set(g_s, mode="drop")
    if upto == 5:
        return slot2packed, gid

    attrs = gaussian_attr_table(proc)[gid]
    return attrs, slot2packed


for k, name in [(1, "expand:rank+offsets"), (2, "  +slot->tile"),
                (3, "  +2key sort(4 ops)"), (4, "  +edges"),
                (5, "  +dest scatters"), (6, "  +attr gather (full)")]:
    timeit(f"stage{k} {name}", functools.partial(stages, upto=k), proc)


# variant: packed single-key sort, carry slot only
def variant_packed(proc):
    counts = proc.tiles_touched.astype(jnp.int32)
    cum = jnp.cumsum(counts)
    total = cum[-1]
    offsets = cum - counts
    order = jnp.argsort(proc.depth, stable=True)
    rank = jnp.zeros((P,), jnp.int32).at[order].set(
        jnp.arange(P, dtype=jnp.int32))
    marks = jnp.zeros((pair_cap,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, P - 1)
    slot = jnp.arange(pair_cap, dtype=jnp.int32)
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
    tile = jnp.where(slot_valid, ty * GRID + tx, NUM_TILES)
    # pack (tile, rank) into one non-negative int32: tile <= 1024 (11 bits),
    # rank < 2^20 -> key = tile * 2^20 + rank < 2^31
    key = tile * (1 << 20) + row[:, 1]
    key_s, slot_s = jax.lax.sort((key, slot), num_keys=1, is_stable=False)
    tile_s = key_s >> 20
    g_s = g[slot_s]
    return tile_s, g_s, slot_s


timeit("variant packed 1-key sort (2 ops) e2e->stage3", variant_packed, proc)


# variant: searchsorted owner instead of marks+cumsum
def variant_owner(proc):
    counts = proc.tiles_touched.astype(jnp.int32)
    cum = jnp.cumsum(counts)
    slot = jnp.arange(pair_cap, dtype=jnp.int32)
    g = jnp.searchsorted(cum, slot, side="right").astype(jnp.int32)
    return jnp.clip(g, 0, P - 1)


timeit("variant owner via searchsorted (vs marks+cumsum)", variant_owner, proc)
