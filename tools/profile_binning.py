"""Fine-grained stage timing of build_tile_bins internals on the real TPU.

Each stage is timed as a standalone jitted function over precomputed inputs
so the numbers are additive-ish (XLA can't fuse across the host pulls).
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.transforms import make_camera
from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.render.preprocess import preprocess_gaussians
from luciddreamer_tpu.render.binning import (
    build_tile_bins, gaussian_attr_table,
)

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

prep = functools.partial(preprocess_gaussians, camera=cam,
                         active_sh_degree=3, tile_size=TILE)
proc = jax.block_until_ready(jax.jit(prep)(params))


def timeit(name, fn, *args, reps=5):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / reps)
    print(f"{name:52s} {best*1e3:9.2f} ms", flush=True)
    return out


# ---- whole binning for reference
timeit("binning fwd (whole)", lambda pr: build_tile_bins(
    pr, H, W, TILE, PAIR_CAP, CHUNK).attrs.sum(), proc)

# ---- stage inputs (materialized on device)
counts = proc.tiles_touched.astype(jnp.int32)
cum = jnp.cumsum(counts)
offsets = cum - counts
depth_bits = jax.lax.bitcast_convert_type(proc.depth, jnp.int32)
gtab = jnp.stack([
    offsets, depth_bits,
    proc.rect_min[:, 0] | (proc.rect_min[:, 1] << 16),
    jnp.maximum(proc.rect_max[:, 0] - proc.rect_min[:, 0], 1),
], axis=-1)
gtab = jax.block_until_ready(gtab)


def expand(gtab, offsets):
    marks = jnp.zeros((PAIR_CAP,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, P - 1)
    slot = jnp.arange(PAIR_CAP, dtype=jnp.int32)
    row = gtab[g]
    local = slot - row[:, 0]
    rw = row[:, 3]
    tx = (row[:, 2] & 0xFFFF) + local % rw
    ty = (row[:, 2] >> 16) + local // rw
    total = offsets[-1] + gtab[-1, 3] * 0 + counts[-1] if False else None
    tile = jnp.where(slot < cum[-1], ty * GRID + tx, NUM_TILES)
    return tile, row[:, 1], g, slot


tile, dbits, g, slot = (jax.block_until_ready(x) for x in jax.jit(
    lambda gt, of: expand(gt, of))(gtab, offsets))

timeit("  expand (marks scatter + cumsum + gtab gather)",
       lambda gt, of: sum(jnp.sum(x) for x in expand(gt, of)), gtab, offsets)

timeit("  marks scatter + cumsum only",
       lambda of: jnp.sum(jnp.clip(jnp.cumsum(
           jnp.zeros((PAIR_CAP,), jnp.int32).at[of].add(1, mode="drop")
       ) - 1, 0, P - 1)), offsets)

timeit("  gtab[g] gather (4M x 4 int32)",
       lambda gt, gg: jnp.sum(gt[gg]), gtab, g)

timeit("  SORT 3-key 4-operand (current)",
       lambda t, d, gg, s: sum(jnp.sum(x) for x in jax.lax.sort(
           (t, d, gg, s), num_keys=3, is_stable=False)),
       tile, dbits, g, slot)

timeit("  SORT 1-key 1-operand (fused int32)",
       lambda k: jnp.sum(jax.lax.sort((k,), num_keys=1, is_stable=False)[0]),
       tile * (1 << 21) + jnp.clip(g, 0, (1 << 21) - 1))

timeit("  SORT 1-key 2-operand",
       lambda k, s: sum(jnp.sum(x) for x in jax.lax.sort(
           (k, s), num_keys=1, is_stable=False)),
       tile * (1 << 21) + jnp.clip(g, 0, (1 << 21) - 1), slot)

timeit("  SORT P-scale (1M) 1-key 2-operand",
       lambda k, s: sum(jnp.sum(x) for x in jax.lax.sort(
           (k, s), num_keys=1, is_stable=False)),
       depth_bits, jnp.arange(P, dtype=jnp.int32))

# sorted outputs for downstream stages
tile_s, dbits_s, g_s, slot_s = (jax.block_until_ready(x) for x in jax.jit(
    lambda t, d, gg, s: jax.lax.sort((t, d, gg, s), num_keys=3,
                                     is_stable=False))(tile, dbits, g, slot))

timeit("  searchsorted tile edges",
       lambda ts: jnp.sum(jnp.searchsorted(
           ts, jnp.arange(NUM_TILES + 1, dtype=jnp.int32), side="left")),
       tile_s)

edges = jnp.searchsorted(
    tile_s, jnp.arange(NUM_TILES + 1, dtype=jnp.int32), side="left"
).astype(jnp.int32)
tile_start = edges[:NUM_TILES]
tile_counts = edges[1:] - edges[:-1]
padded_counts = jnp.maximum(((tile_counts + CHUNK - 1) // CHUNK) * CHUNK, CHUNK)
padded_start = jnp.cumsum(padded_counts) - padded_counts
PADDED_CAP = PAIR_CAP + NUM_TILES * CHUNK


def make_dest(tile_s, slot_s):
    pair_valid_s = tile_s < NUM_TILES
    tile_cl = jnp.minimum(tile_s, NUM_TILES - 1)
    j = jnp.arange(PAIR_CAP, dtype=jnp.int32)
    return jnp.where(
        pair_valid_s, padded_start[tile_cl] + (j - tile_start[tile_cl]),
        PADDED_CAP)


dest = jax.block_until_ready(jax.jit(make_dest)(tile_s, slot_s))

timeit("  dest closed form", lambda ts, ss: jnp.sum(make_dest(ts, ss)),
       tile_s, slot_s)

timeit("  SORT#2 (slot_s, dest) -> slot2packed",
       lambda ss, d: jnp.sum(jax.lax.sort((ss, d), num_keys=1,
                                          is_stable=False)[1]),
       slot_s, dest)

timeit("  slot2packed via random scatter",
       lambda ss, d: jnp.sum(jnp.zeros((PAIR_CAP,), jnp.int32)
                             .at[ss].set(d, mode="drop")),
       slot_s, dest)

timeit("  gid scatter .at[dest].set(g_s)",
       lambda d, gs: jnp.sum(jnp.full((PADDED_CAP,), P, jnp.int32)
                             .at[d].set(gs, mode="drop")),
       dest, g_s)

gid = jax.block_until_ready(jax.jit(
    lambda d, gs: jnp.full((PADDED_CAP,), P, jnp.int32)
    .at[d].set(gs, mode="drop"))(dest, g_s))
table = jax.block_until_ready(jax.jit(gaussian_attr_table)(proc))

timeit("  table[gid] gather (4.1M x 16 f32)",
       lambda t, gg: jnp.sum(t[gg]), table, gid)

timeit("  attr table build", lambda pr: jnp.sum(gaussian_attr_table(pr)), proc)

print("num_pairs =", int(cum[-1]))
