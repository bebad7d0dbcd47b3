"""Decisive A/B: real build_tile_bins vs inline variant, both reduced to a
host-pulled scalar checksum inside jit."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.transforms import make_camera
from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.render.preprocess import preprocess_gaussians
from luciddreamer_tpu.render.binning import build_tile_bins, gaussian_attr_table

P = 1_000_000
H = W = 512
TILE = 16
CHUNK = 128
GRID = 32
NUM_TILES = GRID * GRID
pair_cap = 4_000_000 // CHUNK * CHUNK
padded_cap = pair_cap + NUM_TILES * CHUNK
num_chunks_cap = padded_cap // CHUNK

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


def inline_binning(proc):
    """Same math as current build_tile_bins, reduced to a checksum."""
    counts = proc.tiles_touched.astype(jnp.int32)
    cum = jnp.cumsum(counts)
    total = cum[-1]
    offsets = cum - counts
    dkey = jax.lax.bitcast_convert_type(
        jax.lax.stop_gradient(proc.depth), jnp.int32)
    marks = jnp.zeros((pair_cap,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, P - 1)
    slot = jnp.arange(pair_cap, dtype=jnp.int32)
    slot_valid = slot < total
    gtab = jnp.stack([
        offsets, dkey,
        proc.rect_min[:, 0] | (proc.rect_min[:, 1] << 16),
        jnp.maximum(proc.rect_max[:, 0] - proc.rect_min[:, 0], 1),
    ], axis=-1)
    row = gtab[g]
    local = slot - row[:, 0]
    rw = row[:, 3]
    tx = (row[:, 2] & 0xFFFF) + local % rw
    ty = (row[:, 2] >> 16) + local // rw
    tile = jnp.where(slot_valid, ty * GRID + tx, NUM_TILES)
    tile_s, _, g_s, slot_s = jax.lax.sort(
        (tile, row[:, 1], g, slot), num_keys=3, is_stable=False)
    edges = jnp.searchsorted(
        tile_s, jnp.arange(NUM_TILES + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_start = edges[:NUM_TILES]
    tile_counts = edges[1:] - edges[:-1]
    padded_counts = jnp.maximum(
        ((tile_counts + CHUNK - 1) // CHUNK) * CHUNK, CHUNK)
    padded_cumsum = jnp.cumsum(padded_counts)
    padded_start = padded_cumsum - padded_counts
    total_padded = padded_cumsum[-1]
    pair_valid_s = tile_s < NUM_TILES
    tile_cl = jnp.minimum(tile_s, NUM_TILES - 1)
    j = jnp.arange(pair_cap, dtype=jnp.int32)
    dest = jnp.where(
        pair_valid_s, padded_start[tile_cl] + (j - tile_start[tile_cl]),
        padded_cap)
    _, slot2packed = jax.lax.sort((slot_s, dest), num_keys=1, is_stable=False)
    tile_chunk_start = padded_start // CHUNK
    cmarks = jnp.zeros((num_chunks_cap,), jnp.int32).at[
        tile_chunk_start].add(1, mode="drop")
    chunk_tile_raw = jnp.clip(jnp.cumsum(cmarks) - 1, 0, NUM_TILES - 1)
    p_idx = jnp.arange(padded_cap, dtype=jnp.int32)
    t_pair = chunk_tile_raw[p_idx // CHUNK]
    local_p = p_idx - padded_start[t_pair]
    pair_in_range = (p_idx < total_padded) & (local_p < tile_counts[t_pair])
    j_of_p = tile_start[t_pair] + local_p
    gid = jnp.where(pair_in_range,
                    jnp.take(g_s, j_of_p, mode="fill", fill_value=P), P)
    attrs = gaussian_attr_table(proc)[gid]
    return jnp.sum(attrs) + jnp.sum(slot2packed) + jnp.sum(gid)


def real_fn(pr):
    b = build_tile_bins(pr, H, W, TILE, pair_cap, CHUNK)
    return jnp.sum(b.attrs) + jnp.sum(b.gid)


real = jax.jit(real_fn)
inline = jax.jit(inline_binning)

print("real  warm:", float(real(proc)), flush=True)
print("inline warm:", float(inline(proc)), flush=True)

for trial in range(3):
    t0 = time.time()
    for _ in range(3):
        float(real(proc))
    tr = (time.time() - t0) / 3
    t0 = time.time()
    for _ in range(3):
        float(inline(proc))
    ti = (time.time() - t0) / 3
    print(f"real {tr*1e3:9.2f} ms   inline {ti*1e3:9.2f} ms", flush=True)
