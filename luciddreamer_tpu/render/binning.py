"""Tile binning: (gaussian, tile) pair expansion, depth sort, chunk-aligned
packing.

The XLA-native replacement for the reference's CUB prefix-sum + 64-bit radix
sort pipeline (rasterizer_impl.cu:68-138,276-319).  Differences, by design:

* static capacity ``pair_cap`` instead of device-side buffer resizing — the
  pair count is data dependent (rasterizer_impl.cu:281-282), so we allocate a
  fixed budget and report overflow for host-side re-tracing;
* pair ranges are padded to multiples of ``chunk`` and packed contiguously so
  the blend kernels stream aligned (chunk, 16)-float32 slabs with one DMA and
  no tail masking; every tile owns >= 1 chunk (empty tiles emit background);
* ordering parity: within a tile, pairs are ordered by (depth, gaussian
  index) — bit-identical to the reference's stable radix sort over
  ``tileID<<32 | float_bits(depth)`` keys for positive depths.

Memory-movement design (profiled on TPU v5e at 1M gaussians / 3.5M pairs —
the sort is only ~6% of binning; random gathers/scatters dominate):

1. pack per-gaussian attributes into ONE (P+1, 16) table (row P is an
   all-zero sentinel whose valid flag is 0) — sequential writes;
2. expand pair slots with the scatter+cumsum trick and read tile rects
   through a packed (P, 4) table — one row-gather instead of four;
3. ONE stable 2-key (tile, depth) lax.sort;
4. scatter only a 4-byte inverse-permutation index per packed slot
   (int scatter is ~8x cheaper than scattering 64-byte rows);
5. materialize packed attrs as a contiguous ROW GATHER from the table —
   gathers are several times faster than scatters on TPU, and its VJP is
   the deterministic segment-sum that replaces the reference backward's
   atomicAdd (backward.cu:537,574-583).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.types import ProcessedGaussians

ATTR_DIM = 16
A_X, A_Y, A_CA, A_CB, A_CC, A_OP, A_R, A_G, A_B, A_DEPTH, A_VALID = range(11)


class TileBins(NamedTuple):
    """Chunk-aligned, depth-sorted per-tile pair lists."""

    attrs: jax.Array        # (padded_cap, ATTR_DIM) f32, chunk-aligned per tile
    gid: jax.Array          # (padded_cap,) int32 gaussian id (P = padding sentinel)
    tile_chunk_start: jax.Array  # (num_tiles,) int32 first chunk of each tile
    tile_num_chunks: jax.Array   # (num_tiles,) int32
    chunk_tile: jax.Array   # (num_chunks_cap,) int32 tile of each chunk (num_tiles = pad)
    chunk_k0: jax.Array     # (num_chunks_cap,) int32 within-tile pair index of chunk row 0
    num_pairs: jax.Array    # scalar int32: true (unpadded) pair count
    overflow: jax.Array     # scalar bool: capacities exceeded -> output invalid


def num_tiles_for(height: int, width: int, tile_size: int) -> tuple[int, int]:
    return (
        (width + tile_size - 1) // tile_size,
        (height + tile_size - 1) // tile_size,
    )


def gaussian_attr_table(proc: ProcessedGaussians) -> jax.Array:
    """(P+1, ATTR_DIM) per-gaussian packed attributes; row P is the zero
    sentinel (valid=0) that padding pairs gather."""
    P = proc.depth.shape[0]
    cols = [
        proc.mean2d[:, 0], proc.mean2d[:, 1],
        proc.conic[:, 0], proc.conic[:, 1], proc.conic[:, 2],
        proc.opacity,
        proc.rgb[:, 0], proc.rgb[:, 1], proc.rgb[:, 2],
        proc.depth,
        jnp.ones((P,), jnp.float32),                    # valid
    ]
    cols += [jnp.zeros((P,), jnp.float32)] * (ATTR_DIM - len(cols))
    table = jnp.stack(cols, axis=-1)
    return jnp.concatenate([table, jnp.zeros((1, ATTR_DIM), jnp.float32)])


def build_tile_bins(
    proc: ProcessedGaussians,
    height: int,
    width: int,
    tile_size: int,
    pair_cap: int,
    chunk: int,
) -> TileBins:
    """Int/shape logic is non-differentiable; gradients flow only through the
    final attribute gather."""
    grid_x, grid_y = num_tiles_for(height, width, tile_size)
    num_tiles = grid_x * grid_y
    P = proc.depth.shape[0]
    padded_cap = pair_cap + num_tiles * chunk
    num_chunks_cap = padded_cap // chunk

    counts = proc.tiles_touched.astype(jnp.int32)            # (P,)
    cum = jnp.cumsum(counts)
    total = cum[-1]
    offsets = cum - counts                                   # exclusive

    # slot -> gaussian id (scatter one marker per gaussian, cumsum recovers
    # the owner of every slot)
    marks = jnp.zeros((pair_cap,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, P - 1)
    slot = jnp.arange(pair_cap, dtype=jnp.int32)
    slot_valid = slot < total

    # slot -> tile id via the gaussian's screen rect (packed table: one
    # 4-int row gather per slot)
    rect = jnp.concatenate([proc.rect_min, proc.rect_max], axis=-1)  # (P, 4)
    rect_g = rect[g]
    local = slot - offsets[g]
    rw = jnp.maximum(rect_g[:, 2] - rect_g[:, 0], 1)
    tx = rect_g[:, 0] + local % rw
    ty = rect_g[:, 1] + local // rw
    tile = jnp.where(slot_valid, ty * grid_x + tx, num_tiles)

    # stable lexicographic (tile, depth) sort == reference 64-bit key order
    depth = proc.depth[g].astype(jnp.float32)
    tile_s, _, g_s = jax.lax.sort(
        (tile.astype(jnp.int32), depth, g.astype(jnp.int32)),
        num_keys=2,
        is_stable=True,
    )

    # per-tile counts / chunk-aligned packed starts
    tile_counts = (
        jnp.zeros((num_tiles + 1,), jnp.int32).at[tile].add(1, mode="drop")
    )[:num_tiles]
    tile_start = jnp.cumsum(tile_counts) - tile_counts
    # every tile gets >= 1 chunk so the Pallas grid walk initializes and
    # emits every tile's state; padded_cap's headroom covers this
    padded_counts = jnp.maximum(
        ((tile_counts + chunk - 1) // chunk) * chunk, chunk
    )
    padded_cumsum = jnp.cumsum(padded_counts)
    padded_start = padded_cumsum - padded_counts
    total_padded = padded_cumsum[-1]

    pair_valid_s = tile_s < num_tiles
    tile_cl = jnp.clip(tile_s, 0, num_tiles - 1)
    rank = jnp.arange(pair_cap, dtype=jnp.int32) - tile_start[tile_cl]
    dest = jnp.where(pair_valid_s, padded_start[tile_cl] + rank, padded_cap)

    # inverse permutation (4-byte scatter), then contiguous row gathers
    inv = (
        jnp.full((padded_cap,), pair_cap, jnp.int32)
        .at[dest]
        .set(slot, mode="drop")
    )
    g_s_pad = jnp.concatenate([g_s, jnp.array([P], jnp.int32)])
    gid = g_s_pad[jnp.minimum(inv, pair_cap)]
    attrs = gaussian_attr_table(proc)[gid]

    # chunk -> (tile, k0) mapping, same scatter+cumsum trick over chunks
    tile_chunk_start = padded_start // chunk
    tile_num_chunks = padded_counts // chunk
    cmarks = (
        jnp.zeros((num_chunks_cap,), jnp.int32)
        .at[tile_chunk_start]
        .add(1, mode="drop")
    )
    chunk_tile = jnp.clip(jnp.cumsum(cmarks) - 1, 0, num_tiles - 1)
    chunk_idx = jnp.arange(num_chunks_cap, dtype=jnp.int32)
    chunk_in_range = chunk_idx < (total_padded // chunk)
    chunk_k0 = (chunk_idx - tile_chunk_start[chunk_tile]) * chunk
    chunk_tile = jnp.where(chunk_in_range, chunk_tile, num_tiles)

    overflow = (total > pair_cap) | (total_padded > padded_cap)
    return TileBins(
        attrs=attrs,
        gid=gid,
        tile_chunk_start=tile_chunk_start,
        tile_num_chunks=tile_num_chunks,
        chunk_tile=chunk_tile,
        chunk_k0=jnp.where(chunk_in_range, chunk_k0, 0),
        num_pairs=total,
        overflow=overflow,
    )
