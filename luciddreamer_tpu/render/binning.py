"""Tile binning: (gaussian, tile) pair expansion, depth sort, chunk-aligned packing.

The XLA-native replacement for the reference's CUB prefix-sum + 64-bit radix
sort pipeline (rasterizer_impl.cu:68-138,276-319).  Differences, by design:

* static capacity ``pair_cap`` instead of device-side buffer resizing — the
  pair count is data dependent (rasterizer_impl.cu:281-282), so we allocate a
  fixed budget and report overflow for host-side re-tracing;
* the slot -> gaussian mapping uses a scatter + cumsum (O(N)) instead of the
  reference's key duplication loop;
* pair ranges are padded to multiples of ``chunk`` and packed contiguously so
  the blend kernels stream aligned (chunk, 16)-float32 slabs with one DMA and
  no tail masking;
* sorting is a stable multi-operand lexicographic sort on (tile, depth) —
  bit-identical ordering to the reference's ``tile<<32 | float_bits(depth)``
  key for positive depths, with ties broken by emission order.

Attribute row layout (ATTR_DIM columns, float32):
  0:x  1:y  2:conic_a  3:conic_b  4:conic_c  5:opacity
  6:r  7:g  8:b  9:depth  10:valid  11..15: pad
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


def build_tile_bins(
    proc: ProcessedGaussians,
    height: int,
    width: int,
    tile_size: int,
    pair_cap: int,
    chunk: int,
) -> TileBins:
    """All int/shape logic is non-differentiable; caller should stop_gradient."""
    grid_x, grid_y = num_tiles_for(height, width, tile_size)
    num_tiles = grid_x * grid_y
    P = proc.depth.shape[0]
    padded_cap = pair_cap + num_tiles * chunk
    num_chunks_cap = padded_cap // chunk

    counts = proc.tiles_touched.astype(jnp.int32)            # (P,)
    cum = jnp.cumsum(counts)
    total = cum[-1]
    offsets = cum - counts                                   # exclusive

    # slot -> gaussian id: scatter a marker at each gaussian's first slot, then
    # an inclusive cumsum-1 recovers the owner of every slot (zero-count
    # gaussians collapse naturally because their markers stack).
    marks = jnp.zeros((pair_cap,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.cumsum(marks) - 1                                # (pair_cap,)
    g = jnp.clip(g, 0, P - 1)
    slot = jnp.arange(pair_cap, dtype=jnp.int32)
    slot_valid = slot < total

    # slot -> tile id via the gaussian's screen rect
    local = slot - offsets[g]
    rminx = proc.rect_min[g, 0]
    rminy = proc.rect_min[g, 1]
    rw = jnp.maximum(proc.rect_max[g, 0] - rminx, 1)
    tx = rminx + local % rw
    ty = rminy + local // rw
    tile = jnp.where(slot_valid, ty * grid_x + tx, num_tiles)

    # stable lexicographic (tile, depth) sort == reference 64-bit key sort
    depth = proc.depth[g].astype(jnp.float32)
    tile_s, depth_s, g_s = jax.lax.sort(
        (tile.astype(jnp.int32), depth, g.astype(jnp.int32)),
        num_keys=2,
        is_stable=True,
    )

    # per-tile counts / starts, chunk-padded packing
    tile_counts = (
        jnp.zeros((num_tiles + 1,), jnp.int32).at[tile].add(1, mode="drop")
    )[:num_tiles]
    tile_start = jnp.cumsum(tile_counts) - tile_counts
    # Every tile gets >= 1 chunk (even empty tiles) so the Pallas grid walk
    # initializes and emits every tile's state; padded_cap's num_tiles*chunk
    # headroom covers this worst case.
    padded_counts = jnp.maximum(((tile_counts + chunk - 1) // chunk) * chunk, chunk)
    padded_cumsum = jnp.cumsum(padded_counts)
    padded_start = padded_cumsum - padded_counts
    total_padded = padded_cumsum[-1]

    pair_valid_s = tile_s < num_tiles
    rank = jnp.arange(pair_cap, dtype=jnp.int32) - tile_start[
        jnp.clip(tile_s, 0, num_tiles - 1)
    ]
    dest = jnp.where(
        pair_valid_s,
        padded_start[jnp.clip(tile_s, 0, num_tiles - 1)] + rank,
        padded_cap,  # dropped
    )

    # gather per-pair attributes and scatter into the packed layout
    rows = jnp.zeros((pair_cap, ATTR_DIM), jnp.float32)
    rows = rows.at[:, A_X].set(proc.mean2d[g_s, 0])
    rows = rows.at[:, A_Y].set(proc.mean2d[g_s, 1])
    rows = rows.at[:, A_CA].set(proc.conic[g_s, 0])
    rows = rows.at[:, A_CB].set(proc.conic[g_s, 1])
    rows = rows.at[:, A_CC].set(proc.conic[g_s, 2])
    rows = rows.at[:, A_OP].set(proc.opacity[g_s])
    rows = rows.at[:, A_R].set(proc.rgb[g_s, 0])
    rows = rows.at[:, A_G].set(proc.rgb[g_s, 1])
    rows = rows.at[:, A_B].set(proc.rgb[g_s, 2])
    # depth re-gathered from proc (not the sort operand) so autodiff flows
    # through a plain gather; values are identical.
    rows = rows.at[:, A_DEPTH].set(proc.depth[g_s])
    rows = rows.at[:, A_VALID].set(pair_valid_s.astype(jnp.float32))

    attrs = jnp.zeros((padded_cap, ATTR_DIM), jnp.float32).at[dest].set(
        rows, mode="drop"
    )
    gid = jnp.full((padded_cap,), P, jnp.int32).at[dest].set(g_s, mode="drop")

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
