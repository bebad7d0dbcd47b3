"""Tile binning: (gaussian, tile) pair expansion, depth ordering, chunk-aligned
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

Two permutation strategies produce that identical order:

``method="sort"``     one stable lexicographic (tile, depth) sort over the
                      whole pair buffer.  Simple; the pair-level sort
                      dominates the render at scale.
``method="counting"`` the TPU-friendly default: depth-sort the *gaussians*
                      (P elements, not pairs), expand pairs in sorted order —
                      so within any tile pairs already appear in depth order —
                      then stable counting-sort by tile: segment the pair
                      buffer, sort each segment by tile id (one batched
                      lax.sort over rows), and compute each pair's global
                      within-tile rank from two small (segments x tiles)
                      cumsum tables.  Replaces the O(n log^2 n) pair sort
                      with O(P log^2 P + n log^2 L) work, L = segment length.

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

SEGMENT = 4096   # counting-sort segment length


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


def _expand_slots(counts, pair_cap, P):
    """slot -> index into the gaussian list, via the scatter+cumsum trick:
    a marker at each gaussian's first slot, inclusive-cumsum-1 recovers the
    owner of every slot (zero-count gaussians collapse naturally)."""
    cum = jnp.cumsum(counts)
    total = cum[-1]
    offsets = cum - counts
    marks = jnp.zeros((pair_cap,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, P - 1)
    slot = jnp.arange(pair_cap, dtype=jnp.int32)
    return g, slot - offsets[g], slot < total, total


def _slot_tiles(rect_min, rect_max, g, local, valid, grid_x, num_tiles):
    rminx = rect_min[g, 0]
    rminy = rect_min[g, 1]
    rw = jnp.maximum(rect_max[g, 0] - rminx, 1)
    tx = rminx + local % rw
    ty = rminy + local // rw
    return jnp.where(valid, ty * grid_x + tx, num_tiles)


def _packing(tile, num_tiles, chunk, pair_cap):
    """Per-tile counts and chunk-aligned packed starts."""
    tile_counts = (
        jnp.zeros((num_tiles + 1,), jnp.int32).at[tile].add(1, mode="drop")
    )[:num_tiles]
    # every tile gets >= 1 chunk; padded_cap's num_tiles*chunk headroom
    # covers this worst case
    padded_counts = jnp.maximum(
        ((tile_counts + chunk - 1) // chunk) * chunk, chunk
    )
    padded_cumsum = jnp.cumsum(padded_counts)
    return tile_counts, padded_counts, padded_cumsum - padded_counts, padded_cumsum[-1]


def build_tile_bins(
    proc: ProcessedGaussians,
    height: int,
    width: int,
    tile_size: int,
    pair_cap: int,
    chunk: int,
    method: str = "counting",
) -> TileBins:
    """All int/shape logic is non-differentiable except the gathered attribute
    values; gradients flow through the final gathers only."""
    grid_x, grid_y = num_tiles_for(height, width, tile_size)
    num_tiles = grid_x * grid_y
    P = proc.depth.shape[0]
    # counting method segments the pair buffer
    if method == "counting":
        pair_cap = ((pair_cap + SEGMENT - 1) // SEGMENT) * SEGMENT
    padded_cap = pair_cap + num_tiles * chunk
    num_chunks_cap = padded_cap // chunk

    counts = proc.tiles_touched.astype(jnp.int32)            # (P,)

    if method == "counting":
        # ---- 1. depth-sort the gaussians (stable; ties -> index order) ----
        depth_key = jnp.where(proc.visible, proc.depth, jnp.inf).astype(
            jnp.float32
        )
        _, order = jax.lax.sort(
            (depth_key, jnp.arange(P, dtype=jnp.int32)),
            num_keys=1,
            is_stable=True,
        )
        counts_s = counts[order]
        g_sorted_idx, local, slot_valid, total = _expand_slots(
            counts_s, pair_cap, P
        )
        g = order[g_sorted_idx]                              # slot -> gaussian
        tile = _slot_tiles(
            proc.rect_min, proc.rect_max, g, local, slot_valid,
            grid_x, num_tiles,
        )
        tile_counts, padded_counts, padded_start, total_padded = _packing(
            tile, num_tiles, chunk, pair_cap
        )

        # ---- 2. segmented stable counting sort by tile ----
        S = pair_cap // SEGMENT
        tile2d = tile.reshape(S, SEGMENT)
        idx2d = jnp.arange(pair_cap, dtype=jnp.int32).reshape(S, SEGMENT)
        tile_sorted, idx_sorted = jax.lax.sort(
            (tile2d, idx2d), num_keys=1, dimension=1, is_stable=True
        )
        seg_ids = jnp.arange(S, dtype=jnp.int32)[:, None]
        counts2d = (
            jnp.zeros((S, num_tiles + 1), jnp.int32)
            .at[seg_ids, tile2d]
            .add(1)
        )
        within_start = jnp.cumsum(counts2d, axis=1) - counts2d   # excl over tiles
        seg_offset = jnp.cumsum(counts2d, axis=0) - counts2d     # excl over segs
        j = jnp.arange(SEGMENT, dtype=jnp.int32)[None, :]
        rank = (
            jnp.take_along_axis(seg_offset, tile_sorted, axis=1)
            + j
            - jnp.take_along_axis(within_start, tile_sorted, axis=1)
        )
        in_range = tile_sorted < num_tiles
        dest2d = jnp.where(
            in_range,
            padded_start[jnp.clip(tile_sorted, 0, num_tiles - 1)] + rank,
            padded_cap,
        )
        dest = dest2d.reshape(-1)
        g_s = g[idx_sorted.reshape(-1)]
        pair_valid_s = in_range.reshape(-1)
    else:
        g, local, slot_valid, total = _expand_slots(counts, pair_cap, P)
        tile = _slot_tiles(
            proc.rect_min, proc.rect_max, g, local, slot_valid,
            grid_x, num_tiles,
        )
        depth = proc.depth[g].astype(jnp.float32)
        tile_s, _, g_s = jax.lax.sort(
            (tile.astype(jnp.int32), depth, g.astype(jnp.int32)),
            num_keys=2,
            is_stable=True,
        )
        tile_counts, padded_counts, padded_start, total_padded = _packing(
            tile, num_tiles, chunk, pair_cap
        )
        tile_start = jnp.cumsum(tile_counts) - tile_counts
        pair_valid_s = tile_s < num_tiles
        rank = jnp.arange(pair_cap, dtype=jnp.int32) - tile_start[
            jnp.clip(tile_s, 0, num_tiles - 1)
        ]
        dest = jnp.where(
            pair_valid_s,
            padded_start[jnp.clip(tile_s, 0, num_tiles - 1)] + rank,
            padded_cap,
        )

    # ---- gather per-pair attributes and scatter into the packed layout ----
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
