"""Tile binning: (gaussian, tile) pair expansion, fused-key depth sort,
segment metadata for the blend walk.

The XLA-native replacement for the reference's CUB prefix-sum + 64-bit radix
sort pipeline (rasterizer_impl.cu:68-138,276-319).  Redesigned (round 3)
around a TPU cost model measured on v5e at 4M pairs (tools/profile_binning4):

    lax.sort             ~2.4 ms per carried operand
    cumsum               <1 ms even at (4M, 16)
    elementwise          ~free
    random row gather    ~20 ms REGARDLESS of row width (per-lookup bound)
    scatter              ~19 ms (int32) .. ~100 ms (rows)

so the design keeps exactly TWO pair-scale gathers (the expansion row
gather and the final attribute gather), moves everything else through
sorts/cumsums, and drops the round-2 chunk-padded packing entirely:

1. per-gaussian attributes live in ONE (P+1, 16) table (row P is an all-zero
   sentinel with valid=0);
2. a P-scale double sort assigns every gaussian a *depth rank* (order by
   (depth_bits, index) — depth keys are raw IEEE-754 bits viewed as int,
   bit order == value order for positive floats, the exact trick the
   reference radix keys rely on, rasterizer_impl.cu:102-104; the index
   tie-break reproduces its stable radix order);
3. pair expansion: one P-scale mark scatter + cumsum recovers each slot's
   owner, one pair-scale row gather fetches (offset, rank, rect) per slot;
4. ONE single-key pair sort over the fused uint32 key
   ``tile << RANK_BITS | rank`` (falls back to a (tile, rank) 2-key sort
   when the bit budget doesn't fit), carrying (gaussian id, slot);
5. per-tile [start, end) ranges via binary search over the sorted keys;
6. NO packed/padded copy: the blend kernels walk the sorted pair stream
   directly, driven by SEGMENT metadata (chunk, tile, row range, k0) —
   at most num_tiles + num_chunks + 1 segments, built from small arrays;
7. sorted attrs come from one row gather ``table[g_s]`` wrapped in a custom
   VJP whose backward is gather-to-slot-order + cumsum-difference segment
   sums — the deterministic replacement for the reference backward's
   atomicAdd (backward.cu:537,574-583) with no scatter-add anywhere.

Static capacity ``pair_cap`` replaces the reference's device-side buffer
resizing (rasterizer_impl.cu:281-282); overflow is reported for host-side
re-tracing.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.types import ProcessedGaussians

ATTR_DIM = 16
A_X, A_Y, A_CA, A_CB, A_CC, A_OP, A_R, A_G, A_B, A_DEPTH, A_VALID = range(11)


class TileBins(NamedTuple):
    """Depth-sorted pair stream + segment metadata for the blend walk.

    A *segment* is a maximal run of pairs that live in one chunk AND one
    tile; every tile has at least one (possibly zero-length) segment, so
    the blend initializes every tile's state.  Inactive padding segments
    point at the trash tile ``num_tiles`` with an empty row range.
    """

    attrs: jax.Array      # (pair_cap, ATTR_DIM) f32, (tile, depth)-sorted
    seg_chunk: jax.Array  # (seg_cap,) i32 chunk holding the segment's rows
    seg_tile: jax.Array   # (seg_cap,) i32 tile (num_tiles = trash)
    seg_k0: jax.Array     # (seg_cap,) i32 within-tile pair index of seg row 0
    seg_lo: jax.Array     # (seg_cap,) i32 first row within the chunk
    seg_hi: jax.Array     # (seg_cap,) i32 one-past-last row within the chunk
    num_pairs: jax.Array  # scalar i32: true pair count
    overflow: jax.Array   # scalar bool: pair_cap exceeded -> output invalid


def num_tiles_for(height: int, width: int, tile_size: int) -> tuple[int, int]:
    return (
        (width + tile_size - 1) // tile_size,
        (height + tile_size - 1) // tile_size,
    )


def seg_capacity(num_tiles: int, pair_cap: int, chunk: int) -> int:
    """Static segment-list capacity: one first-segment per tile, at most one
    continuation segment per chunk, plus one guaranteed trash segment."""
    return num_tiles + pair_cap // chunk + 1


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


@jax.custom_vjp
def sorted_gather(table, g_s, slot2sorted, offsets, counts, total):
    """attrs = table[g_s] with a scatter-free backward.

    The VJP of a plain gather is an XLA scatter-add (~420 ms at 4M x 16 on
    v5e).  Here the cotangent is instead (a) gathered back to *slot order*
    (pairs of one gaussian are contiguous slots by construction of the
    expansion), (b) masked to the live range, (c) prefix-summed once, and
    (d) segment-reduced by cumsum-difference at the per-gaussian slot
    ranges.  Deterministic, like every JAX reduction — this is the role
    atomicAdd plays in the reference backward (backward.cu:537,574-583).
    """
    del slot2sorted, offsets, counts, total
    return table[g_s]


def _sorted_gather_fwd(table, g_s, slot2sorted, offsets, counts, total):
    return table[g_s], (g_s, slot2sorted, offsets, counts, total)


def _sorted_gather_bwd(res, d):
    g_s, slot2sorted, offsets, counts, total = res
    pair_cap = g_s.shape[0]
    # (a) cotangent rows in slot order
    d_slot = jnp.take(d, slot2sorted, axis=0, mode="fill", fill_value=0.0)
    # (b) rows past the live pair range are garbage (the Pallas backward
    # never writes chunks beyond the last live segment) — zero them here so
    # the prefix sums below stay clean
    live = jnp.arange(pair_cap, dtype=jnp.int32) < total
    d_slot = jnp.where(live[:, None], d_slot, 0.0)
    # (c) one prefix sum over all pair slots
    cs = jnp.cumsum(d_slot, axis=0)
    cs = jnp.concatenate([jnp.zeros((1, d.shape[1]), d.dtype), cs], axis=0)
    # (d) per-gaussian segment sums = cs[end] - cs[start]
    lo = jnp.clip(offsets, 0, pair_cap)
    hi = jnp.clip(offsets + counts, 0, pair_cap)
    d_rows = cs[hi] - cs[lo]
    d_table = jnp.concatenate(
        [d_rows, jnp.zeros((1, d.shape[1]), d.dtype)], axis=0
    )
    zint = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (d_table, zint(g_s), zint(slot2sorted), zint(offsets),
            zint(counts), zint(total))


sorted_gather.defvjp(_sorted_gather_fwd, _sorted_gather_bwd)


def _ceil_log2(n: int) -> int:
    return max(1, int(np.ceil(np.log2(max(n, 2)))))


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
    pair_cap = ((pair_cap + chunk - 1) // chunk) * chunk   # chunk-align
    n_chunks = pair_cap // chunk

    counts = proc.tiles_touched.astype(jnp.int32)            # (P,)
    cum = jnp.cumsum(counts)
    total = cum[-1]
    offsets = cum - counts                                   # exclusive

    depth_bits = jax.lax.bitcast_convert_type(
        jax.lax.stop_gradient(proc.depth), jnp.int32
    )

    # ---- depth rank: two cheap P-scale sorts (~0.4 ms each at 1M) give a
    # dense 0..P-1 rank in (depth_bits, index) order, turning the pair sort
    # into a single fused-key sort
    iota_p = jnp.arange(P, dtype=jnp.int32)
    _, perm = jax.lax.sort((depth_bits, iota_p), num_keys=2, is_stable=False)
    _, rank_of = jax.lax.sort((perm, iota_p), num_keys=1, is_stable=False)

    # ---- pair expansion: owner gaussian per slot via mark scatter + cumsum
    # (the only pair-scale scatter left), then ONE packed row gather for the
    # per-gaussian expansion data
    gtab = jnp.stack(
        [
            offsets,
            rank_of,
            proc.rect_min[:, 0] | (proc.rect_min[:, 1] << 16),
            jnp.maximum(proc.rect_max[:, 0] - proc.rect_min[:, 0], 1),
        ],
        axis=-1,
    )
    marks = jnp.zeros((pair_cap,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, P - 1)
    slot = jnp.arange(pair_cap, dtype=jnp.int32)
    slot_valid = slot < total

    row = gtab[g]                                            # (pair_cap, 4)
    local = slot - row[:, 0]
    rw = row[:, 3]
    tx = (row[:, 2] & 0xFFFF) + local % rw
    ty = (row[:, 2] >> 16) + local // rw
    tile = jnp.where(slot_valid, ty * grid_x + tx, num_tiles)
    rank = row[:, 1]
    g_v = jnp.where(slot_valid, g, P)

    # ---- ONE pair sort.  Order (tile, rank) == the reference's stable
    # radix order over (tileID, depth_bits) with index tie-breaks.
    rank_bits = _ceil_log2(P)
    tile_bits = _ceil_log2(num_tiles + 1)
    if rank_bits + tile_bits <= 32:
        key = (tile.astype(jnp.uint32) << rank_bits) | jnp.where(
            slot_valid, rank, 0
        ).astype(jnp.uint32)
        key_s, g_s, slot_s = jax.lax.sort(
            (key, g_v, slot), num_keys=1, is_stable=False
        )
        bounds = (
            jnp.arange(num_tiles + 1, dtype=jnp.uint32) << rank_bits
        )
        edges = jnp.searchsorted(key_s, bounds, side="left").astype(jnp.int32)
    else:
        tile_s, _, g_s, slot_s = jax.lax.sort(
            (tile, rank, g_v, slot), num_keys=2, is_stable=False
        )
        edges = jnp.searchsorted(
            tile_s, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
    tile_start = edges[:num_tiles]
    tile_end = edges[1:]

    # original slot -> sorted position (for the backward's re-gather):
    # slot_s is a permutation of [0, pair_cap), so sorting (slot_s, j)
    # yields the inverse directly — a sort (~6 ms at 4M) instead of a
    # random int32 scatter (~19 ms)
    _, slot2sorted = jax.lax.sort((slot_s, slot), num_keys=1, is_stable=False)

    attrs = sorted_gather(
        gaussian_attr_table(proc), g_s, slot2sorted, offsets, counts, total
    )

    # ---- segment metadata (all small arrays: num_tiles + n_chunks + 1).
    # Tile-first segments: tile t's rows from its start to the next chunk
    # boundary (zero-length for empty tiles, which still initializes their
    # state block).  Continuation segments: one per chunk boundary that
    # falls inside a tile's range.
    t_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    nb = (tile_start // chunk + 1) * chunk
    lo_t = tile_start
    hi_t = jnp.minimum(tile_end, nb)
    k0_t = jnp.zeros((num_tiles,), jnp.int32)

    c_ids = jnp.arange(n_chunks, dtype=jnp.int32)
    s = c_ids * chunk
    u = jnp.clip(
        jnp.searchsorted(tile_start, s, side="right").astype(jnp.int32) - 1,
        0, num_tiles - 1,
    )
    live_c = (s < total) & (tile_start[u] < s) & (tile_end[u] > s)
    lo_c = jnp.where(live_c, s, pair_cap)
    hi_c = jnp.where(live_c, jnp.minimum(tile_end[u], s + chunk), pair_cap)
    tile_c = jnp.where(live_c, u, num_tiles)
    k0_c = jnp.where(live_c, s - tile_start[u], 0)

    # one guaranteed trash segment so the trash state block is always
    # initialized (avoids NaN garbage reaching finalize's backward)
    one = lambda v: jnp.full((1,), v, jnp.int32)
    lo_all = jnp.concatenate([lo_t, lo_c, one(pair_cap)])
    hi_all = jnp.concatenate([hi_t, hi_c, one(pair_cap)])
    tile_all = jnp.concatenate([t_ids, tile_c, one(num_tiles)])
    k0_all = jnp.concatenate([k0_t, k0_c, one(0)])

    lo_s2, tile_s2, hi_s2, k0_s2 = jax.lax.sort(
        (lo_all, tile_all, hi_all, k0_all), num_keys=2, is_stable=False
    )
    seg_chunk = jnp.clip(lo_s2 // chunk, 0, n_chunks - 1)

    overflow = total > pair_cap
    return TileBins(
        attrs=attrs,
        seg_chunk=seg_chunk,
        seg_tile=tile_s2,
        seg_k0=k0_s2,
        seg_lo=lo_s2 - seg_chunk * chunk,
        seg_hi=hi_s2 - seg_chunk * chunk,
        num_pairs=total,
        overflow=overflow,
    )
