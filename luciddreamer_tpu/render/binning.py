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
  index) — identical to the reference's stable radix sort over
  ``tileID<<32 | float_bits(depth)`` keys for positive depths.  The depth
  key is the raw IEEE-754 bit pattern viewed as int32 (bit order == value
  order for positive floats — the exact trick the reference keys rely on,
  rasterizer_impl.cu:102-104), and the gaussian index is a third sort key,
  so equal-depth ties break exactly like the reference's stable radix sort.

Memory-movement design (profiled on TPU v5e at 1M gaussians / 3.5M pairs):
XLA *random scatters* are the enemy — a 4M-element int32 scatter costs
~48 ms while the same data moved by gather or sort costs ~10 ms.  So:

1. per-gaussian attributes live in ONE (P+1, 16) table (row P is an all-zero
   sentinel with valid=0) — sequential writes;
2. pair expansion uses the scatter+cumsum trick (the only pair-scale scatter
   left: 1M one-int marks into the slot axis);
3. ONE unstable 3-int-key (tile, depth_bits, gaussian) lax.sort carrying
   slot and gaussian id;
4. per-tile ranges come from searchsorted over the sorted tile keys (a
   scatter-add histogram costs ~36 ms; binary search is free);
5. the slot -> packed map needed by the backward is recovered with a second
   (permutation-key, dest) sort (~16 ms cheaper than the random scatter at
   4M pairs); the packed gaussian ids keep a direct monotone scatter —
   a closed-form gather formulation measured slower;
6. packed attrs are a contiguous row GATHER from the table, wrapped in a
   custom VJP whose backward is gather + cumsum-difference segment sums —
   the deterministic replacement for the reference backward's atomicAdd
   (backward.cu:537,574-583) that never touches an XLA scatter-add.
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def packed_gather(table, gid, slot2packed, offsets, counts, pair_cap):
    """attrs = table[gid] with a scatter-free backward.

    The VJP of a plain gather is an XLA scatter-add (~420 ms at 4M x 16 on
    v5e).  Here the cotangent is instead (a) gathered back to *slot order*
    (pairs of one gaussian are contiguous slots by construction of the
    expansion), (b) prefix-summed once, and (c) segment-reduced by
    cumsum-difference at the per-gaussian slot ranges (~70 ms total).
    Deterministic, like every JAX reduction — this is the role atomicAdd
    plays in the reference backward (backward.cu:537,574-583).
    """
    del slot2packed, offsets, counts, pair_cap
    return table[gid]


def _packed_gather_fwd(table, gid, slot2packed, offsets, counts, pair_cap):
    return table[gid], (gid, slot2packed, offsets, counts, table.shape[0])


def _packed_gather_bwd(pair_cap, res, d):
    gid, slot2packed, offsets, counts, rows = res
    # (a) cotangent rows in slot order; out-of-range (invalid slot / dropped
    # pair) indices read zero
    d_slot = jnp.take(d, slot2packed, axis=0, mode="fill", fill_value=0.0,
                      indices_are_sorted=False, unique_indices=False)
    # (b) one prefix sum over all pair slots
    cs = jnp.cumsum(d_slot, axis=0)
    cs = jnp.concatenate([jnp.zeros((1, d.shape[1]), d.dtype), cs], axis=0)
    # (c) per-gaussian segment sums = cs[end] - cs[start]
    lo = jnp.clip(offsets, 0, pair_cap)
    hi = jnp.clip(offsets + counts, 0, pair_cap)
    d_rows = cs[hi] - cs[lo]
    d_table = jnp.concatenate(
        [d_rows, jnp.zeros((1, d.shape[1]), d.dtype)], axis=0
    )
    zint = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return d_table, zint(gid), zint(slot2packed), zint(offsets), zint(counts)


packed_gather.defvjp(_packed_gather_fwd, _packed_gather_bwd)


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
    padded_cap = pair_cap + num_tiles * chunk
    num_chunks_cap = padded_cap // chunk

    counts = proc.tiles_touched.astype(jnp.int32)            # (P,)
    cum = jnp.cumsum(counts)
    total = cum[-1]
    offsets = cum - counts                                   # exclusive

    # depth sort key: the raw float32 bit pattern as int32 — monotone in the
    # value for positive floats (depth > near-plane guarantees positive),
    # the same property the reference's radix keys exploit
    # (rasterizer_impl.cu:102-104).  No argsort / rank pass needed.
    depth_bits = jax.lax.bitcast_convert_type(
        jax.lax.stop_gradient(proc.depth), jnp.int32
    )

    # slot -> gaussian id (scatter one marker per gaussian, cumsum recovers
    # the owner of every slot)
    marks = jnp.zeros((pair_cap,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, P - 1)
    slot = jnp.arange(pair_cap, dtype=jnp.int32)
    slot_valid = slot < total

    # per-slot gaussian info through ONE packed (P, 4) row gather:
    # [pair offset, depth bits, rect_min_x | rect_min_y << 16, rect width]
    gtab = jnp.stack(
        [
            offsets,
            depth_bits,
            proc.rect_min[:, 0] | (proc.rect_min[:, 1] << 16),
            jnp.maximum(proc.rect_max[:, 0] - proc.rect_min[:, 0], 1),
        ],
        axis=-1,
    )
    row = gtab[g]                                            # (pair_cap, 4)
    local = slot - row[:, 0]
    rw = row[:, 3]
    tx = (row[:, 2] & 0xFFFF) + local % rw
    ty = (row[:, 2] >> 16) + local // rw
    tile = jnp.where(slot_valid, ty * grid_x + tx, num_tiles)

    # ONE unstable 3-int-key sort; the gaussian-index key makes the order a
    # total one, so equal depths tie-break exactly like the reference's
    # stable radix sort (pair emission order == gaussian index order)
    tile_s, _, g_s, slot_s = jax.lax.sort(
        (tile, row[:, 1], g, slot), num_keys=3, is_stable=False
    )

    # per-tile [start, count) from binary search over the sorted tile keys
    edges = jnp.searchsorted(
        tile_s, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_start = edges[:num_tiles]
    tile_counts = edges[1:] - edges[:-1]

    # every tile gets >= 1 chunk so the blend grid walk initializes and
    # emits every tile's state; padded_cap's headroom covers this
    padded_counts = jnp.maximum(
        ((tile_counts + chunk - 1) // chunk) * chunk, chunk
    )
    padded_cumsum = jnp.cumsum(padded_counts)
    padded_start = padded_cumsum - padded_counts
    total_padded = padded_cumsum[-1]

    # sorted position j -> packed destination (closed form, no histogram).
    # dest is strictly increasing over valid pairs (tile_s is sorted and
    # within a tile dest steps by 1), which is what makes the two inverse
    # maps below expressible without random scatters.
    pair_valid_s = tile_s < num_tiles
    tile_cl = jnp.minimum(tile_s, num_tiles - 1)
    j = jnp.arange(pair_cap, dtype=jnp.int32)
    dest = jnp.where(
        pair_valid_s, padded_start[tile_cl] + (j - tile_start[tile_cl]),
        padded_cap,
    )
    # original slot -> packed destination (for the backward's re-gather):
    # slot_s is a permutation of [0, pair_cap), so sorting (slot_s, dest)
    # by the first operand yields slot2packed directly — a sort (~10 ms at
    # 4M) instead of a random int32 scatter (~48 ms)
    _, slot2packed = jax.lax.sort((slot_s, dest), num_keys=1, is_stable=False)

    # chunk -> (tile, k0): scatter+cumsum over the (small) chunk axis
    tile_chunk_start = padded_start // chunk
    tile_num_chunks = padded_counts // chunk
    cmarks = (
        jnp.zeros((num_chunks_cap,), jnp.int32)
        .at[tile_chunk_start]
        .add(1, mode="drop")
    )
    chunk_tile_raw = jnp.clip(jnp.cumsum(cmarks) - 1, 0, num_tiles - 1)
    chunk_idx = jnp.arange(num_chunks_cap, dtype=jnp.int32)
    chunk_in_range = chunk_idx < (total_padded // chunk)
    chunk_k0 = (chunk_idx - tile_chunk_start[chunk_tile_raw]) * chunk
    chunk_tile = jnp.where(chunk_in_range, chunk_tile_raw, num_tiles)

    # packed gaussian ids: one direct 4-byte scatter (padding slots keep the
    # sentinel P and gather the zero attr row).  A closed-form gather
    # formulation (gid[p] = g_s[tile_start[t] + p - padded_start[t]]) was
    # measured 110 ms SLOWER at 4M pairs — the three chained index gathers
    # cost more than one monotone scatter.
    gid = (
        jnp.full((padded_cap,), P, jnp.int32)
        .at[dest]
        .set(g_s, mode="drop")
    )
    attrs = packed_gather(
        gaussian_attr_table(proc), gid, slot2packed, offsets, counts, pair_cap
    )

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
