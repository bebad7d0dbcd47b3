"""Tile binning: (gaussian, tile) pair expansion, fused-key depth sort,
segment metadata for the blend walk.

The XLA-native replacement for the reference's CUB prefix-sum + 64-bit radix
sort pipeline (rasterizer_impl.cu:68-138,276-319).  Designed around the
measured v5e cost model (steady-state protocol, tools/profile_step.py —
dispatch-noise-free):

    lax.sort @3.4M       ~3-5 ms base + ~1 ms per extra carried operand
    cumsum / cummax      ~1 ms even at (4M, 16)
    elementwise          ~free
    random row gather    ~20 ms at 3.4M lookups (per-lookup bound: width
                         and index monotonicity do NOT matter)
    scalar scatter-add   ~2-5 ms at 1M updates; row scatter ~100 ms

Since a sort operand costs ~1 ms but a pair-scale gather costs ~20 ms, the
round-4 design carries the attribute channels THROUGH the pair sort and
keeps exactly ONE pair-scale gather in the forward and ONE in the backward:

1. per-gaussian data lives in ONE (P+1, 16) row table: 11 attribute
   channels (mean2d, conic, opacity, rgb, depth, valid) + 3 expansion
   channels (depth rank, packed rect corner, rect width — int32 bitcast
   into f32 lanes);
2. a P-scale double sort assigns every gaussian a *depth rank* (order by
   (depth_bits, index) — depth keys are raw IEEE-754 bits viewed as int,
   bit order == value order for positive floats, the exact trick the
   reference radix keys rely on, rasterizer_impl.cu:102-104; the index
   tie-break reproduces its stable radix order);
3. pair expansion: a P-scale mark scatter + pair-scale cumsum recovers each
   slot's owner gaussian, a cummax over marked slot indices recovers the
   owner's first slot (no offsets lookup needed), and ONE pair-scale row
   gather ``table[g]`` fetches everything else;
4. ONE single-key pair sort over the fused uint32 key
   ``tile << RANK_BITS | rank`` (falls back to a (tile, rank) 2-key sort
   when the bit budget doesn't fit), carrying the 11 attribute channels and
   the slot id (13 operands ~ 16 ms, vs 20 ms for the post-sort gather it
   replaces plus 6 ms for the inverse-permutation sort it makes redundant);
5. per-tile [start, end) ranges via binary search over the sorted keys;
6. NO packed/padded copy: the blend kernels walk the sorted pair stream
   directly, driven by SEGMENT metadata (chunk, tile, row range, k0) —
   at most num_tiles + num_chunks + 1 segments, built from small arrays;
7. the custom VJP re-sorts the cotangent rows by slot id (pairs of one
   gaussian are contiguous in slot order), prefix-sums once, and takes
   per-gaussian cumsum differences with ONE boundary gather at the P+1
   exclusive offsets (offsets[i+1] == offsets[i] + counts[i], so adjacent
   differences of a single gather give every per-gaussian sum, zero-count
   rows included) — the deterministic replacement for the reference
   backward's atomicAdd (backward.cu:537,574-583) with no row scatter.

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


# expansion channels of the combined row table (int32 carried in f32 lanes)
E_RANK, E_RECT, E_RW = 11, 12, 13
N_GRAD_CH = 10         # attr channels 0..9 carry gradient (valid does not)

# Integers ride in f32 lanes with the 2.0 exponent OR-ed into the bits, so
# every encoded value is a NORMAL float in [2, 4): raw bitcasts of small
# ints are denormals, which TPU data movement flushes to zero (verified on
# v5e — a plain bitcast+gather round trip corrupts the values).  Values must
# stay below 2^23 (the mantissa width).
_EXP_BIAS = 0x40000000


def _encode_i32(v):
    return jax.lax.bitcast_convert_type(
        v.astype(jnp.int32) | _EXP_BIAS, jnp.float32
    )


def _decode_i32(f):
    return jax.lax.bitcast_convert_type(f, jnp.int32) & 0x007FFFFF


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _expand_sort(ctable, g, owner_start, offsets_p1, total,
                 grid_x, num_tiles, rank_bits):
    """Expand (gaussian, tile) pairs and sort them into (tile, depth-rank)
    order, carrying the attribute channels through the sort.

    ``ctable`` (P+1, 16): 11 f32 attribute channels + 3 int32-bitcast
    expansion channels (depth rank, packed rect corner, rect width); row P
    is the zero sentinel.  ``g`` (pair_cap,) is each slot's owner gaussian,
    ``owner_start`` its first slot.  Returns (attrs_sorted, key_s, slot_s).
    ``rank_bits`` > 0 selects the fused single-key sort; 0 falls back to a
    2-key (tile, rank) sort (then key_s is the sorted tile id).

    The custom VJP replaces the sort+gather transpose XLA would emit with
    (a) a re-sort of the cotangent rows by slot id — pairs of one gaussian
    are contiguous in slot order, (b) one prefix sum, and (c) adjacent
    differences of ONE boundary gather at the P+1 exclusive offsets.
    Deterministic, like every JAX reduction — this is the role atomicAdd
    plays in the reference backward (backward.cu:537,574-583).
    """
    out, _ = _expand_sort_fwd(ctable, g, owner_start, offsets_p1, total,
                              grid_x, num_tiles, rank_bits)
    return out


def _expand_sort_fwd(ctable, g, owner_start, offsets_p1, total,
                     grid_x, num_tiles, rank_bits):
    pair_cap = g.shape[0]
    row = ctable[g]                              # ONE pair-scale gather
    rank = _decode_i32(row[:, E_RANK])
    rect = _decode_i32(row[:, E_RECT])
    rw = jnp.maximum(_decode_i32(row[:, E_RW]), 1)

    slot = jnp.arange(pair_cap, dtype=jnp.int32)
    valid = slot < total
    local = slot - owner_start
    tx = (rect & 0xFFF) + local % rw
    ty = (rect >> 12) + local // rw
    tile = jnp.where(valid, ty * grid_x + tx, num_tiles)
    attr_cols = [
        jnp.where(valid, row[:, i], 0.0) for i in range(ATTR_DIM - 5)
    ]

    if rank_bits > 0:
        key = (tile.astype(jnp.uint32) << rank_bits) | jnp.where(
            valid, rank, 0
        ).astype(jnp.uint32)
        out = jax.lax.sort((key, *attr_cols, slot), num_keys=1,
                           is_stable=False)
        key_s, cols_s, slot_s = out[0], out[1:-1], out[-1]
    else:
        rank_m = jnp.where(valid, rank, 0)
        out = jax.lax.sort((tile, rank_m, *attr_cols, slot), num_keys=2,
                           is_stable=False)
        key_s, cols_s, slot_s = out[0], out[2:-1], out[-1]

    attrs = jnp.stack(cols_s, axis=-1)
    attrs = jnp.concatenate(
        [attrs, jnp.zeros((pair_cap, 5), jnp.float32)], axis=-1
    )
    return (attrs, key_s, slot_s), (slot_s, offsets_p1, total,
                                    ctable.shape[0])


def _repack_cols(x, n_cols: int):
    """(pair_cap, 16) -> tuple of n_cols contiguous (pair_cap,) columns via
    ONE Pallas pass.

    Slicing the Pallas-backward's output column by column costs ten
    separate strided passes over the (pair_cap, 16) array (~2.8 ms each on
    v5e, trace-measured) because sort operands cannot fuse into a
    custom-call producer, and jnp transposes/optimization_barrier get
    folded right back into the slices by XLA.  A custom kernel is opaque
    to fusion, so the relayout happens exactly once (~1 ms HBM-bound).
    """
    from jax.experimental import pallas as pl

    pair_cap = x.shape[0]
    # XLA lays out big f32[N] buffers as T(1024) REGARDLESS of divisibility
    # (Mosaic then requires the out-block shape to be exactly 1024), so any
    # non-1024-multiple capacity must be padded up front.  Round 4 shipped a
    # largest-divisor block picker here; at the benchmark's pair_cap of
    # 4_000_000 (4_000_000 % 1024 == 256) it picked 256 and Mosaic refused
    # the kernel on hardware ("XLA layout ({0:T(1024)}) does not match
    # Mosaic layout ({0:T(256)})").  Padding keeps the kernel correct for
    # ANY capacity; callers that align pair_cap to 1024 skip the pad copy.
    block = 1024
    padded = ((pair_cap + block - 1) // block) * block
    if padded != pair_cap:
        x = jnp.concatenate(
            [x, jnp.zeros((padded - pair_cap, x.shape[1]), x.dtype)]
        )
    n_blocks = padded // block

    def kernel(x_ref, *out_refs):
        v = x_ref[:, :]                         # (block, 16)
        for c, o in enumerate(out_refs):
            o[:] = v[:, c]

    interpret = jax.default_backend() not in ("tpu",)
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((block, x.shape[1]), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((block,), lambda i: (i,))
                   for _ in range(n_cols)],
        out_shape=[jax.ShapeDtypeStruct((padded,), x.dtype)
                   for _ in range(n_cols)],
        interpret=interpret,
    )(x)
    if padded != pair_cap:
        outs = [o[:pair_cap] for o in outs]
    return outs


def _expand_sort_bwd(grid_x, num_tiles, rank_bits, res, d):
    slot_s, offsets_p1, total, p1 = res
    d_attrs, _, _ = d
    pair_cap = slot_s.shape[0]
    # (a) cotangent rows back to slot order: slot_s is a permutation of
    # [0, pair_cap), so one sort keyed on it inverts the pair sort; the
    # sort operands come from one fusion-opaque repack pass (_repack_cols)
    d_cols = _repack_cols(d_attrs, N_GRAD_CH)
    out = jax.lax.sort((slot_s, *d_cols), num_keys=1, is_stable=False)
    d_slot = jnp.stack(out[1:], axis=-1)         # (pair_cap, N_GRAD_CH)
    # (b) rows past the live range are garbage (the Pallas backward never
    # writes chunks beyond the last live segment)
    live = jnp.arange(pair_cap, dtype=jnp.int32) < total
    d_slot = jnp.where(live[:, None], d_slot, 0.0)
    cs = jnp.cumsum(d_slot, axis=0)
    cs = jnp.concatenate(
        [jnp.zeros((1, N_GRAD_CH), d_slot.dtype), cs], axis=0
    )
    # (c) ONE boundary gather: offsets_p1[i+1] == offsets_p1[i] + counts[i],
    # so adjacent differences give every per-gaussian sum (zero-count rows
    # difference to exactly 0)
    csb = cs[jnp.clip(offsets_p1, 0, pair_cap)]  # (P+1, N_GRAD_CH)
    d_rows = csb[1:] - csb[:-1]                  # (P, N_GRAD_CH)
    d_ctable = jnp.concatenate(
        [d_rows, jnp.zeros((p1 - 1, ATTR_DIM - N_GRAD_CH), d_rows.dtype)],
        axis=-1,
    )
    d_ctable = jnp.concatenate(
        [d_ctable, jnp.zeros((1, ATTR_DIM), d_rows.dtype)], axis=0
    )
    zint = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (d_ctable, zint(jnp.zeros(pair_cap, jnp.int32)),
            zint(jnp.zeros(pair_cap, jnp.int32)), zint(offsets_p1),
            zint(total))


_expand_sort.defvjp(_expand_sort_fwd, _expand_sort_bwd)


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
    if P >= (1 << 23) or grid_x >= (1 << 12) or grid_y >= (1 << 11):
        raise ValueError(
            f"binning encode budget exceeded: P={P} (< 2^23), "
            f"grid=({grid_x},{grid_y}) (< 4096 x 2048)"
        )
    pair_cap = ((pair_cap + chunk - 1) // chunk) * chunk   # chunk-align
    n_chunks = pair_cap // chunk

    counts = proc.tiles_touched.astype(jnp.int32)            # (P,)
    cum = jnp.cumsum(counts)
    total = cum[-1]
    offsets = cum - counts                                   # exclusive
    offsets_p1 = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum])

    depth_bits = jax.lax.bitcast_convert_type(
        jax.lax.stop_gradient(proc.depth), jnp.int32
    )

    # ---- depth rank: two cheap P-scale sorts (~0.4 ms each at 1M) give a
    # dense 0..P-1 rank in (depth_bits, index) order, turning the pair sort
    # into a single fused-key sort
    iota_p = jnp.arange(P, dtype=jnp.int32)
    _, perm = jax.lax.sort((depth_bits, iota_p), num_keys=2, is_stable=False)
    _, rank_of = jax.lax.sort((perm, iota_p), num_keys=1, is_stable=False)

    # ---- combined row table: 11 attr channels + 3 int expansion channels
    # (exponent-biased, see _encode_i32).  Packing budget: tile x < 2^12,
    # tile y < 2^11, so images up to 65536 x 32768 px at tile_size 16.
    sg = jax.lax.stop_gradient
    fbits = lambda x: sg(_encode_i32(x))
    rect_packed = proc.rect_min[:, 0] | (proc.rect_min[:, 1] << 12)
    rect_w = jnp.maximum(proc.rect_max[:, 0] - proc.rect_min[:, 0], 1)
    attr_table = gaussian_attr_table(proc)                   # (P+1, 16)
    pad1 = lambda c: jnp.concatenate([c, jnp.zeros((1,), c.dtype)])
    ctable = jnp.concatenate(
        [
            attr_table[:, : ATTR_DIM - 5],
            jnp.stack(
                [pad1(fbits(rank_of)), pad1(fbits(rect_packed)),
                 pad1(fbits(rect_w))],
                axis=-1,
            ),
            jnp.zeros((P + 1, 2), jnp.float32),
        ],
        axis=-1,
    )

    # ---- pair expansion indices: owner gaussian per slot via mark scatter +
    # cumsum; owner's first slot via cummax over marked slot ids (no offsets
    # lookup).  offsets[0] == 0, so slot 0 is always marked.
    marks = jnp.zeros((pair_cap,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, P - 1)
    slot = jnp.arange(pair_cap, dtype=jnp.int32)
    owner_start = jax.lax.cummax(jnp.where(marks > 0, slot, 0))

    # ---- ONE pair sort carrying the attribute lanes.  Order (tile, rank)
    # == the reference's stable radix order over (tileID, depth_bits) with
    # index tie-breaks.
    rank_bits = _ceil_log2(P)
    tile_bits = _ceil_log2(num_tiles + 1)
    if rank_bits + tile_bits > 32:
        rank_bits = 0                              # 2-key fallback
    attrs, key_s, _slot_s = _expand_sort(
        ctable, g, owner_start, offsets_p1, total,
        grid_x, num_tiles, rank_bits,
    )
    if rank_bits > 0:
        bounds = jnp.arange(num_tiles + 1, dtype=jnp.uint32) << rank_bits
    else:
        bounds = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    edges = jnp.searchsorted(
        jax.lax.stop_gradient(key_s), bounds, side="left"
    ).astype(jnp.int32)
    tile_start = edges[:num_tiles]
    tile_end = edges[1:]

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
