"""Pallas TPU tile-blend kernels: pipelined forward + custom-VJP backward.

The production counterpart of the reference CUDA blend kernels
(forward.cu:261-421, backward.cu:398-586), designed for the TPU memory
hierarchy rather than translated:

* grid = tile *segments* of the depth-sorted pair stream (from
  render.binning): a segment is a run of rows inside one (chunk, tile).
  Pallas double-buffers the (chunk, 16) attribute slabs HBM->VMEM while the
  VPU composites the previous slab; consecutive segments of one chunk reuse
  the resident slab;
* the per-segment tile id is a scalar-prefetch operand, and the *output
  block index* is ``seg_tile[i]``: all segments of a tile map to the same
  (8, tile_pixels) state block, which therefore stays resident in VMEM for
  the whole tile walk and is flushed to HBM exactly once per tile —
  the VMEM-locality role of the reference's per-tile shared-memory loop;
* rows outside the segment's [lo, hi) range are masked out of the commit
  set (they belong to neighboring tiles sharing the chunk);
* per-pixel early termination (T < 1e-4) uses a sticky done row in the
  state block instead of a thread-local break;
* the backward kernel re-walks segments front-to-back, recovering each
  pair's pre-transmittance with an in-chunk prefix product and the suffix
  term sum_{j>i} w_j q_j from the saved per-tile totals (algebraically
  identical to the reference's back-to-front T/(1-alpha) unwind,
  backward.cu:517-563, including the background term and the
  disabled-in-reference depth path); each (gaussian, tile) pair writes its
  gradient to its own sorted-stream row, so there are NO atomics — the
  pair->Gaussian reduction is the VJP of the binning gather (a cumsum
  difference in slot order).

Layouts (all natural, no in-kernel transposes):
  attrs   (pair_cap, 16) f32     -> blocks (chunk, 16), gaussians on sublanes
  state   (num_tiles+1, 8, npix) -> blocks (1, 8, npix), pixels on lanes
  chunk math (chunk, npix): gaussians on sublanes, pixels on lanes.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from luciddreamer_tpu.render import blend_math
from luciddreamer_tpu.render.binning import (
    ATTR_DIM,
    A_B,
    A_CA,
    A_CB,
    A_CC,
    A_DEPTH,
    A_G,
    A_OP,
    A_R,
    A_VALID,
    A_X,
    A_Y,
    TileBins,
)

STATE_ROWS = 8
S_T, S_R, S_G, S_B, S_D, S_ACC, S_DONE, S_NC = range(STATE_ROWS)

ALPHA_CLAMP = blend_math.ALPHA_CLAMP
ALPHA_MIN = blend_math.ALPHA_MIN
T_MIN = blend_math.T_MIN


def _shift_down(x, d, fill, axis=0):
    """y[i] = x[i-d] (fill for i < d), along ``axis``."""
    n = x.shape[axis]
    pad = jnp.full(x.shape[:axis] + (d,) + x.shape[axis + 1 :], fill, x.dtype)
    return jnp.concatenate(
        [pad, jax.lax.slice_in_dim(x, 0, n - d, axis=axis)], axis=axis
    )


def _inclusive_scan(x, op, identity, axis=0):
    """Hillis-Steele inclusive scan along sublanes (log2(n) shifted ops)."""
    n = x.shape[axis]
    y = x
    d = 1
    while d < n:
        y = op(y, _shift_down(y, d, identity, axis))
        d *= 2
    return y


def _chunk_core(a, active, px, py, t_pix, done_pix):
    """Shared forward-recompute: alphas, commit mask, weights for one
    segment's rows of a chunk.

    a: (K, ATTR_DIM); active: (K, 1) segment row mask; px/py: (1, N);
    t_pix/done_pix: (1, N).  Semantics identical to
    blend_math.gaussian_alpha + blend_chunk.
    """
    dx = a[:, A_X : A_X + 1] - px                      # (K, N)
    dy = a[:, A_Y : A_Y + 1] - py
    ca = a[:, A_CA : A_CA + 1]
    cb = a[:, A_CB : A_CB + 1]
    cc = a[:, A_CC : A_CC + 1]
    op = a[:, A_OP : A_OP + 1]

    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = op * G
    alpha = jnp.minimum(alpha_raw, ALPHA_CLAMP)
    valid = (
        active
        & (a[:, A_VALID : A_VALID + 1] > 0.5)
        & (power <= 0.0)
        & (alpha >= ALPHA_MIN)
    )
    a_eff = jnp.where(valid, alpha, 0.0)
    one_m = 1.0 - a_eff

    incl = _inclusive_scan(one_m, jnp.multiply, 1.0)   # prod_{j<=i}(1-a_j)
    excl = _shift_down(incl, 1, 1.0)
    t_before = t_pix * excl
    t_after = t_pix * incl
    # t_after is monotone non-increasing along the chunk and the incoming
    # t_pix of a live pixel is >= T_MIN (the trigger pair itself is never
    # committed), so "some pair at or before i triggered" == "t_after_i
    # dropped below T_MIN" — no max-scan needed
    done_after = done_pix | (t_after < T_MIN)
    commit = valid & ~done_after
    w = jnp.where(commit, a_eff * t_before, 0.0)
    # committed-only product of (1-a): the committed set is a prefix of the
    # chunk and incl is monotone non-increasing, so the product equals the
    # minimum of incl over committed rows (saves a third scan)
    t_new = t_pix * jnp.min(
        jnp.where(commit, incl, 1.0), axis=0, keepdims=True
    )
    return dict(
        dx=dx, dy=dy, ca=ca, cb=cb, cc=cc, G=G, alpha_raw=alpha_raw,
        a_eff=a_eff, t_before=t_before, commit=commit, w=w, t_new=t_new,
        done_after=done_after,
    )


def _pixel_coords(t, grid_x, tile_size, npix):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    tx = (t % grid_x) * tile_size
    ty = (t // grid_x) * tile_size
    px = (tx + lane % tile_size).astype(jnp.float32)
    py = (ty + lane // tile_size).astype(jnp.float32)
    return px, py


def _fwd_kernel(ct_ref, ck_ref, lo_ref, hi_ref, sc_ref, attrs_ref, out_ref,
                *, grid_x, tile_size, chunk):
    npix = tile_size * tile_size
    i = pl.program_id(0)
    t = ct_ref[i]
    k0 = ck_ref[i]
    lo = lo_ref[i]
    hi = hi_ref[i]

    @pl.when(k0 == 0)
    def _():
        out_ref[0] = jnp.concatenate(
            [
                jnp.ones((1, npix), jnp.float32),          # T
                jnp.zeros((4, npix), jnp.float32),          # r g b depth
                jnp.full((1, npix), 1e-6, jnp.float32),     # acc (forward.cu:307)
                jnp.zeros((2, npix), jnp.float32),          # done, n_contrib
            ],
            axis=0,
        )

    st = out_ref[0]                                        # (8, npix)

    # whole-tile early exit: once every pixel has latched done, the
    # remaining segments of the tile are exact no-ops (the VMEM-resident
    # state block just stays put) — the per-tile analogue of the
    # reference's per-thread early return (forward.cu:334-337)
    @pl.when((jnp.min(st[S_DONE : S_DONE + 1, :]) < 0.5) & (hi > lo))
    def _():
        px, py = _pixel_coords(t, grid_x, tile_size, npix)
        a = attrs_ref[:, :]                                # (chunk, 16)
        rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        active = (rows >= lo) & (rows < hi)
        c = _chunk_core(
            a, active, px, py, st[S_T : S_T + 1, :],
            st[S_DONE : S_DONE + 1, :] > 0.5,
        )
        w = c["w"]

        acc_row = lambda s, col: st[s : s + 1, :] + jnp.sum(
            w * a[:, col : col + 1], axis=0, keepdims=True
        )
        r_new = acc_row(S_R, A_R)
        g_new = acc_row(S_G, A_G)
        b_new = acc_row(S_B, A_B)
        d_new = acc_row(S_D, A_DEPTH)
        acc_new = st[S_ACC : S_ACC + 1, :] + jnp.sum(w, axis=0, keepdims=True)

        # within-tile pair index of chunk row r is k0 + (r - lo)
        idx = (k0 - lo + rows + 1).astype(jnp.float32)
        contrib = jnp.max(
            jnp.where(c["commit"], idx, 0.0), axis=0, keepdims=True
        )
        nc_new = jnp.maximum(st[S_NC : S_NC + 1, :], contrib)
        done_new = jnp.where(c["done_after"][chunk - 1 : chunk, :], 1.0, 0.0)

        out_ref[0] = jnp.concatenate(
            [c["t_new"], r_new, g_new, b_new, d_new, acc_new, done_new,
             nc_new],
            axis=0,
        )


def _bwd_kernel(
    ct_ref, ck_ref, lo_ref, hi_ref, sc_ref, attrs_ref, state_ref, dout_ref,
    dattr_ref, scr_ref, *, grid_x, tile_size, chunk,
):
    npix = tile_size * tile_size
    i = pl.program_id(0)
    t = ct_ref[i]
    k0 = ck_ref[i]
    lo = lo_ref[i]
    hi = hi_ref[i]

    # first segment of each chunk zero-initializes the whole gradient block;
    # later segments of the chunk read-modify-write their own rows
    @pl.when(lo == 0)
    def _():
        dattr_ref[:, :] = jnp.zeros((chunk, ATTR_DIM), jnp.float32)

    @pl.when(k0 == 0)
    def _():
        scr_ref[0:3] = jnp.concatenate(
            [
                jnp.ones((1, npix), jnp.float32),    # running T
                jnp.zeros((1, npix), jnp.float32),   # running prefix sum w*q
                jnp.zeros((1, npix), jnp.float32),   # running done
            ],
            axis=0,
        )

    # whole-tile early exit (mirrors the forward): once the running done row
    # is all-latched, every remaining pair of the tile is uncommitted and
    # its gradient is exactly zero (rows keep their chunk-init zeros)
    all_done = jnp.min(scr_ref[2:3, :]) > 0.5

    @pl.when(jnp.logical_not(all_done) & (hi > lo))
    def _():
        _bwd_chunk_body(
            t, k0, lo, hi, attrs_ref, state_ref, dout_ref, dattr_ref,
            scr_ref, grid_x=grid_x, tile_size=tile_size, chunk=chunk,
        )


def _bwd_chunk_body(
    t, k0, lo, hi, attrs_ref, state_ref, dout_ref, dattr_ref, scr_ref,
    *, grid_x, tile_size, chunk,
):
    npix = tile_size * tile_size

    saved = state_ref[0]
    d = dout_ref[0]
    g_t = d[S_T : S_T + 1, :]
    g_r = d[S_R : S_R + 1, :]
    g_g = d[S_G : S_G + 1, :]
    g_b = d[S_B : S_B + 1, :]
    g_d = d[S_D : S_D + 1, :]
    g_acc = d[S_ACC : S_ACC + 1, :]
    t_fin = saved[S_T : S_T + 1, :]

    # total committed sum of w_j * q_j over the tile, from saved outputs
    wq_total = (
        g_r * saved[S_R : S_R + 1, :]
        + g_g * saved[S_G : S_G + 1, :]
        + g_b * saved[S_B : S_B + 1, :]
        + g_d * saved[S_D : S_D + 1, :]
        + g_acc * (saved[S_ACC : S_ACC + 1, :] - 1e-6)
    )

    px, py = _pixel_coords(t, grid_x, tile_size, npix)
    a = attrs_ref[:, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    active = (rows >= lo) & (rows < hi)
    t_run = scr_ref[0:1, :]
    wq_run = scr_ref[1:2, :]
    done_run = scr_ref[2:3, :] > 0.5
    c = _chunk_core(a, active, px, py, t_run, done_run)
    w = c["w"]

    # q_i = dL/dw_i for each pair/pixel
    q = (
        g_r * a[:, A_R : A_R + 1]
        + g_g * a[:, A_G : A_G + 1]
        + g_b * a[:, A_B : A_B + 1]
        + g_d * a[:, A_DEPTH : A_DEPTH + 1]
        + g_acc
    )
    wq = w * q
    wq_prefix = wq_run + _inclusive_scan(wq, jnp.add, 0.0)   # sum_{j<=i} w_j q_j
    suffix = wq_total - wq_prefix
    inv1ma = 1.0 / (1.0 - c["a_eff"])                        # a_eff <= 0.99
    dalpha = jnp.where(
        c["commit"],
        c["t_before"] * q - (suffix + g_t * t_fin) * inv1ma,
        0.0,
    )

    dpower = c["alpha_raw"] * dalpha                         # straight-through clamp
    dx, dy = c["dx"], c["dy"]
    red = lambda v: jnp.sum(v, axis=1, keepdims=True)        # (K, 1)
    d_x = red(dpower * -(c["ca"] * dx + c["cb"] * dy))
    d_y = red(dpower * -(c["cc"] * dy + c["cb"] * dx))
    d_ca = red(dpower * (-0.5 * dx * dx))
    d_cb = red(dpower * (-dx * dy))
    d_cc = red(dpower * (-0.5 * dy * dy))
    d_op = red(c["G"] * dalpha)
    d_r = red(w * g_r)
    d_g = red(w * g_g)
    d_b = red(w * g_b)
    d_depth = red(w * g_d)

    vals = jnp.concatenate(
        [
            d_x, d_y, d_ca, d_cb, d_cc, d_op, d_r, d_g, d_b, d_depth,
            jnp.zeros((chunk, ATTR_DIM - 10), jnp.float32),
        ],
        axis=1,
    )
    dattr_ref[:, :] = jnp.where(active, vals, dattr_ref[:, :])

    scr_ref[0:3] = jnp.concatenate(
        [
            c["t_new"],
            wq_run + jnp.sum(wq, axis=0, keepdims=True),
            jnp.where(c["done_after"][chunk - 1 : chunk, :], 1.0, 0.0),
        ],
        axis=0,
    )


def _fwd_call(attrs, seg_tile, seg_k0, seg_lo, seg_hi, seg_chunk,
              grid_x, grid_y, tile_size, chunk, interpret=False):
    num_tiles = grid_x * grid_y
    npix = tile_size * tile_size
    n_segs = seg_tile.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_segs,),
        in_specs=[
            pl.BlockSpec((chunk, ATTR_DIM),
                         lambda i, ct, ck, lo, hi, sc: (sc[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, STATE_ROWS, npix),
                               lambda i, ct, ck, lo, hi, sc: (ct[i], 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(
        _fwd_kernel, grid_x=grid_x, tile_size=tile_size, chunk=chunk
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles + 1, STATE_ROWS, npix), jnp.float32
        ),
        interpret=interpret,
    )(seg_tile, seg_k0, seg_lo, seg_hi, seg_chunk, attrs)


def _bwd_call(attrs, seg_tile, seg_k0, seg_lo, seg_hi, seg_chunk,
              state, dstate, grid_x, grid_y, tile_size, chunk,
              interpret=False):
    npix = tile_size * tile_size
    n_segs = seg_tile.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_segs,),
        in_specs=[
            pl.BlockSpec((chunk, ATTR_DIM),
                         lambda i, ct, ck, lo, hi, sc: (sc[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, STATE_ROWS, npix),
                         lambda i, ct, ck, lo, hi, sc: (ct[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, STATE_ROWS, npix),
                         lambda i, ct, ck, lo, hi, sc: (ct[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, ATTR_DIM),
                               lambda i, ct, ck, lo, hi, sc: (sc[i], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((STATE_ROWS, npix), jnp.float32)],
    )
    kernel = functools.partial(
        _bwd_kernel, grid_x=grid_x, tile_size=tile_size, chunk=chunk
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(attrs.shape, jnp.float32),
        interpret=interpret,
    )(seg_tile, seg_k0, seg_lo, seg_hi, seg_chunk, attrs, state, dstate)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _blend_pallas(attrs, seg_tile, seg_k0, seg_lo, seg_hi, seg_chunk,
                  grid_x, grid_y, tile_size, chunk, interpret):
    return _fwd_call(attrs, seg_tile, seg_k0, seg_lo, seg_hi, seg_chunk,
                     grid_x, grid_y, tile_size, chunk, interpret)


def _blend_fwd(attrs, seg_tile, seg_k0, seg_lo, seg_hi, seg_chunk,
               grid_x, grid_y, tile_size, chunk, interpret):
    state = _fwd_call(attrs, seg_tile, seg_k0, seg_lo, seg_hi, seg_chunk,
                      grid_x, grid_y, tile_size, chunk, interpret)
    return state, (attrs, seg_tile, seg_k0, seg_lo, seg_hi, seg_chunk, state)


def _blend_bwd(grid_x, grid_y, tile_size, chunk, interpret, res, dstate):
    attrs, seg_tile, seg_k0, seg_lo, seg_hi, seg_chunk, state = res
    dattrs = _bwd_call(attrs, seg_tile, seg_k0, seg_lo, seg_hi, seg_chunk,
                       state, dstate, grid_x, grid_y, tile_size, chunk,
                       interpret)
    zint = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (dattrs, zint(seg_tile), zint(seg_k0), zint(seg_lo),
            zint(seg_hi), zint(seg_chunk))


_blend_pallas.defvjp(_blend_fwd, _blend_bwd)


def blend_tiles_pallas(
    bins: TileBins,
    grid_x: int,
    grid_y: int,
    tile_size: int,
    chunk: int,
    interpret: bool = False,
) -> blend_math.BlendCarry:
    """Composite all segments; same interface as blend_tiles_xla
    (flat per-pixel state arrays of length (num_tiles+1) * tile_size^2)."""
    npix = tile_size * tile_size
    if npix % 128 != 0:
        raise ValueError(
            f"pallas backend needs tile_size^2 % 128 == 0, got {tile_size}"
        )
    if chunk % 8 != 0:
        raise ValueError(f"chunk must be a multiple of 8, got {chunk}")
    state = _blend_pallas(
        bins.attrs, bins.seg_tile, bins.seg_k0, bins.seg_lo, bins.seg_hi,
        bins.seg_chunk, grid_x, grid_y, tile_size, chunk, interpret,
    )
    flat = lambda r: state[:, r, :].reshape(-1)
    return blend_math.BlendCarry(
        T=flat(S_T),
        rgb=jnp.swapaxes(state[:, S_R : S_B + 1, :], 0, 1).reshape(3, -1),
        depth=flat(S_D),
        acc=flat(S_ACC),
        done=flat(S_DONE) > 0.5,
        n_contrib=flat(S_NC).astype(jnp.int32),
    )
