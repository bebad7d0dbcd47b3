"""Portable tile-blend backend: a sequential XLA scan over tile segments of
the depth-sorted pair stream.

Functionally identical to the Pallas kernels (same binning, same blend math),
but runs on any backend — used for CPU tests and for validating multi-chip
sharding on virtual device meshes.  The scan is sequential over segments, so
it is only fast enough for small scenes; the TPU production path is
render.pallas_blend.

The whole function is differentiable (gradients reach the sorted attribute
array and flow back through binning's gathers to the Gaussian parameters).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from luciddreamer_tpu.render import blend_math
from luciddreamer_tpu.render.binning import (
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


def blend_tiles_xla(
    bins: TileBins,
    grid_x: int,
    grid_y: int,
    tile_size: int,
    chunk: int,
):
    """Composite all segments; returns per-pixel images in tile-major layout.

    Output dict arrays have shape (num_tiles+1, tile_size*tile_size); the
    final (+1) tile is a scratch target for inactive padding segments.
    """
    num_tiles = grid_x * grid_y
    npix = tile_size * tile_size
    n_segs = bins.seg_tile.shape[0]

    # local pixel coordinates within a tile
    lin = jnp.arange(npix, dtype=jnp.float32)
    lx = lin % tile_size
    ly = lin // tile_size

    state0 = blend_math.BlendCarry.init((num_tiles + 1) * npix)

    def slice_state(carry, t):
        get = lambda x: jax.lax.dynamic_slice_in_dim(x, t * npix, npix, axis=-1)
        return blend_math.BlendCarry(
            T=get(carry.T), rgb=get(carry.rgb), depth=get(carry.depth),
            acc=get(carry.acc), done=get(carry.done), n_contrib=get(carry.n_contrib),
        )

    def write_state(carry, local, t):
        put = lambda x, v: jax.lax.dynamic_update_slice_in_dim(x, v, t * npix, axis=-1)
        return blend_math.BlendCarry(
            T=put(carry.T, local.T), rgb=put(carry.rgb, local.rgb),
            depth=put(carry.depth, local.depth), acc=put(carry.acc, local.acc),
            done=put(carry.done, local.done),
            n_contrib=put(carry.n_contrib, local.n_contrib),
        )

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def step(carry, s):
        t = bins.seg_tile[s]
        k0 = bins.seg_k0[s]
        lo = bins.seg_lo[s]
        hi = bins.seg_hi[s]
        c = bins.seg_chunk[s]
        a = jax.lax.dynamic_slice_in_dim(bins.attrs, c * chunk, chunk, axis=0)

        tx = (t % grid_x).astype(jnp.float32)
        ty = (t // grid_x).astype(jnp.float32)
        px = tx * tile_size + lx   # (npix,)
        py = ty * tile_size + ly

        rows = jnp.arange(chunk, dtype=jnp.int32)[:, None]
        active = (rows >= lo) & (rows < hi)

        dx = a[:, A_X, None] - px[None, :]
        dy = a[:, A_Y, None] - py[None, :]
        alpha, in_ellipse = blend_math.gaussian_alpha(
            dx, dy, a[:, A_CA, None], a[:, A_CB, None], a[:, A_CC, None],
            a[:, A_OP, None],
        )
        valid = (
            active
            & (a[:, A_VALID, None] > 0.5)
            & in_ellipse
            & (alpha >= blend_math.ALPHA_MIN)
        )
        rgb = a[:, (A_R, A_G, A_B)]
        local = slice_state(carry, t)
        # within-tile pair index of chunk row r is k0 + (r - lo)
        local = blend_math.blend_chunk(
            local, alpha, valid, rgb, a[:, A_DEPTH], k0 - lo
        )
        return write_state(carry, local, t), None

    carry, _ = jax.lax.scan(step, state0, jnp.arange(n_segs))
    return carry


def tilemajor_to_image(x, grid_x: int, grid_y: int, tile_size: int, height: int, width: int):
    """(..., num_tiles+1, ts*ts) tile-major -> (..., H, W) image crop."""
    lead = x.shape[:-2]
    num_tiles = grid_x * grid_y
    x = x[..., :num_tiles, :]
    x = x.reshape(lead + (grid_y, grid_x, tile_size, tile_size))
    x = jnp.swapaxes(x, -3, -2)
    x = x.reshape(lead + (grid_y * tile_size, grid_x * tile_size))
    return x[..., :height, :width]
