"""Tiled production renderer: preprocess -> binning -> tile blend -> image.

The TPU-native counterpart of the reference forward/backward pipeline
(rasterizer_impl.cu:198-444).  Shape-static throughout: the (gaussian, tile)
pair list lives in a fixed-capacity buffer (overflow is reported, not
resized), the per-tile pair ranges are chunk-aligned, and the blend is a
scan/Pallas walk over packed chunks.  The backward pass is JAX autodiff of
the whole thing — deterministic segment-sum style scatter instead of the
reference's atomicAdd (backward.cu:537,574-583) — including the depth
gradient the reference left disabled (backward.cu:443,457-464).

Backends:
  * ``xla``    — portable lax.scan path (render.xla_blend); any device.
  * ``pallas`` — TPU Pallas kernels (render.pallas_blend); real TPU only.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.types import Camera, GaussianParams
from luciddreamer_tpu.render import blend_math
from luciddreamer_tpu.render.binning import build_tile_bins, num_tiles_for
from luciddreamer_tpu.render.preprocess import preprocess_gaussians
from luciddreamer_tpu.render.xla_blend import blend_tiles_xla, tilemajor_to_image


def default_pair_capacity(capacity: int, multiplier: float = 8.0) -> int:
    """Static pair budget; the reference sizes this on device at runtime
    (rasterizer_impl.cu:281-282).  Floor of 4096 keeps small scenes from
    overflowing on dense screen coverage."""
    return max(4096, int(capacity * multiplier))


def render_tiled(
    params: GaussianParams,
    camera: Camera,
    bg: jax.Array,
    active_sh_degree: int = 3,
    tile_size: int = 16,
    scale_modifier: float = 1.0,
    chunk: int = 384,
    pair_cap: int | None = None,
    backend: str = "xla",
    mean2d_offset: jax.Array | None = None,
):
    """Render RGB + depth through the tiled path.

    Returns the same dict schema as render_dense, plus ``overflow`` (bool
    scalar: pair capacity exceeded -> image invalid, re-trace with a larger
    ``pair_cap``).
    """
    H, W = camera.height, camera.width
    grid_x, grid_y = num_tiles_for(H, W, tile_size)
    if pair_cap is None:
        pair_cap = default_pair_capacity(params.capacity)
    # align the capacity to lcm(chunk, 1024): chunk-alignment packs every
    # tile range losslessly, 1024-alignment matches XLA's T(1024) layout of
    # big f32[N] buffers so the backward's Pallas repack needs no padding
    # copy (see binning._repack_cols; round-4's bench crashed here with a
    # 4_000_000 cap that was chunk-aligned but not 1024-aligned).  Small
    # capacities keep plain chunk alignment — the repack pads internally,
    # and a 1024 floor would mask deliberate tiny-cap overflow tests.
    align = math.lcm(chunk, 1024) if pair_cap >= 1024 else chunk
    pair_cap = ((pair_cap + align - 1) // align) * align

    proc = preprocess_gaussians(
        params, camera, active_sh_degree, tile_size, scale_modifier,
        mean2d_offset=mean2d_offset,
    )
    bins = build_tile_bins(proc, H, W, tile_size, pair_cap, chunk)

    if backend == "pallas":
        from luciddreamer_tpu.render.pallas_blend import blend_tiles_pallas

        # interpret mode lets the same kernel run on CPU (tests / mesh sims)
        interpret = jax.default_backend() != "tpu"
        carry = blend_tiles_pallas(
            bins, grid_x, grid_y, tile_size, chunk, interpret=interpret
        )
    else:
        carry = blend_tiles_xla(bins, grid_x, grid_y, tile_size, chunk)

    npix = tile_size * tile_size
    n_state_tiles = grid_x * grid_y + 1

    def unflatten(x):
        return x.reshape(x.shape[:-1] + (n_state_tiles, npix))

    carry = blend_math.BlendCarry(*(unflatten(f) for f in carry))
    rgb, depth = blend_math.finalize(carry, bg[:, None])

    to_img = functools.partial(
        tilemajor_to_image, grid_x=grid_x, grid_y=grid_y,
        tile_size=tile_size, height=H, width=W,
    )
    return {
        "render": to_img(rgb),
        "depth": to_img(depth),
        "acc": to_img(carry.acc),
        "final_T": to_img(carry.T),
        "n_contrib": to_img(carry.n_contrib),
        "radii": proc.radius,
        "visibility_filter": proc.radius > 0,
        "mean2d": proc.mean2d,
        "overflow": bins.overflow,
        "num_pairs": bins.num_pairs,
    }
