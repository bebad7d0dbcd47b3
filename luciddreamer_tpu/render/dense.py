"""Dense oracle renderer: exact blend semantics, O(P * pixels), autodiff backward.

This is the reference implementation every production kernel is tested against
(SURVEY.md §7 step 2 / BASELINE config 1).  It composites *all* Gaussians over
*all* pixels in global depth order, chunk by chunk, reproducing the per-tile
inclusion rule of the reference binning (a Gaussian only affects pixels whose
tile lies in its screen rect, rasterizer_impl.cu:96-109) via an explicit mask.

Runs anywhere (CPU included); the backward pass comes from JAX autodiff with
rematerialization, so it is also the gradient oracle — including the depth
gradient the reference left disabled (backward.cu:443,457-464).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.types import Camera, GaussianParams, ProcessedGaussians
from luciddreamer_tpu.render import blend_math
from luciddreamer_tpu.render.blend_math import BlendCarry
from luciddreamer_tpu.render.preprocess import preprocess_gaussians


def _blend_dense(
    proc: ProcessedGaussians,
    order: jax.Array,
    height: int,
    width: int,
    tile_size: int,
    chunk: int,
) -> BlendCarry:
    P = proc.depth.shape[0]
    n_chunks = (P + chunk - 1) // chunk
    pad = n_chunks * chunk - P

    def pad0(x):
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg)

    order_p = jnp.pad(order, (0, pad), constant_values=P)  # padded ids -> masked

    # Gather into depth order (padded entries gather row 0 but are masked).
    take = lambda x: jnp.take(pad0(x), order_p, axis=0)
    g_xy = take(proc.mean2d)
    g_conic = take(proc.conic)
    g_op = take(proc.opacity)
    g_rgb = take(proc.rgb)
    g_depth = take(proc.depth)
    g_rmin = take(proc.rect_min)
    g_rmax = take(proc.rect_max)
    g_valid = jnp.take(pad0(proc.visible), order_p, axis=0) & (order_p < P)

    n_pix = height * width
    pix_x = jnp.tile(jnp.arange(width, dtype=jnp.float32), height)
    pix_y = jnp.repeat(jnp.arange(height, dtype=jnp.float32), width)
    tile_x = (pix_x / tile_size).astype(jnp.int32)
    tile_y = (pix_y / tile_size).astype(jnp.int32)

    def chunk_attrs(i):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * chunk, chunk, axis=0)
        return (sl(g_xy), sl(g_conic), sl(g_op), sl(g_rgb), sl(g_depth),
                sl(g_rmin), sl(g_rmax), sl(g_valid))

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def step(carry, i):
        xy, conic, op, rgb, depth, rmin, rmax, valid = chunk_attrs(i)
        dx = xy[:, 0:1] - pix_x[None, :]
        dy = xy[:, 1:2] - pix_y[None, :]
        alpha, in_ellipse = blend_math.gaussian_alpha(
            dx, dy, conic[:, 0:1], conic[:, 1:2], conic[:, 2:3], op[:, None]
        )
        in_rect = (
            (tile_x[None, :] >= rmin[:, 0:1]) & (tile_x[None, :] < rmax[:, 0:1])
            & (tile_y[None, :] >= rmin[:, 1:2]) & (tile_y[None, :] < rmax[:, 1:2])
        )
        mask = valid[:, None] & in_rect & in_ellipse & (alpha >= blend_math.ALPHA_MIN)
        carry = blend_math.blend_chunk(
            carry, alpha, mask, rgb, depth, base_index=i * chunk
        )
        return carry, None

    carry0 = BlendCarry.init(n_pix)
    carry, _ = jax.lax.scan(step, carry0, jnp.arange(n_chunks))
    return carry


def render_dense(
    params: GaussianParams,
    camera: Camera,
    bg: jax.Array,
    active_sh_degree: int = 3,
    tile_size: int = 16,
    scale_modifier: float = 1.0,
    chunk: int = 64,
):
    """Render RGB + depth with the oracle path.

    Returns a dict: render (3,H,W), depth (H,W), acc (H,W), final_T (H,W),
    radii (P,), mean2d (P,2) [pixel coords].
    """
    proc = preprocess_gaussians(
        params, camera, active_sh_degree, tile_size, scale_modifier
    )
    # Global stable depth sort == per-tile depth order of the reference radix
    # sort (rasterizer_impl.cu:102-109): ties break by Gaussian index.
    depth_key = jnp.where(proc.visible, proc.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True)
    carry = _blend_dense(
        proc, order, camera.height, camera.width, tile_size, chunk
    )
    rgb, depth = blend_math.finalize(carry, bg)
    H, W = camera.height, camera.width
    return {
        "render": rgb.reshape(3, H, W),
        "depth": depth.reshape(H, W),
        "acc": carry.acc.reshape(H, W),
        "final_T": carry.T.reshape(H, W),
        "n_contrib": carry.n_contrib.reshape(H, W),
        "radii": proc.radius,
        "visibility_filter": proc.radius > 0,
        "mean2d": proc.mean2d,
    }
