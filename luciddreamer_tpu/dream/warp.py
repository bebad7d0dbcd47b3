"""Point-cloud warping ops for the dreaming loop, on-device.

JAX equivalents of the numpy/scipy machinery in generate_pcd
(luciddreamer.py:369-414,516-556): unprojection, projection, forward
splatting (the scipy.interpolate.griddata replacement), and the
max/min-filter mask pipeline.

griddata('linear') interpolates a Delaunay triangulation — a sequential,
host-only algorithm and a known bottleneck of the reference (2 calls per
dreamed view + 2 per aligned frame).  Here warped points are *forward
splatted* with bilinear weights and holes are closed by an iterative
neighborhood fill; since the warped cloud is a dense re-projection of image
grids, the two agree everywhere except at sparse disocclusion holes, which
the reference's own mask pipeline (9x9 dot dilation then 11x11 erosion,
luciddreamer.py:404-409) discards anyway.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def unproject(depth, K, R, T, colors=None):
    """depth (H, W) -> world points (3, H*W): X = R^-1 (K^-1 [x d, y d, d] - T)
    (luciddreamer.py:369-371)."""
    H, W = depth.shape
    x, y = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32), indexing="xy")
    d = depth.reshape(-1)
    pix = jnp.stack([x.reshape(-1) * d, y.reshape(-1) * d, d], axis=0)
    cam = jnp.linalg.inv(K) @ pix
    Rinv = jnp.linalg.inv(R)
    world = Rinv @ cam - (Rinv @ T.reshape(3, 1))
    return world


def project(points, K, R, T, H: int, W: int):
    """World points (3, N) -> (pixel_xy (2, N), depth (N,), valid (N,))
    with the reference's in-bounds test (luciddreamer.py:389-394)."""
    cam = R @ points + T.reshape(3, 1)
    pix = K @ cam
    z = pix[2]
    u = pix[0] / jnp.where(z == 0, 1e-8, z)
    v = pix[1] / jnp.where(z == 0, 1e-8, z)
    valid = (z > 0) & (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    return jnp.stack([u, v], axis=0), z, valid


@functools.partial(jax.jit, static_argnames=("H", "W", "fill_iters"))
def splat_linear(points_xy, values, valid, H: int, W: int,
                 fill_iters: int = 8):
    """Forward-splat scattered (2, N) pixel coords carrying (N, C) values
    onto an (H, W, C) grid with bilinear weights; close holes by iterative
    4-neighbor averaging.  Returns (grid (H, W, C), weight (H, W))."""
    u = points_xy[0]
    v = points_xy[1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0

    acc = jnp.zeros((H * W, values.shape[-1]), jnp.float32)
    wacc = jnp.zeros((H * W,), jnp.float32)
    for dx, dy, w in (
        (0, 0, (1 - du) * (1 - dv)),
        (1, 0, du * (1 - dv)),
        (0, 1, (1 - du) * dv),
        (1, 1, du * dv),
    ):
        xi = jnp.clip(u0 + dx, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(v0 + dy, 0, H - 1).astype(jnp.int32)
        wi = jnp.where(valid, w, 0.0)
        idx = yi * W + xi
        acc = acc.at[idx].add(wi[:, None] * values)
        wacc = wacc.at[idx].add(wi)

    grid = acc / jnp.maximum(wacc[:, None], 1e-8)
    grid = grid.reshape(H, W, -1)
    weight = wacc.reshape(H, W)

    # iterative hole fill (pull from 4-neighbors); replaces Delaunay
    # interpolation across small disocclusion gaps
    def fill(state, _):
        g, w = state
        gp = jnp.pad(g * w[..., None], ((1, 1), (1, 1), (0, 0)))
        wp = jnp.pad(w, ((1, 1), (1, 1)))
        nsum = (
            gp[:-2, 1:-1] + gp[2:, 1:-1] + gp[1:-1, :-2] + gp[1:-1, 2:]
        )
        nw = wp[:-2, 1:-1] + wp[2:, 1:-1] + wp[1:-1, :-2] + wp[1:-1, 2:]
        filled = nsum / jnp.maximum(nw[..., None], 1e-8)
        new_g = jnp.where(w[..., None] > 0, g, filled)
        new_w = jnp.where(w > 0, w, jnp.minimum(nw, 1.0))
        return (new_g, new_w), None

    (grid, weight), _ = jax.lax.scan(
        fill, (grid, weight), None, length=fill_iters
    )
    return grid, weight


def max_filter(x, size: int):
    """scipy.ndimage.maximum_filter equivalent (zero-ish padding via -inf)."""
    pad = size // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (size, size), (1, 1),
        [(pad, pad), (pad, pad)],
    )


def min_filter(x, size: int):
    pad = size // 2
    return jax.lax.reduce_window(
        x, jnp.inf, jax.lax.min, (size, size), (1, 1),
        [(pad, pad), (pad, pad)],
    )


def edge_blend(image, edge_n: int = 2):
    """The reference's edgemask trick (luciddreamer.py:365-367,399-400):
    replace an edge_n-wide border with the replicated interior edge."""
    inner = image[1:-1, 1:-1]
    padded = jnp.pad(
        inner,
        ((1, 1), (1, 1)) + ((0, 0),) * (image.ndim - 2),
        mode="edge",
    )
    H, W = image.shape[:2]
    ys = jnp.arange(H)
    xs = jnp.arange(W)
    interior = (
        (ys[:, None] >= edge_n) & (ys[:, None] < H - edge_n)
        & (xs[None, :] >= edge_n) & (xs[None, :] < W - edge_n)
    )
    mask = interior.astype(image.dtype)
    if image.ndim == 3:
        mask = mask[..., None]
    return mask * image + (1 - mask) * padded


def scatter_dot_mask(points_xy, valid, H: int, W: int):
    """The rounded-coordinate occupancy mask (luciddreamer.py:402-403)."""
    u = jnp.clip(jnp.round(points_xy[0]), 0, W - 1).astype(jnp.int32)
    v = jnp.clip(jnp.round(points_xy[1]), 0, H - 1).astype(jnp.int32)
    m = jnp.zeros((H, W), jnp.float32)
    return m.at[v, u].max(jnp.where(valid, 1.0, 0.0))


def warp_masks(points_xy, valid, image, H: int, W: int):
    """The full mask pipeline of a dreamed view (luciddreamer.py:402-409):
    dot mask -> 9x9 dilate -> gate image (else -1) -> 11x11 erode of the
    'any channel present' mask -> final (image2, mask2)."""
    round_mask = max_filter(scatter_dot_mask(points_xy, valid, H, W), 9)
    image = round_mask[..., None] * image + (1 - round_mask[..., None]) * (-1.0)
    mask2 = min_filter((jnp.sum(image, -1) != -3.0).astype(jnp.float32), 11)
    image = mask2[..., None] * image
    return image, mask2


def border_mask(mask2):
    """mask_hf: high-frequency (boundary) pixels of mask2
    (luciddreamer.py:411-414)."""
    H, W = mask2.shape
    d = jnp.abs(mask2[: H - 1, : W - 1] - mask2[1:, : W - 1]) + jnp.abs(
        mask2[: H - 1, : W - 1] - mask2[: H - 1, 1:]
    )
    d = jnp.pad(d, ((0, 1), (0, 1)), mode="edge")
    return jnp.where(d < 0.3, 0.0, 1.0)


def idw_interpolate(anchor_xy, anchor_values, query_xy, k: int = 4,
                    eps: float = 1e-6, query_block: int = 8192):
    """Inverse-distance-weighted k-NN interpolation of scattered anchors at
    query pixels — the griddata linear+nearest fallback pair used for the
    border-depth compensation (luciddreamer.py:478-480).  anchor_xy (N, 2),
    anchor_values (N,), query_xy (M, 2) -> (M,).

    Queries are processed in blocks: the full (M, N) distance matrix at
    512x512 x 8k anchors would be ~8 GB of HBM (it crashed a v5e chip)."""
    M = query_xy.shape[0]
    nb = -(-M // query_block)
    pad = nb * query_block - M
    q = jnp.pad(query_xy, ((0, pad), (0, 0)))

    def block(qb):
        d2 = jnp.sum((qb[:, None, :] - anchor_xy[None, :, :]) ** 2, axis=-1)
        neg, idx = jax.lax.top_k(-d2, k)
        w = 1.0 / (jnp.sqrt(jnp.maximum(-neg, 0.0)) + eps)
        vals = anchor_values[idx]
        return jnp.sum(w * vals, axis=-1) / jnp.sum(w, axis=-1)

    out = jax.lax.map(block, q.reshape(nb, query_block, 2))
    return out.reshape(-1)[:M]
