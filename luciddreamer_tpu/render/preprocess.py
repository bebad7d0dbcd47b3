"""Per-Gaussian preprocessing: cull, project, conic, SH->RGB, tile rect.

A pure-jnp, batched (no per-Gaussian threads) equivalent of the reference
preprocess kernel (forward.cu:156-256).  Fully differentiable: the production
renderer gets the reference's hand-derived preprocess backward
(backward.cu:144-396) by autodiff of this function.

Differences from the reference, by design:
- quaternion-normalization gradient is included (the reference normalizes in
  torch, so the overall gradient is identical; backward.cu:281 only skips a
  redundant in-kernel renormalization).
- culled Gaussians are masked, not early-returned (static shapes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from luciddreamer_tpu.core import covariance, sh as shlib
from luciddreamer_tpu.core.types import Camera, GaussianParams, ProcessedGaussians
from luciddreamer_tpu.core.transforms import ndc2pix


def preprocess_gaussians(
    params: GaussianParams,
    camera: Camera,
    active_sh_degree: int,
    tile_size: int = 16,
    scale_modifier: float = 1.0,
    near_plane: float = 0.2,
    mean2d_offset: jax.Array | None = None,
) -> ProcessedGaussians:
    """Compute screen-space quantities for every Gaussian (masked, static shape)."""
    means = params.xyz                              # (P, 3)
    opacity = params.get_opacity()[..., 0]          # (P,)
    scales = params.get_scaling()
    quats = params.get_rotation()

    # (..., 3) x (3, 3) products are unrolled elementwise: tiny-contraction
    # dot_generals pad onto the MXU and cost ~5 ms each at 1M on v5e.
    mx, my, mz = means[..., 0], means[..., 1], means[..., 2]

    # --- frustum cull: view-space z > 0.2 (auxiliary.h:139-164) ---
    vm = camera.viewmatrix
    p_view_z = vm[2, 0] * mx + vm[2, 1] * my + vm[2, 2] * mz + vm[2, 3]
    in_front = p_view_z > near_plane

    # --- projection (forward.cu:197-200) ---
    pm = camera.projmatrix
    hom_x = pm[0, 0] * mx + pm[0, 1] * my + pm[0, 2] * mz + pm[0, 3]
    hom_y = pm[1, 0] * mx + pm[1, 1] * my + pm[1, 2] * mz + pm[1, 3]
    p_w = pm[3, 0] * mx + pm[3, 1] * my + pm[3, 2] * mz + pm[3, 3]
    # clamp like tz in project_cov3d_to_2d: culled rows (w ~ tz <= 0.2) must
    # not produce inf that NaNs masked gradients; visible rows unchanged
    inv_w = 1.0 / (jnp.maximum(p_w, 1e-3) + 1e-7)
    ndc_x = hom_x * inv_w
    ndc_y = hom_y * inv_w
    mean2d = jnp.stack(
        [ndc2pix(ndc_x, camera.width), ndc2pix(ndc_y, camera.height)], axis=-1
    )
    if mean2d_offset is not None:
        # zeros passed by the train step; its gradient is the screen-space
        # densification signal (the reference's retain_grad screenspace_points,
        # gaussian_renderer/__init__.py:26-30)
        mean2d = mean2d + mean2d_offset

    # --- covariance -> conic (forward.cu:202-232) ---
    cov3d = covariance.build_cov3d(scales, quats, scale_modifier)
    cov2d = covariance.project_cov3d_to_2d(
        means, cov3d, vm, camera.focal_x, camera.focal_y,
        camera.tanfovx, camera.tanfovy,
    )
    conic, det = covariance.invert_cov2d(cov2d)
    det_ok = det != 0.0
    sigma_max = covariance.cov2d_max_sigma(cov2d, det)
    radius_f = jnp.ceil(3.0 * sigma_max)            # reported radius: 3-sigma
    #                                                 parity (forward.cu:232)

    # --- tile rect (auxiliary.h:46-56), opacity- AND anisotropy-tightened ---
    # The blend skips every pair with alpha = op * exp(power) < 1/255
    # (forward.cu:348-349).  The level set alpha == 1/255 is the ellipse
    # d^T Sigma^{-1} d = c with c = 2 ln(255 op), whose tight axis-aligned
    # bounding box has half-widths sqrt(c * Sigma_xx) and sqrt(c * Sigma_yy):
    # any pixel with |dx| > sqrt(c * Sigma_xx) satisfies d^T Sigma^{-1} d >=
    # dx^2 / Sigma_xx > c, i.e. alpha < 1/255 — an EXACT no-op (zero
    # contribution and zero gradient in the reference too, which skips the
    # pair).  Intersecting with the reference's 3 sigma_max square (so no
    # pair is ever ADDED relative to forward.cu:229-232) gives identical
    # output with far fewer (gaussian, tile) pairs: low opacity shrinks c
    # (op=0.01 after a reset covers ~5% of the 3-sigma area) and anisotropy
    # shrinks the minor axis (a thin sliver no longer pays a square box of
    # its major axis).  The floor on c keeps radii/visibility reference-equal.
    c_level = 2.0 * jnp.maximum(jnp.log(255.0 * opacity), 5e-3)
    r3s = 3.0 * sigma_max
    rx = jnp.ceil(jnp.minimum(r3s, jnp.sqrt(c_level * cov2d[..., 0])))
    ry = jnp.ceil(jnp.minimum(r3s, jnp.sqrt(c_level * cov2d[..., 2])))
    grid_x = (camera.width + tile_size - 1) // tile_size
    grid_y = (camera.height + tile_size - 1) // tile_size
    px, py = mean2d[..., 0], mean2d[..., 1]

    def rect(rx, ry):
        min_x = jnp.clip(((px - rx) / tile_size).astype(jnp.int32), 0, grid_x)
        min_y = jnp.clip(((py - ry) / tile_size).astype(jnp.int32), 0, grid_y)
        max_x = jnp.clip(
            ((px + rx + tile_size - 1) / tile_size).astype(jnp.int32), 0,
            grid_x,
        )
        max_y = jnp.clip(
            ((py + ry + tile_size - 1) / tile_size).astype(jnp.int32), 0,
            grid_y,
        )
        return min_x, min_y, max_x, max_y

    rect_min_x, rect_min_y, rect_max_x, rect_max_y = rect(rx, ry)
    tiles = (rect_max_x - rect_min_x) * (rect_max_y - rect_min_y)
    # visibility & reported radius come from the reference's 3-sigma rect
    # (forward.cu:229-236) so radii / visibility_filter / densification
    # bookkeeping match it exactly even when the tightened rect clips empty
    # at the viewport border
    r3 = rect(radius_f, radius_f)
    tiles_ref = (r3[2] - r3[0]) * (r3[3] - r3[1])

    visible = in_front & det_ok & (tiles_ref > 0) & params.alive
    tiles = jnp.where(visible, tiles, 0)
    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    # --- SH -> RGB (forward.cu:20-71) ---
    shs = params.get_features()                     # (P, K, 3)
    rgb = shlib.sh_to_rgb_clamped(active_sh_degree, shs, means, camera.campos)

    return ProcessedGaussians(
        mean2d=mean2d,
        depth=p_view_z,
        conic=conic,
        opacity=opacity,
        rgb=rgb,
        radius=radius,
        rect_min=jnp.stack([rect_min_x, rect_min_y], axis=-1),
        rect_max=jnp.stack([rect_max_x, rect_max_y], axis=-1),
        tiles_touched=tiles,
        visible=visible,
    )
