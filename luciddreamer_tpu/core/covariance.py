"""Gaussian covariance math: quaternion -> rotation, 3D covariance, EWA 2D projection.

Semantics match the reference kernels (forward.cu:73-152) and the python twin
(utils/general.py:83-116).  Everything is autodiff-friendly; the production
renderer obtains the preprocess backward (the hand-written calculus in
backward.cu:144-396) by differentiating these functions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Small per-Gaussian matrix products are bandwidth-bound; force full f32 so
# TPU does not silently drop them to bf16 (parity with the fp32 reference).
_HI = jax.lax.Precision.HIGHEST


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) -> 3x3 rotation. Matches utils/general.py:83-104
    (which normalizes) — pass an already-normalized quaternion for rasterizer
    parity (the model's rotation activation normalizes, gaussian_model.py:43).

    q: (..., 4) -> (..., 3, 3)
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y),
            2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x),
            2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def build_cov3d(scale: jnp.ndarray, quat: jnp.ndarray, scale_modifier: float = 1.0) -> jnp.ndarray:
    """World-space covariance Sigma = R S^2 R^T, packed symmetric.

    scale: (..., 3) activated (positive) scales; quat: (..., 4) normalized.
    Returns (..., 6): (xx, xy, xz, yy, yz, zz) — the packing of forward.cu:146-151.

    Fully unrolled to elementwise VPU ops: a batched (...,3,3) matmul at
    HIGHEST precision costs ~54 ms at 1M Gaussians on v5e (MXU padding), the
    unrolled form is free (profiled; max abs diff 1e-10).
    """
    r, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    sx = scale[..., 0] * scale_modifier
    sy = scale[..., 1] * scale_modifier
    sz = scale[..., 2] * scale_modifier
    # M = R @ diag(s), rows of the rotation scaled per column
    m00 = (1.0 - 2.0 * (y * y + z * z)) * sx
    m01 = (2.0 * (x * y - r * z)) * sy
    m02 = (2.0 * (x * z + r * y)) * sz
    m10 = (2.0 * (x * y + r * z)) * sx
    m11 = (1.0 - 2.0 * (x * x + z * z)) * sy
    m12 = (2.0 * (y * z - r * x)) * sz
    m20 = (2.0 * (x * z - r * y)) * sx
    m21 = (2.0 * (y * z + r * x)) * sy
    m22 = (1.0 - 2.0 * (x * x + y * y)) * sz
    c_xx = m00 * m00 + m01 * m01 + m02 * m02
    c_xy = m00 * m10 + m01 * m11 + m02 * m12
    c_xz = m00 * m20 + m01 * m21 + m02 * m22
    c_yy = m10 * m10 + m11 * m11 + m12 * m12
    c_yz = m10 * m20 + m11 * m21 + m12 * m22
    c_zz = m20 * m20 + m21 * m21 + m22 * m22
    return jnp.stack([c_xx, c_xy, c_xz, c_yy, c_yz, c_zz], axis=-1)


def project_cov3d_to_2d(
    mean: jnp.ndarray,
    cov3d: jnp.ndarray,
    viewmatrix: jnp.ndarray,
    focal_x,
    focal_y,
    tanfovx,
    tanfovy,
):
    """EWA projection of the 3D covariance to screen space (forward.cu:73-113).

    mean: (..., 3) world means; cov3d: (..., 6) packed; viewmatrix: (4,4) w2c.
    Returns (..., 3): (cov_xx, cov_xy, cov_yy) with the +0.3 low-pass applied.

    Steps: t = view-space mean with x/y clamped at 1.3*tanfov (forward.cu:82-87);
    J = perspective Jacobian; cov2d = J W Sigma W^T J^T + 0.3*I.
    """
    W = viewmatrix[:3, :3]
    # Unrolled (..., 3) @ (3, 3)^T: tiny-contraction dot_generals pad onto
    # the MXU (128-lane) and cost ~5 ms/op at 1M on v5e; the elementwise
    # form fuses into the surrounding VPU work for free.
    mx, my, mz = mean[..., 0], mean[..., 1], mean[..., 2]
    t = jnp.stack(
        [
            W[0, 0] * mx + W[0, 1] * my + W[0, 2] * mz + viewmatrix[0, 3],
            W[1, 0] * mx + W[1, 1] * my + W[1, 2] * mz + viewmatrix[1, 3],
            W[2, 0] * mx + W[2, 1] * my + W[2, 2] * mz + viewmatrix[2, 3],
        ],
        axis=-1,
    )
    # Rows with tz <= 0.2 are frustum-culled (masked downstream), but their
    # values still flow through autodiff: clamp tz so 1/tz stays finite and
    # no 0*inf=NaN leaks into masked gradients.  Visible rows (tz > 0.2)
    # are unchanged -> exact forward/backward parity.
    tz = jnp.maximum(t[..., 2], 0.01)
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    tx = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[..., 1] / tz, -limy, limy) * tz

    # V = W Sigma W^T, fully unrolled over the symmetric packing: the
    # batched-einsum form is a (..., 3, 3) dot_general that pads onto the
    # MXU and costs tens of ms at 1M Gaussians (see build_cov3d docstring);
    # the unrolled form is ~45 fused VPU multiply-adds.
    s = cov3d
    sxx, sxy, sxz = s[..., 0], s[..., 1], s[..., 2]
    syy, syz, szz = s[..., 3], s[..., 4], s[..., 5]

    def wsig_row(i):
        # row i of A = W @ Sigma (scalars W[i, j] broadcast over the batch)
        a0 = W[i, 0] * sxx + W[i, 1] * sxy + W[i, 2] * sxz
        a1 = W[i, 0] * sxy + W[i, 1] * syy + W[i, 2] * syz
        a2 = W[i, 0] * sxz + W[i, 1] * syz + W[i, 2] * szz
        return a0, a1, a2

    a00, a01, a02 = wsig_row(0)
    a10, a11, a12 = wsig_row(1)
    a20, a21, a22 = wsig_row(2)
    v00 = a00 * W[0, 0] + a01 * W[0, 1] + a02 * W[0, 2]
    v01 = a00 * W[1, 0] + a01 * W[1, 1] + a02 * W[1, 2]
    v02 = a00 * W[2, 0] + a01 * W[2, 1] + a02 * W[2, 2]
    v11 = a10 * W[1, 0] + a11 * W[1, 1] + a12 * W[1, 2]
    v12 = a10 * W[2, 0] + a11 * W[2, 1] + a12 * W[2, 2]
    v22 = a20 * W[2, 0] + a21 * W[2, 1] + a22 * W[2, 2]

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    j00 = focal_x * inv_z
    j11 = focal_y * inv_z
    j02 = -focal_x * tx * inv_z2
    j12 = -focal_y * ty * inv_z2

    # cov2d = J V J^T with J = [[j00, 0, j02], [0, j11, j12]]
    c_xx = j00 * j00 * v00 + 2.0 * j00 * j02 * v02 + j02 * j02 * v22 + 0.3
    c_xy = j00 * j11 * v01 + j00 * j12 * v02 + j02 * j11 * v12 + j02 * j12 * v22
    c_yy = j11 * j11 * v11 + 2.0 * j11 * j12 * v12 + j12 * j12 * v22 + 0.3
    return jnp.stack([c_xx, c_xy, c_yy], axis=-1)


def invert_cov2d(cov2d: jnp.ndarray):
    """(cov_xx, cov_xy, cov_yy) -> conic (a, b, c) and determinant
    (forward.cu:219-223)."""
    cxx, cxy, cyy = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = cxx * cyy - cxy * cxy
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv = 1.0 / det_safe
    conic = jnp.stack([cyy * inv, -cxy * inv, cxx * inv], axis=-1)
    return conic, det


def cov2d_max_sigma(cov2d: jnp.ndarray, det: jnp.ndarray):
    """sqrt of the max eigenvalue of the 2x2 screen covariance
    (forward.cu:229-231)."""
    cxx, cyy = cov2d[..., 0], cov2d[..., 2]
    mid = 0.5 * (cxx + cyy)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    return jnp.sqrt(jnp.maximum(mid + disc, 0.0))


def cov2d_extent_radius(cov2d: jnp.ndarray, det: jnp.ndarray):
    """Screen-space radius = ceil(3 * sqrt(max eigenvalue)) (forward.cu:229-232)."""
    return jnp.ceil(3.0 * cov2d_max_sigma(cov2d, det))
