"""Unit tests for core math: SH, covariance, transforms."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from luciddreamer_tpu.core import covariance, sh, transforms


def test_sh_constants():
    assert abs(sh.C0 - 0.28209479177387814) < 1e-15
    # DC-only: rgb = C0*sh + 0.5; rgb2sh inverts
    rgb = jnp.array([0.2, 0.5, 0.9])
    np.testing.assert_allclose(sh.sh2rgb(sh.rgb2sh(rgb)), rgb, atol=1e-6)


def test_eval_sh_deg0_isotropic(rng):
    shs = jnp.asarray(rng.normal(size=(5, 16, 3)), jnp.float32)
    d1 = jnp.asarray([[0.0, 0.0, 1.0]] * 5)
    d2 = jnp.asarray([[1.0, 0.0, 0.0]] * 5)
    r1 = sh.eval_sh(0, shs, d1)
    r2 = sh.eval_sh(0, shs, d2)
    np.testing.assert_allclose(r1, r2, atol=1e-6)


def test_quat_to_rotmat_orthonormal(rng):
    q = rng.normal(size=(10, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = covariance.quat_to_rotmat(jnp.asarray(q, jnp.float32))
    eye = jnp.einsum("...ij,...kj->...ik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (10, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), np.ones(10), atol=1e-5)


def test_quat_identity():
    R = covariance.quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0]))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)


def test_cov3d_matches_rsr(rng):
    scale = jnp.asarray(np.abs(rng.normal(size=(7, 3))) + 0.1, jnp.float32)
    q = rng.normal(size=(7, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q = jnp.asarray(q, jnp.float32)
    packed = covariance.build_cov3d(scale, q)
    R = np.asarray(covariance.quat_to_rotmat(q))
    S = np.asarray(scale)
    for i in range(7):
        Sigma = R[i] @ np.diag(S[i] ** 2) @ R[i].T
        expect = [Sigma[0, 0], Sigma[0, 1], Sigma[0, 2], Sigma[1, 1], Sigma[1, 2], Sigma[2, 2]]
        np.testing.assert_allclose(packed[i], expect, rtol=1e-4, atol=1e-5)


def test_projection_matrix_corners():
    znear, zfar = 0.01, 100.0
    fov = 0.9
    P = transforms.projection_matrix(znear, zfar, fov, fov)
    # point on near plane at the frustum corner maps to ndc x=1, z=0
    x = math.tan(fov / 2) * znear
    p = P @ np.array([x, 0, znear, 1.0])
    ndc = p[:3] / p[3]
    np.testing.assert_allclose(ndc[0], 1.0, atol=1e-5)
    np.testing.assert_allclose(ndc[2], 0.0, atol=1e-5)
    # far plane maps to z=1
    p = P @ np.array([0, 0, zfar, 1.0])
    np.testing.assert_allclose(p[2] / p[3], 1.0, atol=1e-5)


def test_make_camera_roundtrip(rng):
    # random c2w with orthonormal rotation
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    c2w = np.eye(4)
    c2w[:3, :3] = Q
    c2w[:3, 3] = rng.normal(size=3)
    cam = transforms.make_camera(c2w, 0.8, 0.8, 64, 48)
    np.testing.assert_allclose(np.asarray(cam.campos), c2w[:3, 3], atol=1e-5)
    # view @ c2w == identity
    np.testing.assert_allclose(
        np.asarray(cam.viewmatrix) @ c2w, np.eye(4), atol=1e-5
    )
    assert cam.width == 64 and cam.height == 48


def test_fov_focal_roundtrip():
    fov = transforms.focal2fov(582.69, 512)
    assert abs(transforms.fov2focal(fov, 512) - 582.69) < 1e-3
    assert abs(fov - 0.8279) < 1e-3  # arguments.py:41-51 operating point
