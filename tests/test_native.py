"""Native C++ extension: exact 3-NN, Morton codes, stratified subsampling."""
import numpy as np
import pytest

from luciddreamer_tpu import native


def test_native_builds():
    assert native.available(), "g++ build of the native extension failed"


def test_native_knn_matches_bruteforce(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    ref = np.sort(d2, axis=1)[:, :3].mean(1)
    out = native.mean_sq_dist_3nn_cpu(pts)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-7)


def test_native_knn_matches_tpu_path(rng):
    import jax.numpy as jnp

    from luciddreamer_tpu.points.knn import mean_sq_dist_3nn

    pts = rng.normal(size=(300, 3)).astype(np.float32)
    a = native.mean_sq_dist_3nn_cpu(pts)
    b = np.asarray(mean_sq_dist_3nn(jnp.asarray(pts), row_block=64,
                                    col_block=256))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_morton_codes_locality(rng):
    pts = rng.uniform(size=(200, 3)).astype(np.float32)
    codes = native.morton_codes(pts)
    assert codes.shape == (200,)
    # identical points share a code; far corners differ
    two = np.array([[0, 0, 0], [0, 0, 0], [1, 1, 1]], np.float32)
    c = native.morton_codes(two)
    assert c[0] == c[1] != c[2]


def test_morton_subsample(rng):
    pts = rng.uniform(size=(1000, 3)).astype(np.float32)
    idx = native.morton_subsample(pts, 100)
    assert idx.shape == (100,)
    assert len(np.unique(idx)) == 100
    # stratified: the sample spans the cloud's bounding box reasonably
    sub = pts[idx]
    assert (sub.max(0) - sub.min(0)).min() > 0.5
