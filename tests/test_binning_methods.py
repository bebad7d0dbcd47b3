"""The counting-sort binning must be bit-identical to the reference-order
(tile, depth) sort method."""
import numpy as np
import pytest

from luciddreamer_tpu.render.binning import build_tile_bins
from luciddreamer_tpu.render.preprocess import preprocess_gaussians
from tests.helpers import make_random_gaussians, make_test_camera


@pytest.mark.parametrize(
    "P,W,H,cap,chunk",
    [(300, 64, 48, 8192, 32), (1000, 80, 80, 12288, 64), (50, 16, 16, 4096, 16)],
)
def test_counting_matches_sort(rng, P, W, H, cap, chunk):
    params = make_random_gaussians(P, rng, scale_range=(-3.5, -1.0))
    cam = make_test_camera(W, H)
    proc = preprocess_gaussians(params, cam, 3, 16)
    b1 = build_tile_bins(proc, H, W, 16, cap, chunk, method="sort")
    b2 = build_tile_bins(proc, H, W, 16, cap, chunk, method="counting")
    # both must land on the same padded capacity for this comparison
    assert b1.attrs.shape == b2.attrs.shape
    for f in b1._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(b1, f)), np.asarray(getattr(b2, f)),
            err_msg=f,
        )


def test_counting_equal_depths_stable(rng):
    """Gaussians at identical depths must keep index order (the stable
    tie-break of the reference radix sort)."""
    params = make_random_gaussians(64, rng)
    params = params.replace(xyz=params.xyz.at[:, 2].set(3.0))  # same depth
    cam = make_test_camera(32, 32)
    proc = preprocess_gaussians(params, cam, 0, 16)
    b1 = build_tile_bins(proc, 32, 32, 16, 4096, 16, method="sort")
    b2 = build_tile_bins(proc, 32, 32, 16, 4096, 16, method="counting")
    np.testing.assert_array_equal(np.asarray(b1.gid), np.asarray(b2.gid))
