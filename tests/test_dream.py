"""Dreaming pipeline: warp ops, protocols, and a tiny end-to-end lift."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from luciddreamer_tpu.config import CameraConfig
from luciddreamer_tpu.dream import warp
from luciddreamer_tpu.dream.pipeline import DreamConfig, _align_scale, generate_pcd
from luciddreamer_tpu.dream.protocols import ClassicInpainter, RadialDepth


def _K(f=50.0, W=64, H=64):
    return jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])


def test_unproject_project_roundtrip(rng):
    H = W = 32
    K = _K(40.0, W, H)
    depth = jnp.asarray(1.0 + rng.uniform(size=(H, W)).astype(np.float32))
    R = jnp.eye(3)
    T = jnp.zeros((3, 1))
    pts = warp.unproject(depth, K, R, T)
    pix, z, valid = warp.project(pts, K, R, T, H, W)
    x, y = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    np.testing.assert_allclose(np.asarray(pix[0]), x.reshape(-1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(pix[1]), y.reshape(-1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(depth).reshape(-1),
                               atol=1e-5)
    # boundary pixels can fall out by 1 ulp of the u<=W-1 test; interior must hold
    assert bool(np.asarray(valid).reshape(H, W)[1:-1, 1:-1].all())


def test_splat_identity(rng):
    """Splatting a full grid back onto itself reproduces the image."""
    H = W = 16
    img = rng.uniform(size=(H * W, 3)).astype(np.float32)
    x, y = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    pts = jnp.stack([jnp.asarray(x.reshape(-1)), jnp.asarray(y.reshape(-1))])
    grid, w = warp.splat_linear(pts, jnp.asarray(img),
                                jnp.ones(H * W, bool), H, W)
    np.testing.assert_allclose(np.asarray(grid).reshape(-1, 3), img, atol=1e-5)
    assert float(w.min()) > 0


def test_splat_fills_holes(rng):
    H = W = 16
    keep = rng.uniform(size=H * W) > 0.3          # 30% holes
    img = rng.uniform(size=(H * W, 3)).astype(np.float32)
    x, y = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    pts = jnp.stack([jnp.asarray(x.reshape(-1)), jnp.asarray(y.reshape(-1))])
    grid, w = warp.splat_linear(pts, jnp.asarray(img), jnp.asarray(keep),
                                H, W, fill_iters=8)
    assert np.isfinite(np.asarray(grid)).all()
    # kept pixels exact, holes filled with something in range
    kept = np.asarray(grid).reshape(-1, 3)[keep]
    np.testing.assert_allclose(kept, img[keep], atol=1e-5)
    assert np.asarray(grid).min() >= 0.0


def test_filters_match_scipy(rng):
    from scipy.ndimage import maximum_filter, minimum_filter

    x = rng.uniform(size=(24, 24)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(warp.max_filter(jnp.asarray(x), 9)),
        maximum_filter(x, size=9, mode="constant", cval=-np.inf), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(warp.min_filter(jnp.asarray(x), 11)),
        minimum_filter(x, size=11, mode="constant", cval=np.inf), atol=1e-6
    )


def test_idw_interpolation_exact_at_anchors():
    anchors = jnp.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0]])
    vals = jnp.array([1.0, 2.0, 3.0, 4.0])
    out = warp.idw_interpolate(anchors, vals, anchors)
    np.testing.assert_allclose(np.asarray(out), [1, 2, 3, 4], atol=1e-3)
    mid = warp.idw_interpolate(anchors, vals, jnp.array([[5.0, 5.0]]))
    assert 1.0 < float(mid[0]) < 4.0


def test_classic_inpainter_fills(rng):
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    mask = np.zeros((32, 32), np.float32)
    mask[10:20, 10:20] = 1.0
    out = np.asarray(ClassicInpainter()(img, mask, steps=5))
    assert out.shape == (32, 32, 3)
    # known pixels untouched
    np.testing.assert_allclose(out[0, 0], img[0, 0], atol=1e-6)
    # hole filled within [0, 1]
    assert out[15, 15].min() >= 0 and out[15, 15].max() <= 1


def test_radial_depth_positive(rng):
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    d = np.asarray(RadialDepth()(img))
    assert d.shape == (32, 32)
    assert (d > 0).all()


def test_align_scale_closed_form(rng):
    """closed_form must recover a known scale factor exactly."""
    H = W = 16
    K = _K(20.0, W, H)
    R = jnp.eye(3)
    T = jnp.zeros((3, 1))
    depth = jnp.asarray(2.0 + rng.uniform(size=(H, W)).astype(np.float32))
    true_pts = warp.unproject(depth, K, R, T) * 1.7     # cloud at scale 1.7
    pix, z, valid = warp.project(true_pts / 1.7, K, R, T, H, W)
    sc = _align_scale("closed_form", true_pts, pix, valid, depth, K, R, T)
    assert float(sc) == pytest.approx(1.7, rel=1e-4)
    # reference mode reproduces the no-op (sc = 1)
    sc_ref = _align_scale("reference", true_pts, pix, valid, depth, K, R, T)
    assert float(sc_ref) == 1.0
    sc_adam = _align_scale("adam", true_pts, pix, valid, depth, K, R, T)
    # 100 Adam steps at lr 1e-3 move toward 1.7 but slowly
    assert 1.0 < float(sc_adam) <= 1.7


def test_generate_pcd_end_to_end(rng):
    """Tiny full dreaming run with the weight-free models."""
    cam = CameraConfig(image_width=64, image_height=64, focal=(70.0, 70.0))
    img = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    td = generate_pcd(
        img, prompt="a test scene", pcdgenpath="rotate360",
        seed=1, diff_steps=2, cam=cam,
        config=DreamConfig(fill_iters=4),
    )
    assert td["pcd_points"].shape[0] == 3
    assert td["pcd_points"].shape[1] >= 64 * 64
    assert td["pcd_colors"].shape[1] == 3
    assert len(td["frames"]) == 10 * 5      # 10 poses x 5 hemisphere
    fr = td["frames"][0]
    assert fr["image"].shape == (64, 64, 3)
    assert fr["image"].dtype == np.uint8
    assert np.asarray(fr["depth"]).shape == (64, 64)
    assert np.isfinite(td["pcd_points"]).all()


def test_generate_pcd_feeds_scene_and_training(rng):
    """traindata from dreaming must flow into Scene + a few train steps."""
    from luciddreamer_tpu.config import GSConfig
    from luciddreamer_tpu.model.gaussians import create_from_pcd
    from luciddreamer_tpu.scene import Scene
    from luciddreamer_tpu.train.loop import Trainer

    cam = CameraConfig(image_width=64, image_height=64, focal=(70.0, 70.0))
    img = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    td = generate_pcd(img, pcdgenpath="rotate360", seed=1, diff_steps=1,
                      cam=cam, config=DreamConfig(fill_iters=2))
    sc = Scene(td)
    # subsample the cloud for a fast test
    stride = max(1, sc.pcd_points.shape[0] // 500)
    pts = sc.pcd_points[::stride][:500]
    cols = sc.pcd_colors[::stride][:500]
    params = create_from_pcd(jnp.asarray(pts), jnp.asarray(cols),
                             capacity=1024)
    cfg = GSConfig(iterations=5, densify_from_iter=100)
    tr = Trainer(params, cfg, cameras_extent=sc.cameras_extent, seed=0)
    st = tr.run(sc.get_train_views()[:3])
    assert int(st.step) == 5
