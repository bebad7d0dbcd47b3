"""Aux subsystems: checkpoint round-trip, mark_visible, COLMAP parsers,
NeRF-synthetic loader, phase timers."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.model.gaussians import DensifyStats
from luciddreamer_tpu.model.optim import adam_init
from luciddreamer_tpu.scene.colmap import (
    ColmapCamera,
    ColmapImage,
    qvec2rotmat,
    read_model,
    rotmat2qvec,
    write_cameras_text,
    write_images_text,
)
from luciddreamer_tpu.scene.datasets import read_nerf_synthetic
from luciddreamer_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from luciddreamer_tpu.train.loop import TrainState
from luciddreamer_tpu.utils import PhaseTimer, mark_visible
from tests.helpers import make_random_gaussians, make_test_camera


def test_checkpoint_roundtrip(rng, tmp_path):
    params = make_random_gaussians(20, rng, capacity=32)
    state = TrainState(
        params=params,
        adam=adam_init(params.param_pytree()),
        stats=DensifyStats.zero(32),
        step=jnp.asarray(17, jnp.int32),
    )
    path = os.path.join(tmp_path, "ckpt")
    save_checkpoint(state, path)
    back = load_checkpoint(path)
    assert int(back.step) == 17
    np.testing.assert_array_equal(np.asarray(back.params.xyz),
                                  np.asarray(params.xyz))
    np.testing.assert_array_equal(np.asarray(back.params.alive),
                                  np.asarray(params.alive))
    assert int(back.adam.count) == 0


def test_mark_visible(rng):
    params = make_random_gaussians(10, rng)
    xyz = np.array(params.xyz)
    xyz[0] = [0, 0, -5.0]          # behind camera
    xyz[1] = [0, 0, 0.1]           # inside near plane
    params = params.replace(xyz=jnp.asarray(xyz))
    cam = make_test_camera(16, 16)
    vis = np.asarray(mark_visible(params, cam))
    assert not vis[0] and not vis[1]
    assert vis[2:].all()


def test_qvec_rotmat_roundtrip(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = qvec2rotmat(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(rotmat2qvec(R), q, atol=1e-8)


def test_colmap_text_roundtrip(rng, tmp_path):
    cams = {1: ColmapCamera(1, "PINHOLE", 640, 480,
                            np.array([500.0, 500.0, 320.0, 240.0]))}
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    images = {
        1: ColmapImage(1, q, rng.normal(size=3), 1, "im0.png",
                       np.array([[1.0, 2.0]]), np.array([7])),
    }
    write_cameras_text(cams, os.path.join(tmp_path, "cameras.txt"))
    write_images_text(images, os.path.join(tmp_path, "images.txt"))
    with open(os.path.join(tmp_path, "points3D.txt"), "w") as f:
        f.write("# pts\n1 0.5 0.6 0.7 10 20 30 0.1 1 0\n")

    cams2, images2, (xyz, rgb, err) = read_model(str(tmp_path))
    assert cams2[1].model == "PINHOLE"
    assert cams2[1].width == 640
    np.testing.assert_allclose(images2[1].qvec, q, atol=1e-12)
    np.testing.assert_allclose(xyz[0], [0.5, 0.6, 0.7])
    assert (rgb[0] == [10, 20, 30]).all()


def test_nerf_synthetic_loader(rng, tmp_path):
    from PIL import Image

    os.makedirs(os.path.join(tmp_path, "imgs"), exist_ok=True)
    frames = []
    for i in range(2):
        arr = (rng.uniform(size=(16, 16, 4)) * 255).astype(np.uint8)
        Image.fromarray(arr, "RGBA").save(
            os.path.join(tmp_path, "imgs", f"r_{i}.png"))
        c2w = np.eye(4)
        c2w[0, 3] = i * 0.5
        frames.append({"file_path": f"imgs/r_{i}",
                       "transform_matrix": c2w.tolist()})
    with open(os.path.join(tmp_path, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.7, "frames": frames}, f)

    sd = read_nerf_synthetic(str(tmp_path))
    assert len(sd.views) == 2
    assert sd.views[0].image.shape == (3, 16, 16)
    assert sd.points.shape == (100_000, 3)
    assert sd.cameras_extent > 0


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.summary()


def test_debug_snapshot_and_check(rng, tmp_path):
    from luciddreamer_tpu.utils.debug import (
        NonFiniteError,
        check_finite,
        find_nonfinite,
    )

    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert find_nonfinite(good) == []
    check_finite(good)  # no raise

    bad = {"a": jnp.array([1.0, np.nan]), "ints": jnp.arange(3)}
    names = find_nonfinite(bad)
    assert len(names) == 1 and "a" in names[0]
    import pytest as _pytest

    with _pytest.raises(NonFiniteError) as ei:
        check_finite(bad, outdir=str(tmp_path), tag="t")
    assert ei.value.snapshot_path and os.path.exists(ei.value.snapshot_path)
    loaded = np.load(ei.value.snapshot_path)
    assert any("a" in k for k in loaded.files)


def test_multihost_single_process_helpers():
    from luciddreamer_tpu.parallel.multihost import (
        initialize,
        is_main_process,
        local_shard,
    )

    assert initialize() is False          # single host: no-op
    assert is_main_process()
    assert local_shard([1, 2, 3, 4, 5], axis_size=2, index=0) == [1, 3, 5]
    assert local_shard([1, 2, 3, 4, 5], axis_size=2, index=1) == [2, 4]
