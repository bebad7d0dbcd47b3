"""Trajectory generators, scene binding, camera json loading, losses."""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from luciddreamer_tpu import trajectory
from luciddreamer_tpu.scene import Scene, load_camera_json
from luciddreamer_tpu.train.losses import near_mean_map, psnr, ssim


# ---------------- trajectories ----------------

def test_pose_counts():
    assert trajectory.get_pcdgen_poses("rotate360").shape == (10, 3, 4)
    assert trajectory.get_pcdgen_poses("lookaround").shape == (21, 3, 4)
    assert trajectory.get_pcdgen_poses("lookdown").shape == (14, 3, 4)
    assert trajectory.get_pcdgen_poses(
        "hemisphere", {"center_depth": 2.0}
    ).shape == (5, 3, 4)
    paths = trajectory.get_camera_paths()
    assert len(paths["back_and_forth"]["frames"]) == 201
    assert len(paths["llff"]["frames"]) == 400
    assert len(paths["headbanging"]["frames"]) == 720


def test_rotate360_angles():
    poses = trajectory.get_pcdgen_poses("rotate360")
    # pose i yaws by 36 deg * i about +y (utils/trajectory.py:168-176)
    for i in (0, 3, 7):
        th = np.deg2rad(36.0 * i)
        expect = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]]
        )
        np.testing.assert_allclose(poses[i, :3, :3], expect, atol=1e-12)
        np.testing.assert_allclose(poses[i, :3, 3], 0.0, atol=1e-12)


def test_lookaround_rows():
    poses = trajectory.get_pcdgen_poses("lookaround")
    # first pose = identity (th=0, phi=0)
    np.testing.assert_allclose(poses[0, :3, :3], np.eye(3), atol=1e-12)
    # rows of 7: poses 7..13 pitch by -22.5
    phi = np.deg2rad(-22.5)
    expect = np.array(
        [[1, 0, 0], [0, np.cos(phi), -np.sin(phi)], [0, np.sin(phi), np.cos(phi)]]
    )
    np.testing.assert_allclose(poses[7, :3, :3], expect, atol=1e-12)


def test_poses_are_orthonormal():
    for name in ("lookaround", "lookdown", "rotate360"):
        poses = trajectory.get_pcdgen_poses(name)
        RtR = np.einsum("nij,nik->njk", poses[:, :3, :3], poses[:, :3, :3])
        np.testing.assert_allclose(
            RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-10
        )


def test_hemisphere_orbits_center():
    d = 3.0
    poses = trajectory.get_pcdgen_poses("hemisphere", {"center_depth": d})
    # every camera looks at / stays distance d from the center (0,0,d):
    for p in poses:
        R, t = p[:3, :3], p[:3, 3]
        cam_center = -R.T @ t
        np.testing.assert_allclose(
            np.linalg.norm(cam_center - np.array([0, 0, d])), d, atol=1e-9
        )


def test_w2c_to_c2w_roundtrip():
    poses = trajectory.get_pcdgen_poses("lookdown")
    yz = np.diag([1.0, -1.0, -1.0])
    for p in poses[:3]:
        c2w = trajectory.w2c_pose_to_c2w(p)
        # undo the Blender yz flip (as the scene loader does) and compare
        c2w2 = c2w.copy()
        c2w2[:3, 1:3] *= -1
        w2c = np.linalg.inv(c2w2)
        np.testing.assert_allclose(w2c[:3, :3], p[:3, :3], atol=1e-10)
        np.testing.assert_allclose(w2c[:3, 3], p[:3, 3], atol=1e-10)


# ---------------- scene ----------------

def _toy_traindata(n_frames=3, H=16, W=16):
    rng = np.random.default_rng(0)
    frames = []
    # hemisphere poses have nonzero translation -> nonzero scene extent
    poses = trajectory.get_pcdgen_poses(
        "hemisphere", {"center_depth": 2.0}
    )[:n_frames]
    for p in poses:
        frames.append(
            {
                "image": rng.uniform(size=(H, W, 3)).astype(np.float32),
                "transform_matrix": trajectory.w2c_pose_to_c2w(p),
            }
        )
    return {
        "camera_angle_x": 0.8279,
        "W": W, "H": H,
        "pcd_points": rng.normal(size=(3, 50)).astype(np.float32),
        "pcd_colors": rng.uniform(size=(50, 3)).astype(np.float32),
        "frames": frames,
    }


def test_scene_builds():
    td = _toy_traindata()
    sc = Scene(td)
    assert len(sc.get_train_views()) == 3
    v = sc.get_train_views()[0]
    assert v.image.shape == (3, 16, 16)
    assert v.camera.width == 16
    assert sc.cameras_extent > 0
    assert len(sc.get_preset_cameras("llff")) == 400
    assert sc.pcd_points.shape == (50, 3)


def test_scene_identity_pose_camera():
    """An identity w2c pose must produce an identity view matrix."""
    td = _toy_traindata(1)
    td["frames"][0]["transform_matrix"] = trajectory.w2c_pose_to_c2w(
        np.hstack([np.eye(3), np.zeros((3, 1))])
    )
    sc = Scene(td)
    vm = np.asarray(sc.get_train_views()[0].camera.viewmatrix)
    np.testing.assert_allclose(vm, np.eye(4), atol=1e-6)


def test_load_camera_json(tmp_path):
    poses = trajectory.get_pcdgen_poses("rotate360")
    data = {
        "camera_angle_x": 0.69,
        "frames": [
            {"transform_matrix": trajectory.w2c_pose_to_c2w(p)[:3].tolist()}
            for p in poses
        ],
    }
    path = os.path.join(tmp_path, "cams.json")
    json.dump(data, open(path, "w"))
    cams = load_camera_json(path, H=64, W=64)
    assert len(cams) == 10
    assert cams[0].height == 64
    vm = np.asarray(cams[0].viewmatrix)
    np.testing.assert_allclose(vm, np.eye(4), atol=1e-6)


# ---------------- losses ----------------

def test_ssim_identical_images():
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(3, 32, 32)),
                      jnp.float32)
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-4)


def test_ssim_matches_dense_window(rng):
    """Separable blur == the reference's dense 11x11 outer-product window."""
    from scipy.signal import convolve2d

    a = rng.uniform(size=(1, 24, 24)).astype(np.float32)
    b = rng.uniform(size=(1, 24, 24)).astype(np.float32)

    g = np.exp(-((np.arange(11) - 5) ** 2) / (2 * 1.5**2))
    g = (g / g.sum()).astype(np.float64)
    win = np.outer(g, g)
    blur = lambda x: convolve2d(x, win, mode="same", boundary="fill")
    mu1, mu2 = blur(a[0]), blur(b[0])
    s1 = blur(a[0] * a[0]) - mu1**2
    s2 = blur(b[0] * b[0]) - mu2**2
    s12 = blur(a[0] * b[0]) - mu1 * mu2
    C1, C2 = 0.01**2, 0.03**2
    ref = np.mean(
        ((2 * mu1 * mu2 + C1) * (2 * s12 + C2))
        / ((mu1**2 + mu2**2 + C1) * (s1 + s2 + C2))
    )
    out = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert out == pytest.approx(ref, abs=2e-5)


def test_psnr():
    a = jnp.zeros((3, 8, 8))
    b = jnp.full((3, 8, 8), 0.1)
    assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-4)


def test_near_mean_map():
    arr = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
    mask = jnp.ones((4, 4), jnp.float32)
    out = near_mean_map(arr, mask)
    # interior pixel (1,1)=5: neighbors 1,4,6,9 -> mean 5
    assert float(out[1, 1]) == pytest.approx(5.0, abs=1e-4)


def test_export_camera_json_roundtrip(tmp_path):
    from luciddreamer_tpu.trajectory.export import export_all, export_camera_json

    path = export_camera_json("rotate360", os.path.join(tmp_path, "r.json"))
    cams = load_camera_json(path, H=32, W=32)
    assert len(cams) == 720
    paths = export_all(os.path.join(tmp_path, "all"))
    assert len(paths) == 22
    llff = load_camera_json(os.path.join(tmp_path, "all", "llff.json"),
                            H=16, W=16)
    assert len(llff) == 400


def test_exported_presets_match_reference_artifacts(tmp_path):
    """Every one of the 22 shipped cameras/*.json presets is regenerated
    bit-parity-close (fov + all pose matrices) by our trajectory sweep."""
    import glob
    import json

    from luciddreamer_tpu.trajectory.export import export_all

    refs = sorted(glob.glob("/root/reference/cameras/*.json"))
    if not refs:
        pytest.skip("reference cameras not mounted")
    export_all(str(tmp_path))
    for ref in refs:
        name = os.path.basename(ref)
        with open(ref) as f:
            a = json.load(f)
        with open(tmp_path / name) as f:
            b = json.load(f)
        assert abs(a["camera_angle_x"] - b["camera_angle_x"]) < 1e-6, name
        fa = np.asarray([fr["transform_matrix"] for fr in a["frames"]])
        fb = np.asarray([fr["transform_matrix"] for fr in b["frames"]])
        assert fa.shape == fb.shape, name
        np.testing.assert_allclose(fa, fb, atol=1e-9, err_msg=name)


def test_reference_camera_presets_load():
    """The reference's shipped cameras/*.json files parse with our loader
    (schema compatibility, SURVEY.md layer map aux row)."""
    import glob

    files = sorted(glob.glob("/root/reference/cameras/*.json"))
    if not files:
        pytest.skip("reference cameras not mounted")
    total = 0
    for f in files[:5]:
        cams = load_camera_json(f, H=64, W=64)
        assert len(cams) > 0
        vm = np.asarray(cams[0].viewmatrix)
        # valid rigid transform: orthonormal rotation block
        RtR = vm[:3, :3] @ vm[:3, :3].T
        np.testing.assert_allclose(RtR, np.eye(3), atol=1e-4)
        total += len(cams)
    assert total > 0
