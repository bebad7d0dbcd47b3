"""Flax ZoeDepth stack: shapes, augmented inference, losses, metrics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from luciddreamer_tpu.models.backbone import DPT, VIT_TINY_TEST
from luciddreamer_tpu.models.zoedepth import (
    FlaxZoeDepth,
    FlaxZoeDepthEstimator,
    ZoeDepthConfig,
    inv_attractor,
    exp_attractor,
)
from luciddreamer_tpu.models import depth_losses as L
from luciddreamer_tpu.models.depth_eval import compute_metrics


def test_dpt_shapes(rng):
    m = DPT(VIT_TINY_TEST, features=32)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    rel, hooks = m.apply(params, x)
    out_conv, l4_rn, r4, r3, r2, r1 = hooks
    assert rel.shape == (1, 64, 64)
    assert out_conv.shape == (1, 64, 64, 32)
    assert l4_rn.shape == (1, 2, 2, 32)      # stride 32
    assert r4.shape == (1, 4, 4, 32)
    assert r1.shape == (1, 32, 32, 32)       # stride 2 after fusion1


def test_zoedepth_forward(rng):
    cfg = ZoeDepthConfig.tiny()
    m = FlaxZoeDepth(cfg)
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    d = out["metric_depth"]
    assert d.shape == (2, 64, 64)
    assert np.isfinite(np.asarray(d)).all()
    # depths bounded by the bin-center clamp
    assert float(d.min()) >= cfg.min_depth - 1e-6
    assert float(d.max()) <= cfg.max_depth + 1e-6


def test_zoedepth_estimator_protocol(rng):
    est = FlaxZoeDepthEstimator()
    img = rng.uniform(size=(48, 56, 3)).astype(np.float32)
    d = np.asarray(est(img))
    assert d.shape == (48, 56)
    assert np.isfinite(d).all()
    assert (d > 0).all()


def test_attractors_pull_towards_points():
    # an attractor exactly at a bin center leaves it fixed; nearby pulls
    assert float(inv_attractor(jnp.float32(0.0), 1000.0, 2.0)) == 0.0
    d = float(inv_attractor(jnp.float32(0.1), 1000.0, 2.0))
    assert 0 < d < 0.1
    e = float(exp_attractor(jnp.float32(0.1), 300.0, 2.0))
    assert 0 < e < 0.1


def test_silog_zero_for_perfect_prediction(rng):
    gt = jnp.asarray(1.0 + rng.uniform(size=(2, 16, 16)), jnp.float32)
    mask = jnp.ones_like(gt, bool)
    assert float(L.silog_loss(gt, gt, mask)) == pytest.approx(0.0, abs=1e-3)
    # scale-invariance: constant scaling only contributes the beta-term
    l_scaled = float(L.silog_loss(gt * 2.0, gt, mask))
    expected = 10.0 * np.sqrt(0.15 * np.log(2.0) ** 2)
    assert l_scaled == pytest.approx(expected, rel=1e-3)


def test_ssi_loss_invariant_to_scale_shift(rng):
    gt = jnp.asarray(1.0 + rng.uniform(size=(2, 16, 16)), jnp.float32)
    mask = jnp.ones_like(gt, bool)
    assert float(
        L.scale_and_shift_invariant_loss(3.0 * gt + 0.7, gt, mask)
    ) == pytest.approx(0.0, abs=1e-4)


def test_grad_l1_and_nll(rng):
    gt = jnp.asarray(1.0 + rng.uniform(size=(1, 8, 8)), jnp.float32)
    mask = jnp.ones_like(gt, bool)
    assert float(L.grad_l1_loss(gt, gt, mask)) == pytest.approx(0.0, abs=1e-5)
    centers = jnp.linspace(0.5, 3.0, 8)
    probs = jnp.full((1, 8, 8, 8), 1.0 / 8)
    nll = float(L.discrete_nll_loss(probs, gt, mask, centers))
    assert nll == pytest.approx(np.log(8.0), rel=1e-4)
    edges = jnp.linspace(0.0, 3.5, 9)
    o = float(L.ordinal_regression_loss(probs, gt, mask, edges))
    assert np.isfinite(o) and o > 0


def test_compute_metrics_perfect_and_offset(rng):
    gt = 1.0 + rng.uniform(size=(32, 32))
    m = compute_metrics(gt, gt)
    assert m["a1"] == 1.0
    assert m["rmse"] == pytest.approx(0.0, abs=1e-9)
    m2 = compute_metrics(gt, gt * 1.3)
    assert m2["abs_rel"] == pytest.approx(0.3, rel=1e-6)
    assert m2["a1"] < 1.0 or m2["a2"] == 1.0
    # crops reduce the valid set but still compute
    m3 = compute_metrics(gt, gt, crop="garg")
    assert m3["a1"] == 1.0


def test_depth_trainer_overfits_tiny_batch(rng):
    from luciddreamer_tpu.models.depth_trainer import (
        DepthTrainConfig,
        DepthTrainer,
    )
    from luciddreamer_tpu.models.zoedepth import ZoeDepthConfig

    cfg = ZoeDepthConfig.tiny()
    # the tiny net needs a gentle lr; the production default (1.61e-4,
    # config_zoedepth.json) is in the same regime
    tcfg = DepthTrainConfig(lr=1e-4, epochs=1, steps_per_epoch=40,
                            pct_start=0.3)
    tr = DepthTrainer(cfg, tcfg, seed=0)
    img = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    depth = jnp.full((1, 64, 64), 2.0)
    losses = [tr.train_batch(img, depth) for _ in range(40)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])
    m = tr.validate([(img, depth)])
    assert np.isfinite(m["abs_rel"])
    assert tr.best_params is not None


def test_depth_trainer_data_parallel_matches_single(rng):
    """DP over an 8-device 'data' mesh must reproduce the single-device
    step exactly (same batch, replicated params, GSPMD grad reduction) —
    the jit equivalent of the reference's DDP (train_mono.py:138-174)."""
    from jax.sharding import Mesh
    from luciddreamer_tpu.models.depth_trainer import (
        DepthTrainConfig,
        DepthTrainer,
    )
    from luciddreamer_tpu.models.zoedepth import ZoeDepthConfig

    if len(jax.device_count() * [0]) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    cfg = ZoeDepthConfig.tiny()
    tcfg = DepthTrainConfig(lr=1e-4, epochs=1, steps_per_epoch=10)
    tr_dp = DepthTrainer(cfg, tcfg, seed=0, mesh=mesh)
    tr_sd = DepthTrainer(cfg, tcfg, seed=0)

    img = jnp.asarray(rng.uniform(size=(8, 64, 64, 3)), jnp.float32)
    depth = jnp.asarray(1.0 + rng.uniform(size=(8, 64, 64)), jnp.float32)
    for _ in range(3):
        l_dp = tr_dp.train_batch(img, depth)
        l_sd = tr_sd.train_batch(img, depth)
        assert l_dp == pytest.approx(l_sd, rel=1e-5)
    a = jax.tree_util.tree_leaves(tr_dp.params)
    b = jax.tree_util.tree_leaves(tr_sd.params)
    # f32 reduction-order noise passes through Adam's 1/sqrt(v) while the
    # second moments are still tiny; ~1e-5 drift after 3 steps is expected
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-5)


def test_depth_data_pipeline(rng, tmp_path):
    import os
    from PIL import Image

    from luciddreamer_tpu.models.depth_data import (
        AugmentConfig,
        augment_sample,
        batched,
        load_nyu_folder,
        round_robin,
    )

    # synthetic NYU-style folder
    d = os.path.join(tmp_path, "scene1")
    os.makedirs(d)
    for i in range(3):
        rgb = (rng.uniform(size=(32, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(os.path.join(d, f"rgb_{i:05d}.jpg"))
        depth = (rng.uniform(size=(32, 48)) * 5000).astype(np.int32)
        Image.fromarray(depth, mode="I").save(
            os.path.join(d, f"sync_depth_{i:05d}.png"))
    items = list(load_nyu_folder(str(tmp_path)))
    assert len(items) == 3
    img, dep = items[0]
    assert img.shape == (32, 48, 3) and dep.shape == (32, 48)
    assert dep.max() <= 5.0 + 1e-6          # mm -> m

    cfg = AugmentConfig(crop_h=24, crop_w=32, rotate_deg=0.0)
    ai, ad = augment_sample(img, dep, np.random.default_rng(0), cfg)
    assert ai.shape == (24, 32, 3) and ad.shape == (24, 32)

    loader = batched(items, 2, np.random.default_rng(0), cfg, repeat=False)
    b_img, b_dep = next(loader)
    assert b_img.shape == (2, 24, 32, 3)

    rr = round_robin(iter([1, 2, 3]), iter(["a", "b", "c"]))
    assert [next(rr) for _ in range(4)] == [1, "a", 2, "b"]


def test_depth_dataset_adapters(rng, tmp_path):
    """Every folder adapter of the reference's dataset suite reads its
    layout (diode/ddad/sunrgbd/diml/ibims/vkitti2 synthesized on disk;
    hypersim needs h5py and is covered by its distance->depth math)."""
    import os
    from PIL import Image

    from luciddreamer_tpu.models.depth_data import (
        DATASETS,
        get_depth_dataset,
        hypersim_distance_to_depth,
    )

    def save_rgb(path, h=16, w=20):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(
            (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        ).save(path)

    def save_u16(path, value, h=16, w=20):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(
            np.full((h, w), value, np.uint16), mode="I;16"
        ).save(path)

    # diode: scene/scan/*.png + *_depth.npy + *_depth_mask.npy
    dd = tmp_path / "diode" / "scene_0" / "scan_0"
    save_rgb(str(dd / "f.png"))
    np.save(dd / "f_depth.npy", np.full((16, 20, 1), 3.0, np.float32))
    mask = np.ones((16, 20, 1), bool)
    mask[0, 0] = False
    np.save(dd / "f_depth_mask.npy", mask)
    (img, dep), = list(get_depth_dataset("diode", str(tmp_path / "diode")))
    assert dep.shape == (16, 20) and dep[1, 1] == 3.0 and dep[0, 0] == 0.0

    # ddad: flat *_rgb.png + *_depth.npy
    save_rgb(str(tmp_path / "ddad" / "000_rgb.png"))
    np.save(tmp_path / "ddad" / "000_depth.npy",
            np.full((16, 20), 7.0, np.float32))
    (img, dep), = list(get_depth_dataset("ddad", str(tmp_path / "ddad")))
    assert dep[0, 0] == 7.0

    # sunrgbd: rgb/rgb/*.jpg + gt/gt/*.png (mm; >8m invalid -> 0)
    save_rgb(str(tmp_path / "sun" / "rgb" / "rgb" / "a.jpg"))
    save_u16(str(tmp_path / "sun" / "gt" / "gt" / "a.png"), 9000)
    (img, dep), = list(get_depth_dataset("sunrgbd", str(tmp_path / "sun")))
    assert dep[0, 0] == 0.0                         # 9 m -> invalid

    # diml indoor: LR/<scene>/color/*_c.png + depth_filled
    save_rgb(str(tmp_path / "diml" / "LR" / "s" / "color" / "x_c.png"))
    save_u16(
        str(tmp_path / "diml" / "LR" / "s" / "depth_filled"
            / "x_depth_filled.png"), 2500,
    )
    (img, dep), = list(
        get_depth_dataset("diml_indoor", str(tmp_path / "diml"))
    )
    assert dep[0, 0] == pytest.approx(2.5)

    # diml outdoor: */outleft/*.png + depthmap
    save_rgb(str(tmp_path / "dimlo" / "s" / "outleft" / "y.png"))
    save_u16(str(tmp_path / "dimlo" / "s" / "depthmap" / "y.png"), 4000)
    (img, dep), = list(
        get_depth_dataset("diml_outdoor", str(tmp_path / "dimlo"))
    )
    assert dep[0, 0] == pytest.approx(4.0)

    # ibims: imagelist.txt + rgb/depth/masks (uint16 * 50 / 65535)
    ib = tmp_path / "ibims"
    save_rgb(str(ib / "rgb" / "im.png"))
    save_u16(str(ib / "depth" / "im.png"), 655)
    save_u16(str(ib / "mask_invalid" / "im.png"), 1)
    save_u16(str(ib / "mask_transp" / "im.png"), 1)
    (ib / "imagelist.txt").write_text("im\n")
    (img, dep), = list(get_depth_dataset("ibims", str(ib)))
    assert dep[0, 0] == pytest.approx(655 * 50.0 / 65535.0)

    # vkitti2: rgb/**/frames/rgb/Camera_0/rgb_*.jpg + mirrored depth (cm)
    vr = tmp_path / "vk" / "rgb" / "Scene01" / "clone" / "frames" / "rgb" \
        / "Camera_0"
    save_rgb(str(vr / "rgb_00000.jpg"))
    vd = tmp_path / "vk" / "depth" / "Scene01" / "clone" / "frames" \
        / "depth" / "Camera_0"
    save_u16(str(vd / "depth_00000.png"), 1200)
    (img, dep), = list(get_depth_dataset("vkitti2", str(tmp_path / "vk")))
    assert dep[0, 0] == pytest.approx(12.0)         # cm -> m

    # hypersim math: on-axis ray distance == planar depth; corners shrink
    dist = np.full((8, 10), 5.0, np.float32)
    pd = hypersim_distance_to_depth(dist)
    assert pd[4, 5] == pytest.approx(5.0, abs=1e-3)
    assert pd[0, 0] < 5.0

    assert sorted(DATASETS) == [
        "ddad", "diml_indoor", "diml_outdoor", "diode", "hypersim",
        "ibims", "kitti", "nyu", "sunrgbd", "vkitti2",
    ]
    with pytest.raises(KeyError):
        get_depth_dataset("nope", ".")


def test_maskops(rng):
    from luciddreamer_tpu.dream.maskops import (
        controlnet_inpaint_condition,
        pad_mask,
    )

    m = np.zeros((16, 16), np.float32)
    m[8, 8] = 1.0
    out = np.asarray(pad_mask(m, 2))
    assert out[8, 8] and out[6, 6] and out[10, 10]
    assert not out[5, 8]

    img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    cond = np.asarray(controlnet_inpaint_condition(img, m))
    assert cond.shape == (1, 3, 16, 16)
    assert (cond[0, :, 8, 8] == -1.0).all()
    np.testing.assert_allclose(cond[0, :, 0, 0], img[0, 0], atol=1e-6)


def test_zoedepth_nk_forward(rng):
    from luciddreamer_tpu.models.zoedepth import ZoeDepthConfig
    from luciddreamer_tpu.models.zoedepth_nk import BinConf, FlaxZoeDepthNK

    cfg = ZoeDepthConfig.tiny()
    confs = (BinConf("nyu", 8, 1e-3, 10.0), BinConf("kitti", 8, 1e-3, 80.0))
    m = FlaxZoeDepthNK(cfg, confs)
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out["metric_depth"].shape == (2, 64, 64)
    assert out["domain_logits"].shape == (2, 2)
    assert out["per_domain_depth"].shape == (2, 64, 64, 2)
    assert np.isfinite(np.asarray(out["metric_depth"])).all()


def test_depth_model_registry_variants(rng):
    """build_depth_model covers all three hub entries (ZoeD_N/K/NK) via
    their tiny twins, routes NK through FlaxZoeDepthNK, and refuses to
    build any full-size model random-initialized (hubconf.py:66,107,150)."""
    from luciddreamer_tpu.models.model_io import (
        available_depth_models,
        build_depth_model,
    )
    from luciddreamer_tpu.models.zoedepth_nk import FlaxZoeDepthNK

    names = available_depth_models()
    for full in ("zoedepth", "zoedepth_k", "zoedepth_nk"):
        assert full in names
        assert f"{full}_tiny" in names
    img = rng.uniform(size=(48, 48, 3)).astype(np.float32)

    est_k = build_depth_model("zoedepth_k_tiny")
    assert est_k.cfg.bin_centers_type == "normed"
    assert est_k.cfg.max_depth == 80.0
    d = np.asarray(est_k(img))
    assert d.shape == (48, 48) and np.isfinite(d).all()
    # normed centers are bounded on (min_depth, max_depth)
    assert d.min() >= est_k.cfg.min_depth - 1e-6
    assert d.max() <= est_k.cfg.max_depth + 1e-6

    est_nk = build_depth_model("zoedepth_nk_tiny")
    assert isinstance(est_nk.model, FlaxZoeDepthNK)
    d = np.asarray(est_nk(img))
    assert d.shape == (48, 48) and np.isfinite(d).all()

    for full in ("zoedepth", "zoedepth_k", "zoedepth_nk"):
        with pytest.raises(RuntimeError, match="needs pretrained weights"):
            build_depth_model(full)


def test_fetch_checked_local(tmp_path, rng):
    import os

    from luciddreamer_tpu.utils.download import fetch_checked, md5_of

    src = os.path.join(tmp_path, "blob.bin")
    data = rng.bytes(1024)
    open(src, "wb").write(data)
    md5 = md5_of(src)
    dest = os.path.join(tmp_path, "cache", "blob.bin")
    out = fetch_checked("file://" + src, dest, md5=md5)
    assert open(out, "rb").read() == data
    # cached verified copy short-circuits
    assert fetch_checked("file:///nonexistent", dest, md5=md5) == dest
    # corrupt cache is rejected and (failing re-download) raises
    open(dest, "wb").write(b"junk")
    import pytest as _pytest

    with _pytest.raises(IOError):
        fetch_checked("file:///nonexistent", dest, md5=md5)
