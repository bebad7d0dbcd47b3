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
