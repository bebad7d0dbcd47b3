"""knn, model creation, densify/prune, Adam, opacity reset, PLY round-trip."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luciddreamer_tpu.config import GSConfig
from luciddreamer_tpu.model.gaussians import (
    DensifyStats,
    add_densification_stats,
    create_from_pcd,
    densify_and_prune,
    grow_capacity,
    inverse_sigmoid,
    reset_opacity,
)
from luciddreamer_tpu.model.optim import (
    adam_init,
    adam_update,
    learning_rates,
    xyz_lr_schedule,
)
from luciddreamer_tpu.model import ply
from luciddreamer_tpu.points.knn import knn_sq_dists, mean_sq_dist_3nn


# ---------------- knn ----------------

def _brute_3nn_mean(pts):
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    return np.sort(d2, axis=1)[:, :3].mean(1)


@pytest.mark.parametrize("P", [5, 100, 1000])
def test_knn_exact_vs_bruteforce(rng, P):
    pts = rng.normal(size=(P, 3)).astype(np.float32)
    ref = _brute_3nn_mean(pts.astype(np.float64))
    out = np.asarray(mean_sq_dist_3nn(jnp.asarray(pts), row_block=64,
                                      col_block=256))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-6)


def test_knn_respects_alive_mask(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    alive = np.arange(50) < 30
    out = np.asarray(
        mean_sq_dist_3nn(jnp.asarray(pts), jnp.asarray(alive),
                         row_block=32, col_block=128)
    )
    ref = _brute_3nn_mean(pts[:30].astype(np.float64))
    np.testing.assert_allclose(out[:30], ref, rtol=2e-4, atol=1e-6)
    assert (out[30:] == 0).all()


def test_knn_fewer_than_k_points():
    pts = jnp.array([[0.0, 0, 0], [1.0, 0, 0]])
    out = np.asarray(knn_sq_dists(pts, k=3, row_block=8, col_block=128))
    # only one neighbor exists; missing slots are 0
    np.testing.assert_allclose(out[0], [1.0, 0.0, 0.0])


# ---------------- model creation ----------------

def test_create_from_pcd(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    cols = rng.uniform(size=(100, 3)).astype(np.float32)
    params = create_from_pcd(jnp.asarray(pts), jnp.asarray(cols), capacity=128)
    assert params.capacity == 128
    assert int(params.num_alive) == 100
    # opacity activation = 0.1 (gaussian_model.py:140)
    np.testing.assert_allclose(np.asarray(params.get_opacity())[:100], 0.1,
                               atol=1e-6)
    # DC SH inverts back to the colors
    from luciddreamer_tpu.core.sh import sh2rgb
    np.testing.assert_allclose(
        np.asarray(sh2rgb(params.features_dc[:100, 0])), cols, atol=1e-5
    )
    # scale = 0.5*log(mean 3nn dist^2)
    ref = np.log(np.sqrt(np.maximum(_brute_3nn_mean(pts), 1e-7)))
    np.testing.assert_allclose(np.asarray(params.scaling)[:100, 0], ref,
                               rtol=2e-4, atol=1e-5)


# ---------------- optimizer ----------------

def test_xyz_schedule_matches_reference_formula():
    cfg = GSConfig()
    sched = xyz_lr_schedule(cfg, spatial_lr_scale=2.0)
    assert float(sched(0)) == pytest.approx(cfg.position_lr_init * 2.0, rel=1e-6)
    assert float(sched(2990)) == pytest.approx(cfg.position_lr_final * 2.0, rel=1e-6)
    mid = float(sched(1495))
    geo = np.sqrt(cfg.position_lr_init * cfg.position_lr_final) * 2.0
    assert mid == pytest.approx(geo, rel=1e-3)


def test_adam_matches_torch_semantics(rng):
    """One-param Adam vs a literal numpy transcription of torch.optim.Adam."""
    p = rng.normal(size=(7, 3)).astype(np.float32)
    params = {"xyz": jnp.asarray(p)}
    st = adam_init(params)
    lr = 0.01
    m = np.zeros_like(p); v = np.zeros_like(p)
    pn = p.copy()
    for t in range(1, 4):
        g = rng.normal(size=p.shape).astype(np.float32)
        params, st = adam_update(params, {"xyz": jnp.asarray(g)}, st,
                                 {"xyz": jnp.float32(lr)})
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mh = m / (1 - 0.9**t)
        vh = v / (1 - 0.999**t)
        pn = pn - lr * mh / (np.sqrt(vh) + 1e-15)
    np.testing.assert_allclose(np.asarray(params["xyz"]), pn, rtol=1e-5,
                               atol=1e-6)


# ---------------- densify / prune ----------------

def _toy_params(rng, P=8, capacity=32):
    from tests.helpers import make_random_gaussians

    return make_random_gaussians(P, rng, capacity=capacity)


def test_densify_clone_and_split(rng):
    params = _toy_params(rng)
    P = params.capacity
    # row 0: small scale + high grad -> clone; row 1: large scale + high grad -> split
    scaling = np.array(params.scaling)
    scaling[0] = -8.0
    scaling[1] = 2.0
    params = params.replace(scaling=jnp.asarray(scaling))
    adam = adam_init(params.param_pytree())
    stats = DensifyStats.zero(P)
    g2d = np.zeros((P, 2), np.float32)
    g2d[0] = [1.0, 0.0]
    g2d[1] = [0.0, 1.0]
    radii = np.zeros(P, np.int32)
    radii[:8] = 5
    stats = add_densification_stats(stats, jnp.asarray(g2d), jnp.asarray(radii))

    extent = 1.0
    before = int(params.num_alive)
    params2, adam2, stats2, ovf = densify_and_prune(
        params, adam, stats, jax.random.PRNGKey(0),
        grad_threshold=0.0002, min_opacity=0.0, extent=extent,
        max_screen_size=None,
    )
    # +1 clone, +2 children, -1 split source
    assert int(params2.num_alive) == before + 2
    assert not bool(ovf)
    assert not bool(params2.alive[1])            # split source killed
    # children scale = parent scale / 1.6
    alive_new = np.asarray(params2.alive) & ~np.asarray(params.alive)
    new_rows = np.where(alive_new)[0]
    assert len(new_rows) == 3
    new_scales = np.asarray(params2.scaling)[new_rows]
    kinds = {tuple(np.round(s, 4)) for s in new_scales[:, 0:1]}
    assert any(np.allclose(s, -8.0) for s in new_scales)               # clone
    assert sum(np.allclose(s, 2.0 - np.log(1.6), atol=1e-5)
               for s in new_scales[:, 0]) == 2                          # children
    # new rows have zeroed Adam moments
    assert (np.asarray(adam2.mu["xyz"])[new_rows] == 0).all()
    # stats reset
    assert (np.asarray(stats2.grad_accum) == 0).all()


def test_prune_low_opacity(rng):
    params = _toy_params(rng)
    op = np.array(params.opacity)
    op[2] = inverse_sigmoid(0.001)
    params = params.replace(opacity=jnp.asarray(op))
    adam = adam_init(params.param_pytree())
    stats = DensifyStats.zero(params.capacity)
    params2, *_ = densify_and_prune(
        params, adam, stats, jax.random.PRNGKey(0),
        grad_threshold=1e9, min_opacity=0.005, extent=1.0,
        max_screen_size=None,
    )
    assert not bool(params2.alive[2])
    assert int(params2.num_alive) == int(params.num_alive) - 1


def test_densify_overflow_reported(rng):
    params = _toy_params(rng, P=30, capacity=32)
    adam = adam_init(params.param_pytree())
    stats = DensifyStats.zero(32)
    g2d = np.ones((32, 2), np.float32)
    radii = np.ones(32, np.int32)
    stats = add_densification_stats(stats, jnp.asarray(g2d), jnp.asarray(radii))
    _, _, _, ovf = densify_and_prune(
        params, adam, stats, jax.random.PRNGKey(0),
        grad_threshold=0.0002, min_opacity=0.0, extent=1e9,  # all clones
        max_screen_size=None,
    )
    assert bool(ovf)


def test_grow_capacity(rng):
    params = _toy_params(rng, P=8, capacity=8)
    adam = adam_init(params.param_pytree())
    stats = DensifyStats.zero(8)
    params2, adam2, stats2 = grow_capacity(params, adam, stats, 16)
    assert params2.capacity == 16
    assert int(params2.num_alive) == 8
    np.testing.assert_array_equal(np.asarray(params2.xyz[:8]),
                                  np.asarray(params.xyz))


def test_reset_opacity(rng):
    params = _toy_params(rng)
    adam = adam_init(params.param_pytree())
    adam = adam.replace(mu=dict(adam.mu, opacity=jnp.ones_like(adam.mu["opacity"])))
    params2, adam2 = reset_opacity(params, adam)
    assert float(params2.get_opacity().max()) <= 0.01 + 1e-6
    assert (np.asarray(adam2.mu["opacity"]) == 0).all()


# ---------------- ply ----------------

def test_ply_roundtrip(rng, tmp_path):
    params = _toy_params(rng, P=20, capacity=32)
    path = os.path.join(tmp_path, "scene.ply")
    n = ply.save_ply(params, path)
    assert n == 20
    back = ply.load_ply(path, capacity=32)
    for name in ("xyz", "features_dc", "features_rest", "scaling",
                 "rotation", "opacity"):
        np.testing.assert_allclose(
            np.asarray(getattr(back, name))[:20],
            np.asarray(getattr(params, name))[:20],
            atol=1e-6, err_msg=name,
        )
    assert int(back.num_alive) == 20


def test_ply_header_schema(rng, tmp_path):
    """Attribute names must match the reference 3DGS schema."""
    params = _toy_params(rng, P=4, capacity=4)
    path = os.path.join(tmp_path, "s.ply")
    ply.save_ply(params, path)
    header = open(path, "rb").read(4096).split(b"end_header")[0].decode()
    for attr in ("x", "nx", "f_dc_0", "f_rest_44", "opacity", "scale_2",
                 "rot_3"):
        assert f"property float {attr}\n" in header
