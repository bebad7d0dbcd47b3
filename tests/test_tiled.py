"""Tiled (binning + packed chunk blend) path vs the dense oracle.

Forward parity must be near bit-exact: the tiled path composites the same
Gaussians in the same per-tile depth order as the oracle (the stable
(tile, depth) sort reproduces the reference's 64-bit key radix sort,
rasterizer_impl.cu:102-109), so RGB/depth/final_T agree to fp32 roundoff.
Gradients of the tiled path are checked against the dense path's autodiff.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.render.dense import render_dense
from luciddreamer_tpu.render.tiled import render_tiled
from tests.helpers import make_random_gaussians, make_test_camera


@pytest.mark.parametrize(
    "P,W,H,deg,chunk",
    [(60, 32, 32, 3, 16), (200, 48, 32, 1, 32), (300, 40, 56, 0, 64)],
)
def test_tiled_matches_dense_forward(rng, P, W, H, deg, chunk):
    params = make_random_gaussians(P, rng, scale_range=(-3.5, -1.0))
    cam = make_test_camera(W, H)
    bg = jnp.array([0.1, 0.2, 0.3])

    ref = render_dense(params, cam, bg, active_sh_degree=deg, chunk=16)
    out = render_tiled(params, cam, bg, active_sh_degree=deg, chunk=chunk)

    assert not bool(out["overflow"])
    np.testing.assert_allclose(out["render"], ref["render"], atol=3e-5)
    np.testing.assert_allclose(out["depth"], ref["depth"], atol=3e-4)
    np.testing.assert_allclose(out["final_T"], ref["final_T"], atol=3e-5)
    np.testing.assert_allclose(out["acc"], ref["acc"], atol=3e-5)
    np.testing.assert_array_equal(np.asarray(out["radii"]), np.asarray(ref["radii"]))


def test_tiled_respects_dead_capacity_rows(rng):
    """alive=False rows (densify headroom) must not contribute."""
    params = make_random_gaussians(30, rng, capacity=64)
    cam = make_test_camera(32, 32)
    bg = jnp.array([0.5, 0.5, 0.5])
    out = render_tiled(params, cam, bg, active_sh_degree=0)

    # Ground truth: same Gaussians with the dead rows physically removed.
    trimmed = GaussianParams(
        xyz=params.xyz[:30], features_dc=params.features_dc[:30],
        features_rest=params.features_rest[:30], scaling=params.scaling[:30],
        rotation=params.rotation[:30], opacity=params.opacity[:30],
        alive=params.alive[:30],
    )
    ref = render_tiled(trimmed, cam, bg, active_sh_degree=0)
    np.testing.assert_allclose(out["render"], ref["render"], atol=1e-6)
    np.testing.assert_allclose(out["depth"], ref["depth"], atol=1e-6)


def test_tiled_overflow_reported(rng):
    # the counting binning rounds pair_cap up to its 4096 segment size, so
    # the scene must exceed that physical capacity to overflow
    params = make_random_gaussians(500, rng, scale_range=(-1.5, -0.5))
    cam = make_test_camera(64, 64)
    out = render_tiled(params, cam, jnp.zeros(3), pair_cap=32, chunk=16)
    assert int(out["num_pairs"]) > 4096
    assert bool(out["overflow"])


def test_tiled_gradients_match_dense(rng):
    P = 40
    params = make_random_gaussians(P, rng, scale_range=(-3.0, -1.0))
    cam = make_test_camera(32, 32)
    bg = jnp.array([0.2, 0.4, 0.6])
    key = jax.random.PRNGKey(0)
    wr = jax.random.normal(key, (3, 32, 32))
    wd = jax.random.normal(jax.random.fold_in(key, 1), (32, 32))

    def loss(render_fn, pdict):
        p = GaussianParams.from_param_pytree(pdict, params.alive)
        out = render_fn(p, cam, bg, active_sh_degree=2)
        return jnp.sum(out["render"] * wr) + jnp.sum(out["depth"] * wd)

    pdict = params.param_pytree()
    g_dense = jax.grad(lambda p: loss(render_dense, p))(pdict)
    g_tiled = jax.grad(lambda p: loss(render_tiled, p))(pdict)

    for name in pdict:
        gd = np.asarray(g_dense[name])
        gt = np.asarray(g_tiled[name])
        scale = np.abs(gd).max() + 1e-8
        np.testing.assert_allclose(
            gt / scale, gd / scale, atol=2e-4, err_msg=name
        )


def test_tiled_jit_and_nonsquare(rng):
    """jit-compiled tiled render on a non-tile-aligned image size."""
    params = make_random_gaussians(50, rng)
    cam = make_test_camera(40, 24)  # 40x24: grid 3x2 with partial tiles
    bg = jnp.zeros(3)
    f = jax.jit(
        lambda p: render_tiled(p, cam, bg, active_sh_degree=3)["render"]
    )
    out = f(params)
    ref = render_dense(params, cam, bg, active_sh_degree=3)["render"]
    np.testing.assert_allclose(out, ref, atol=3e-5)
