"""The JAX dense oracle vs the literal numpy micro-oracle, plus gradient checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luciddreamer_tpu.render.dense import render_dense
from tests import np_oracle
from tests.helpers import (
    camera_to_np,
    make_random_gaussians,
    make_test_camera,
    params_to_np,
)


@pytest.mark.parametrize("P,W,H,deg", [(60, 32, 32, 3), (200, 48, 32, 1)])
def test_dense_matches_numpy(rng, P, W, H, deg):
    params = make_random_gaussians(P, rng, scale_range=(-3.5, -1.0))
    cam = make_test_camera(W, H)
    bg = jnp.array([0.1, 0.2, 0.3])

    out = render_dense(params, cam, bg, active_sh_degree=deg, chunk=16)
    ref = np_oracle.render_np(
        **params_to_np(params), **camera_to_np(cam),
        deg=deg, bg=np.array([0.1, 0.2, 0.3]),
    )
    np.testing.assert_allclose(out["render"], ref["render"], atol=2e-4)
    np.testing.assert_allclose(out["depth"], ref["depth"], atol=2e-3)
    np.testing.assert_allclose(out["final_T"], ref["final_T"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["radii"]), ref["radii"])


def test_dense_opaque_foreground_occludes(rng):
    """A fully opaque near Gaussian should dominate the pixel under it."""
    params = make_random_gaussians(2, rng)
    params = params.replace(
        xyz=jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 5.0]]),
        opacity=jnp.array([[12.0], [12.0]]),   # sigmoid ~ 1
        scaling=jnp.full((2, 3), -2.0),
        rotation=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1)),
    )
    cam = make_test_camera(32, 32)
    out = render_dense(params, cam, jnp.zeros(3), active_sh_degree=0)
    # center pixel depth ~ 1 (the near Gaussian), not 5
    c = out["depth"][16, 16]
    assert abs(float(c) - 1.0) < 0.2


def test_dense_background_only():
    """No Gaussians -> pure background, zero depth."""
    params = make_random_gaussians(4, np.random.default_rng(1))
    params = params.replace(alive=jnp.zeros(4, bool))
    cam = make_test_camera(16, 16)
    bg = jnp.array([0.25, 0.5, 0.75])
    out = render_dense(params, cam, bg, active_sh_degree=0)
    np.testing.assert_allclose(
        out["render"], np.broadcast_to(np.array([0.25, 0.5, 0.75])[:, None, None], (3, 16, 16)),
        atol=1e-6,
    )
    np.testing.assert_allclose(out["depth"], 0.0, atol=1e-6)


def test_dense_gradients_finite_difference(rng):
    """Finite-difference check of the autodiff backward for every param group,
    including the depth output (the path the reference left disabled)."""
    P = 25
    params = make_random_gaussians(P, rng, scale_range=(-3.0, -1.0))
    cam = make_test_camera(24, 24)
    bg = jnp.array([0.3, 0.3, 0.3])
    key = jax.random.PRNGKey(0)
    wr = jax.random.normal(key, (3, 24, 24))
    wd = jax.random.normal(jax.random.fold_in(key, 1), (24, 24))

    def loss_fn(pdict):
        from luciddreamer_tpu.core.types import GaussianParams

        p = GaussianParams.from_param_pytree(pdict, params.alive)
        out = render_dense(p, cam, bg, active_sh_degree=2, chunk=8)
        return jnp.sum(out["render"] * wr) + jnp.sum(out["depth"] * wd)

    pdict = params.param_pytree()
    grads = jax.grad(loss_fn)(pdict)
    f64 = np.float64

    checks = [
        ("xyz", (3, 0)), ("xyz", (7, 2)), ("f_dc", (5, 0, 1)),
        ("f_rest", (2, 3, 0)), ("scaling", (4, 1)),
        ("rotation", (6, 2)), ("opacity", (9, 0)),
    ]
    base = float(loss_fn(pdict))
    for name, idx in checks:
        arr = np.asarray(pdict[name], f64)
        eps = 3e-4
        arr_p = arr.copy(); arr_p[idx] += eps
        arr_m = arr.copy(); arr_m[idx] -= eps
        lp = float(loss_fn({**pdict, name: jnp.asarray(arr_p, jnp.float32)}))
        lm = float(loss_fn({**pdict, name: jnp.asarray(arr_m, jnp.float32)}))
        fd = (lp - lm) / (2 * eps)
        ad = float(np.asarray(grads[name])[idx])
        # fp32 renders limit fd accuracy; compare with mixed tolerance
        assert abs(fd - ad) <= 2e-2 + 0.05 * abs(fd), (name, idx, fd, ad, base)
