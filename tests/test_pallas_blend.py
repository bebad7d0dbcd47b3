"""Pallas blend kernels (interpret mode on CPU) vs the XLA scan path.

The two backends share binning and blend semantics, so forward outputs and
gradients must agree to fp32 roundoff.  On real TPU hardware the same
comparisons run compiled (LDT_TEST_TPU=1).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.render.tiled import render_tiled
from tests.helpers import make_random_gaussians, make_test_camera


@pytest.mark.parametrize("P,W,H,deg", [(80, 32, 32, 3), (250, 48, 32, 1)])
def test_pallas_matches_xla_forward(rng, P, W, H, deg):
    params = make_random_gaussians(P, rng, scale_range=(-3.5, -1.0))
    cam = make_test_camera(W, H)
    bg = jnp.array([0.1, 0.2, 0.3])

    ref = render_tiled(params, cam, bg, active_sh_degree=deg, chunk=32)
    out = render_tiled(
        params, cam, bg, active_sh_degree=deg, chunk=32, backend="pallas"
    )
    np.testing.assert_allclose(out["render"], ref["render"], atol=1e-5)
    np.testing.assert_allclose(out["depth"], ref["depth"], atol=1e-4)
    np.testing.assert_allclose(out["final_T"], ref["final_T"], atol=1e-5)
    np.testing.assert_allclose(out["acc"], ref["acc"], atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(out["n_contrib"]), np.asarray(ref["n_contrib"])
    )


def test_pallas_gradients_match_xla(rng):
    P = 50
    params = make_random_gaussians(P, rng, scale_range=(-3.0, -1.0))
    cam = make_test_camera(32, 32)
    bg = jnp.array([0.2, 0.4, 0.6])
    key = jax.random.PRNGKey(0)
    wr = jax.random.normal(key, (3, 32, 32))
    wd = jax.random.normal(jax.random.fold_in(key, 1), (32, 32))

    def loss(backend, pdict):
        p = GaussianParams.from_param_pytree(pdict, params.alive)
        out = render_tiled(p, cam, bg, active_sh_degree=2, chunk=32,
                           backend=backend)
        # exercise every differentiable output, incl. final_T and acc
        return (
            jnp.sum(out["render"] * wr)
            + jnp.sum(out["depth"] * wd)
            + 0.3 * jnp.sum(out["final_T"] ** 2)
            + 0.1 * jnp.sum(out["acc"])
        )

    pdict = params.param_pytree()
    g_ref = jax.grad(lambda p: loss("xla", p))(pdict)
    g_pal = jax.grad(lambda p: loss("pallas", p))(pdict)

    for name in pdict:
        gr = np.asarray(g_ref[name])
        gp = np.asarray(g_pal[name])
        scale = np.abs(gr).max() + 1e-8
        np.testing.assert_allclose(gp / scale, gr / scale, atol=5e-4,
                                   err_msg=name)


def test_pallas_early_termination_parity(rng):
    """Dense opaque wall: the done-latch path must agree across backends."""
    P = 120
    params = make_random_gaussians(P, rng, scale_range=(-2.5, -1.0), spread=0.3)
    params = params.replace(opacity=jnp.full((P, 1), 8.0))  # sigmoid ~ 1
    cam = make_test_camera(32, 32)
    bg = jnp.zeros(3)
    ref = render_tiled(params, cam, bg, active_sh_degree=0, chunk=16)
    out = render_tiled(params, cam, bg, active_sh_degree=0, chunk=16,
                       backend="pallas")
    assert float(ref["final_T"].min()) < blend_math_tmin() * 10
    np.testing.assert_allclose(out["render"], ref["render"], atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(out["n_contrib"]), np.asarray(ref["n_contrib"])
    )


def blend_math_tmin():
    from luciddreamer_tpu.render import blend_math

    return blend_math.T_MIN
