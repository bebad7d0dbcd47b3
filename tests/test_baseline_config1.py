"""BASELINE config 1 at full scale: 512x512 render + backward of ~10k
random Gaussians, tiled production path vs the dense oracle, allclose on
RGB + depth AND on the gradients of every parameter group.

The CPU suite already pins this parity at 500 Gaussians / 64x64
(test_tiled.py); the dense oracle at 10k x 512^2 is ~2.6e9 pixel-gaussian
pairs, which only the TPU finishes in sane time — the test therefore skips
off-TPU and is exercised with ``LDT_TEST_TPU=1 python -m pytest
tests/test_baseline_config1.py`` on the chip (done for round 5; both
checks pass at the tolerances below).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.transforms import make_camera
from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.render.dense import render_dense
from luciddreamer_tpu.render.tiled import render_tiled

pytestmark = pytest.mark.slow


def _scene(P, rng):
    return GaussianParams(
        xyz=jnp.asarray(rng.normal(size=(P, 3)) + [0, 0, 3.0], jnp.float32),
        features_dc=jnp.asarray(rng.normal(size=(P, 1, 3)) * 0.5, jnp.float32),
        features_rest=jnp.asarray(
            rng.normal(size=(P, 15, 3)) * 0.1, jnp.float32),
        scaling=jnp.asarray(rng.uniform(-5.0, -3.0, size=(P, 3)), jnp.float32),
        rotation=jnp.asarray(rng.normal(size=(P, 4)), jnp.float32),
        opacity=jnp.asarray(rng.uniform(-2.0, 3.0, size=(P, 1)), jnp.float32),
        alive=jnp.ones(P, bool),
    )


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="dense oracle at 10k x 512^2 needs the TPU (run LDT_TEST_TPU=1)",
)
def test_baseline_config1_10k_512_tiled_vs_dense():
    rng = np.random.default_rng(3)
    P, H, W = 10_000, 512, 512
    params = _scene(P, rng)
    cam = make_camera(np.eye(4), 0.8279, 0.8279, W, H)
    bg = jnp.zeros(3)

    t_out = jax.jit(
        lambda p: render_tiled(p, cam, bg, pair_cap=300_000, chunk=128,
                               backend="pallas")
    )(params)
    assert not bool(t_out["overflow"])
    d_out = jax.jit(lambda p: render_dense(p, cam, bg))(params)

    np.testing.assert_allclose(
        np.asarray(t_out["render"]), np.asarray(d_out["render"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(t_out["depth"]), np.asarray(d_out["depth"]), atol=5e-4
    )

    # gradient parity for every parameter group through the same scalar loss
    tgt = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)

    def loss(renderer):
        def f(pdict):
            p = GaussianParams.from_param_pytree(pdict, params.alive)
            out = renderer(p)
            return (jnp.mean(jnp.abs(out["render"] - tgt))
                    + 0.1 * jnp.mean(out["depth"]))
        return f

    g_t = jax.jit(jax.grad(loss(
        lambda p: render_tiled(p, cam, bg, pair_cap=300_000, chunk=128,
                               backend="pallas")
    )))(params.param_pytree())
    g_d = jax.jit(jax.grad(loss(
        lambda p: render_dense(p, cam, bg)
    )))(params.param_pytree())

    # tolerance relative to the group's max-magnitude gradient: the two
    # paths accumulate per-pixel contributions in different orders (chunked
    # scan vs sorted pair stream), so a handful of ~1e-3-of-max outliers
    # are fp32 reduction noise, not algorithmic drift
    for k in g_d:
        a, b = np.asarray(g_t[k]), np.asarray(g_d[k])
        assert np.isfinite(a).all(), k
        scale = np.max(np.abs(b)) + 1e-12
        err = np.abs(a - b) / scale
        # bulk tight, tail bounded (a couple of per-element outliers at
        # ~1e-2 of max are cutoff-adjacent fp noise, not drift)
        assert np.mean(err <= 5e-3) > 0.9999, (k, np.mean(err <= 5e-3))
        assert np.max(err) < 5e-2, (k, np.max(err))
