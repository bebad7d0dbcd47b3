"""Real-TPU hardware gate: run before every round-ending commit.

Round 4 shipped a binning backward that passed the whole CPU suite
(interpret-mode Pallas) but crashed Mosaic compilation at the benchmark's
pair capacity — no CPU test can catch an XLA/Mosaic layout mismatch.  This
script compiles and runs, on the real chip:

  1. the canonical verify drive: 20k Gaussians at 512x512 through the
     public ``render_tiled`` API (pallas backend), jitted fwd+bwd, overflow
     check, finite-grad check, 64x64-crop allclose vs ``render_dense``;
  2. the EXACT benchmark shape: 1M Gaussians, 512x512, pair_cap 4_000_000
     (deliberately NOT 1024-aligned — the round-4 crash shape), chunk 128,
     one jitted fwd+bwd step;
  3. ``__graft_entry__.entry()`` compile + execute.

Warm (compilation cache primed) this takes ~2-4 min; cold ~8 min.
Exit code 0 == gate green.  Run: ``timeout 560 python tools/tpu_smoke.py``.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")


def make_scene(P, seed=7):
    from luciddreamer_tpu.core.types import GaussianParams

    rng = np.random.default_rng(seed)
    return GaussianParams(
        xyz=jnp.asarray(rng.normal(size=(P, 3)) + [0, 0, 3.0], jnp.float32),
        features_dc=jnp.asarray(rng.normal(size=(P, 1, 3)) * 0.5, jnp.float32),
        features_rest=jnp.asarray(
            rng.normal(size=(P, 15, 3)) * 0.1, jnp.float32),
        scaling=jnp.asarray(rng.uniform(-5.5, -3.5, size=(P, 3)), jnp.float32),
        rotation=jnp.asarray(rng.normal(size=(P, 4)), jnp.float32),
        opacity=jnp.asarray(rng.uniform(-2.0, 3.0, size=(P, 1)), jnp.float32),
        alive=jnp.ones(P, bool),
    )


def drive_20k():
    from luciddreamer_tpu.core.transforms import make_camera
    from luciddreamer_tpu.core.types import GaussianParams
    from luciddreamer_tpu.render.dense import render_dense
    from luciddreamer_tpu.render.tiled import render_tiled

    H = W = 512
    params = make_scene(20_000)
    cam = make_camera(np.eye(4), 0.8279, 0.8279, W, H)
    bg = jnp.zeros(3)

    t0 = time.time()
    out = jax.jit(
        lambda p: render_tiled(p, cam, bg, pair_cap=400_000, chunk=128,
                               backend="pallas")
    )(params)
    jax.block_until_ready(out["render"])
    assert not bool(out["overflow"]), "20k drive overflowed pair_cap"
    print(f"[1a] 20k fwd ok ({time.time() - t0:.1f}s incl. compile)")

    def loss(pdict):
        p = GaussianParams.from_param_pytree(pdict, params.alive)
        o = render_tiled(p, cam, bg, pair_cap=400_000, chunk=128,
                         backend="pallas")
        return jnp.mean(jnp.abs(o["render"] - 0.5)) + 0.1 * jnp.mean(o["depth"])

    t0 = time.time()
    gr = jax.jit(jax.grad(loss))(params.param_pytree())
    jax.block_until_ready(gr)
    for k, v in gr.items():
        assert bool(jnp.all(jnp.isfinite(v))), f"non-finite grad in {k}"
    print(f"[1b] 20k fwd+bwd ok, grads finite ({time.time() - t0:.1f}s)")

    # 64x64 crop vs the dense oracle (full dense at 512^2 x 20k is too big)
    crop_cam = make_camera(np.eye(4), 0.8279, 0.8279, W, H)
    dense = render_dense(params, crop_cam, bg)
    tiled_rgb = np.asarray(out["render"][:, 224:288, 224:288])
    dense_rgb = np.asarray(dense["render"][:, 224:288, 224:288])
    err = np.max(np.abs(tiled_rgb - dense_rgb))
    assert err <= 1e-5, f"tiled-vs-dense crop error {err}"
    print(f"[1c] 64x64 crop vs dense oracle ok (max err {err:.2e})")


def bench_shape():
    from luciddreamer_tpu.core.transforms import make_camera
    from luciddreamer_tpu.core.types import GaussianParams
    from luciddreamer_tpu.render.tiled import render_tiled

    H = W = 512
    params = make_scene(1_000_000, seed=42)
    cam = make_camera(np.eye(4), 0.8279, 0.8279, W, H)
    bg = jnp.zeros(3)

    def loss(pdict):
        p = GaussianParams.from_param_pytree(pdict, params.alive)
        o = render_tiled(p, cam, bg, pair_cap=4_000_000, chunk=128,
                         backend="pallas")
        return (jnp.mean(jnp.abs(o["render"] - 0.5))
                + 0.1 * jnp.mean(o["depth"]), o["overflow"])

    t0 = time.time()
    gr, ovf = jax.jit(jax.grad(loss, has_aux=True))(params.param_pytree())
    jax.block_until_ready(gr)
    assert not bool(ovf), "bench shape overflowed pair_cap 4M"
    print(f"[2] bench-shape 1M/512px/cap4M fwd+bwd ok "
          f"({time.time() - t0:.1f}s incl. compile)")


def graft_entry():
    sys.path.insert(0, ".")
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    print("[3] __graft_entry__.entry() compiles + runs")


def main():
    assert jax.default_backend() == "tpu", (
        f"tpu_smoke needs the real chip, got {jax.default_backend()}")
    drive_20k()
    bench_shape()
    graft_entry()
    print("TPU SMOKE: ALL GREEN")


if __name__ == "__main__":
    main()
