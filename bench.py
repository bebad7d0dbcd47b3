"""Driver benchmark: rays/s (pixels/s) fwd+bwd at 1M Gaussians, 512x512.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no perf numbers (BASELINE.md), so vs_baseline is
reported against the driver-defined north star rather than a published
figure; it is set to the ratio vs this repo's first recorded number so
progress across rounds is visible.

Measurement protocol: ONE jitted fwd+bwd step, dispatched K times
back-to-back with a data dependency between steps and a single host pull at
the end — the steady-state production pattern (Trainer.run never host-syncs
per iteration; it resolves overflow flags with a one-step lag, so the
device queue stays full).  Per-step time = (t_K2 - t_K1) / (K2 - K1), which
cancels the one-off host round-trip of the TPU tunnel (~25 ms) without
inflating compile time.  The render is validated non-overflowing at the
benchmarked pair capacity before timing: a truncated pair list would
silently drop work and inflate rays/s.
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

# reuse compiled executables across runs (the fwd+bwd graph takes minutes to
# compile cold on the axon tunnel; the cache makes driver reruns instant)
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp"),
)


# First TPU-v5e-chip measurement of this repo (round 1, XLA-sort binning +
# pallas blend): 108_164 rays/s fwd+bwd at 1M gaussians.  vs_baseline tracks
# improvement over this anchor.
ROUND1_ANCHOR_RAYS_PER_S = 108_164.0


def main():
    from luciddreamer_tpu.core.transforms import make_camera
    from luciddreamer_tpu.core.types import GaussianParams
    from luciddreamer_tpu.render.tiled import render_tiled

    P = 1_000_000
    H = W = 512
    rng = np.random.default_rng(42)
    params = GaussianParams(
        xyz=jnp.asarray(rng.normal(size=(P, 3)) + [0, 0, 3.0], jnp.float32),
        features_dc=jnp.asarray(rng.normal(size=(P, 1, 3)) * 0.5, jnp.float32),
        features_rest=jnp.asarray(rng.normal(size=(P, 15, 3)) * 0.1, jnp.float32),
        scaling=jnp.asarray(rng.uniform(-5.5, -3.5, size=(P, 3)), jnp.float32),
        rotation=jnp.asarray(rng.normal(size=(P, 4)), jnp.float32),
        opacity=jnp.asarray(rng.uniform(-2.0, 3.0, size=(P, 1)), jnp.float32),
        alive=jnp.ones(P, bool),
    )
    cam = make_camera(np.eye(4), 0.8279, 0.8279, W, H)
    bg = jnp.zeros(3)
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    # ~8% headroom over the scene's true pair count (2.76M with the round-5
    # anisotropy-tightened rects) — the non-overflow assert below guards it,
    # and production grows capacity on overflow anyway.  chunk 384 is the
    # fastest measured blend granularity on v5e (sweep 128..512: 188.6 /
    # 183.4 / 182.3 / 176.4 / 176.9 / 183.3 ms fwd+bwd).
    pair_cap = 3_000_000

    def loss(pdict):
        p = GaussianParams.from_param_pytree(pdict, params.alive)
        out = render_tiled(p, cam, bg, active_sh_degree=3, chunk=384,
                           pair_cap=pair_cap, backend=backend)
        l = (jnp.mean(jnp.abs(out["render"] - 0.5))
             + 0.1 * jnp.mean(out["depth"]))
        return l, out["overflow"]

    def gstep(pdict, s):
        gr, ovf = jax.grad(loss, has_aux=True)(
            dict(pdict, xyz=pdict["xyz"] + s * 1e-30)
        )
        return sum(jnp.sum(v) for v in jax.tree.leaves(gr)), ovf

    pdict = params.param_pytree()
    step = jax.jit(gstep)
    _, ovf = step(pdict, jnp.float32(0))   # compile + warm
    # the benchmarked capacity must hold every pair or rays/s is inflated
    assert not bool(ovf), f"pair_cap {pair_cap} overflowed; benchmark invalid"

    def best(k, reps=3):
        b = 1e9
        for _ in range(reps):
            t0 = time.time()
            s = jnp.float32(0)
            for _ in range(k):
                s, _ = step(pdict, s)
            float(s)
            b = min(b, time.time() - t0)
        return b

    K1, K2 = 1, 10
    t1, t2 = best(K1), best(K2)
    dt = (t2 - t1) / (K2 - K1)
    rays_per_s = H * W / dt
    print(json.dumps({
        "metric": "rays_per_s_fwd_bwd_1M_gaussians_512px",
        "value": round(rays_per_s, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_s / ROUND1_ANCHOR_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
