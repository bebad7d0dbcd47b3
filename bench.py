"""Driver benchmark: rays/s (pixels/s) fwd+bwd at 1M Gaussians, 512x512.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no perf numbers (BASELINE.md), so vs_baseline is
reported against the driver-defined north star rather than a published
figure; it is set to the ratio vs this repo's first recorded number so
progress across rounds is visible.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


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
    pair_cap = 4_000_000

    def loss(pdict):
        p = GaussianParams.from_param_pytree(pdict, params.alive)
        out = render_tiled(p, cam, bg, active_sh_degree=3, chunk=128,
                           pair_cap=pair_cap, backend=backend)
        return jnp.mean(jnp.abs(out["render"] - 0.5)) + 0.1 * jnp.mean(out["depth"])

    # reduce the grad pytree to one scalar inside jit and pull it to host
    # each rep: on the axon TPU tunnel, block_until_ready alone has been
    # observed NOT to actually wait, so a device->host transfer is the only
    # trustworthy fence
    def gsum(pdict):
        gr = jax.grad(loss)(pdict)
        return sum(jnp.sum(v) for v in jax.tree.leaves(gr))

    g = jax.jit(gsum)
    pdict = params.param_pytree()
    float(g(pdict))                          # compile + warm
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        float(g(pdict))
    dt = (time.time() - t0) / reps
    rays_per_s = H * W / dt
    print(json.dumps({
        "metric": "rays_per_s_fwd_bwd_1M_gaussians_512px",
        "value": round(rays_per_s, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_s / ROUND1_ANCHOR_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
