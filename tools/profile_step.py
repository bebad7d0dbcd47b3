"""Stage-split profile of the benchmark step on the real chip.

Steady-state protocol (same as bench.py): jit one function, chain K
dependent dispatches, pull once; per-step time = (t_K2 - t_K1)/(K2 - K1),
which cancels the ~25 ms axon dispatch round-trip that poisoned the
round-4 cost model.  Stages are cumulative prefixes of the step, so
stage_i - stage_{i-1} is the incremental cost of that stage.

Usage: timeout 560 python tools/profile_step.py [P] [pair_cap]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from luciddreamer_tpu.core.transforms import make_camera
from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.render.binning import build_tile_bins, num_tiles_for
from luciddreamer_tpu.render.preprocess import preprocess_gaussians
from luciddreamer_tpu.render.tiled import render_tiled


def scene(P, seed=42):
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


def steady(fn, arg, K1=2, K2=12, reps=3):
    """Per-step seconds of `s -> fn(arg, s)` chained on scalar s."""
    f = jax.jit(fn)
    s = f(arg, jnp.float32(0))
    jax.block_until_ready(s)

    def run(k):
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            s = jnp.float32(0)
            for _ in range(k):
                s = f(arg, s)
            float(s)
            best = min(best, time.time() - t0)
        return best

    return (run(K2) - run(K1)) / (K2 - K1)


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    pair_cap = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 384
    H = W = 512
    params = scene(P)
    cam = make_camera(np.eye(4), 0.8279, 0.8279, W, H)
    bg = jnp.zeros(3)
    pdict = params.param_pytree()
    alive = params.alive

    def p_of(pd, s):
        return GaussianParams.from_param_pytree(
            dict(pd, xyz=pd["xyz"] + s * 1e-30), alive
        )

    def preproc(pd, s):
        pr = preprocess_gaussians(p_of(pd, s), cam, 3, 16)
        return jnp.sum(pr.mean2d) + jnp.sum(pr.depth)

    def prep_bin(pd, s):
        pr = preprocess_gaussians(p_of(pd, s), cam, 3, 16)
        bins = build_tile_bins(pr, H, W, 16, pair_cap, chunk)
        return jnp.sum(bins.attrs[:, 0]) + bins.num_pairs.astype(jnp.float32)

    def fwd(pd, s):
        out = render_tiled(p_of(pd, s), cam, bg, chunk=chunk,
                           pair_cap=pair_cap, backend="pallas")
        return jnp.sum(out["render"]) + jnp.sum(out["depth"])

    def fwdbwd(pd, s):
        def loss(pd2):
            out = render_tiled(
                GaussianParams.from_param_pytree(pd2, alive), cam, bg,
                chunk=chunk, pair_cap=pair_cap, backend="pallas")
            return (jnp.mean(jnp.abs(out["render"] - 0.5))
                    + 0.1 * jnp.mean(out["depth"]))
        g = jax.grad(loss)(dict(pd, xyz=pd["xyz"] + s * 1e-30))
        return sum(jnp.sum(v) for v in jax.tree.leaves(g))

    rows = [("preprocess fwd", preproc), ("prep+binning fwd", prep_bin),
            ("full fwd", fwd), ("full fwd+bwd", fwdbwd)]
    prev = 0.0
    print(f"P={P} pair_cap={pair_cap} 512x512 chunk={chunk}")
    for name, fn in rows:
        t = steady(fn, pdict)
        print(f"{name:18s} {t*1000:8.1f} ms   (+{(t-prev)*1000:7.1f} ms)")
        prev = t


if __name__ == "__main__":
    main()
