"""Fixed gather slopes (profile_ops.py v1 let XLA DCE the gathers)."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

K = 16
PAIRS = 4_000_000
P = 1_000_000
rng = np.random.default_rng(0)


def slope(name, body, init):
    def run(c, n):
        return jax.lax.fori_loop(0, n, lambda i, c: body(c), c)

    f1 = jax.jit(functools.partial(run, n=1))
    fK = jax.jit(functools.partial(run, n=K))

    def pull(c):
        return float(sum(jnp.sum(x[..., :1].astype(jnp.float32))
                         for x in jax.tree.leaves(c)))

    pull(f1(init)); pull(fK(init))
    t1 = 1e9; tK = 1e9
    for _ in range(3):
        t0 = time.time(); pull(f1(init)); t1 = min(t1, time.time() - t0)
        t0 = time.time(); pull(fK(init)); tK = min(tK, time.time() - t0)
    print(f"{name:44s} {(tK - t1) / (K - 1) * 1e3:8.2f} ms/iter", flush=True)


table16 = jnp.asarray(rng.normal(size=(P + 1, 16)), jnp.float32)
table4 = jnp.asarray(rng.normal(size=(P, 4)), jnp.float32)
idx = jnp.asarray(rng.integers(0, P, size=PAIRS), jnp.int32)
acc16 = jnp.zeros((16,), jnp.float32)


def g16_body(c):
    i, acc = c
    rows = table16[i]                      # (4M, 16) gather
    return ((i + 1) % (P + 1), acc + rows[0])


slope("gather (P+1,16)[4M idx] (real)", g16_body, (idx, acc16))


def g4_body(c):
    i, acc = c
    rows = table4[i]
    return ((i + 1) % P, acc + rows[0])


slope("gather (P,4)[4M idx] (real)", g4_body, (idx, jnp.zeros(4)))


def g1_body(c):
    i, acc = c
    vals = table16[:, 0][i]                # 1-wide gather
    return ((i + 1) % P, acc + vals[:1])


slope("gather (P,)[4M idx] (real)", g1_body, (idx, jnp.zeros(1)))

# sorted (monotone) indices: does locality help XLA gather on TPU?
sidx = jnp.sort(idx)


def g16s_body(c):
    i, acc = c
    rows = table16[i]
    return (jnp.minimum(i + 1, P), acc + rows[0])


slope("gather (P+1,16)[4M SORTED idx]", g16s_body, (sidx, acc16))

# row scatter-add: (4M,16) rows into (P+1,16) — the op sorted_gather avoids
d16 = jnp.asarray(rng.normal(size=(PAIRS, 16)), jnp.float32)


def sc_body(c):
    i, acc = c
    out = jnp.zeros((P + 1, 16), jnp.float32).at[i].add(d16)
    return ((i + 1) % (P + 1), acc + out[0])


slope("scatter-add (4M,16) rows -> (P+1,16)", sc_body, (idx, acc16))
