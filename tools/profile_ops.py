"""TRUE device-side op costs: chain K dependent iterations inside one jit
and report the per-iteration slope, so the ~26 ms axon host-round-trip
latency (measured by tools/profile_preproc.py: even a 4-op elementwise
kernel 'costs' 26 ms with per-call host pulls) cancels out.
"""
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
    """body: carry -> carry (device arrays). Times K chained reps."""

    def run(c, n):
        return jax.lax.fori_loop(0, n, lambda i, c: body(c), c)

    f1 = jax.jit(functools.partial(run, n=1))
    fK = jax.jit(functools.partial(run, n=K))

    def pull(c):
        return float(sum(jnp.sum(x[..., :1].astype(jnp.float32))
                         for x in jax.tree.leaves(c)))

    pull(f1(init)); pull(fK(init))
    t1 = 1e9
    tK = 1e9
    for _ in range(3):
        t0 = time.time(); pull(f1(init)); t1 = min(t1, time.time() - t0)
        t0 = time.time(); pull(fK(init)); tK = min(tK, time.time() - t0)
    per = (tK - t1) / (K - 1)
    print(f"{name:44s} {per*1e3:8.2f} ms/iter   (1x {t1*1e3:6.1f} ms)",
          flush=True)


i32 = lambda n: jnp.asarray(rng.integers(0, P, size=n), jnp.int32)
f32 = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)

table16 = f32(P + 1, 16)
idx = i32(PAIRS)
offsets = jnp.sort(i32(P) % PAIRS)
rows16 = f32(PAIRS, 16)

# --- gathers ---
slope("gather (P+1,16)[4M idx]",
      lambda c: (table16, (c[1] + 1) % (P + 1)),
      (table16, idx))
slope("gather rows4 (P,4)[4M idx]",
      lambda c: (c[0], (c[1] + 1) % P),
      (f32(P, 4), idx))

# --- scatter marks ---
slope("scatter-add int32 P marks into 4M",
      lambda c: ((jnp.zeros((PAIRS,), jnp.int32).at[c[0]].add(1, mode="drop"),
                  (c[0] + 1) % PAIRS)[1], c[1]),
      (offsets, jnp.zeros((PAIRS,), jnp.int32)))


def scatter_body(c):
    off, acc = c
    marks = jnp.zeros((PAIRS,), jnp.int32).at[off].add(1, mode="drop")
    return ((off + 1) % PAIRS, acc + marks[:1])


slope("scatter-add P marks (kept)", scatter_body,
      (offsets, jnp.zeros((1,), jnp.int32)))

# --- cumsum ---
slope("cumsum 4M i32",
      lambda c: (jnp.cumsum(c[0]) % 7,),
      (i32(PAIRS),))
slope("cumsum (4M,16) f32",
      lambda c: (jnp.cumsum(c[0], axis=0) * 1e-6,),
      (rows16,))

# --- sorts ---
key0 = jnp.asarray(rng.integers(0, 2**30, size=PAIRS), jnp.uint32)


def sort3_body(c):
    k, a, b = c
    ks, as_, bs = jax.lax.sort((k, a, b), num_keys=1, is_stable=False)
    return (ks ^ jnp.uint32(0x5A5A5A), as_, bs)


slope("pair sort 1key+2carry 4M", sort3_body, (key0, idx, idx))


def sort2_body(c):
    k, a = c
    ks, as_ = jax.lax.sort((k, a), num_keys=1, is_stable=False)
    return (ks ^ jnp.uint32(0x5A5A5A), as_)


slope("pair sort 1key+1carry 4M", sort2_body, (key0, idx))


def psort_body(c):
    k, a = c
    ks, as_ = jax.lax.sort((k, a), num_keys=1, is_stable=False)
    return (ks ^ jnp.int32(123456), as_)


slope("P-scale sort 1key+1carry 1M", psort_body,
      (i32(P), jnp.arange(P, dtype=jnp.int32)))

# --- elementwise at pair scale for reference ---
slope("elementwise 6 ops on 4M",
      lambda c: (c[0] * 1.000001 + jnp.sin(c[0]) * 1e-6,),
      (f32(PAIRS),))

# --- searchsorted 1025 bounds in 4M ---
bounds = jnp.asarray(np.linspace(0, 2**30, 1025), jnp.uint32)
slope("searchsorted 1k bounds in 4M",
      lambda c: (c[0] ^ jnp.uint32(jnp.sum(jnp.searchsorted(c[0], bounds)) & 0xFF),),
      (jnp.sort(key0),))
