"""Micro-ops with host-pull forcing (axon block_until_ready doesn't sync)
and position-dependent reductions (so sorts can't be simplified away)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

P = 1_000_000
PAIR_CAP = 4_000_000
rng = np.random.default_rng(0)

W1 = jnp.asarray(rng.normal(size=(PAIR_CAP,)), jnp.float32)


def posdep(x):
    """Position-dependent scalar: defeats reduce(sort) -> reduce(x)."""
    x = x.astype(jnp.float32)
    if x.ndim == 2:
        x = x[:, 0]
    return jnp.dot(x[: W1.shape[0]], W1[: x.shape[0]])


def timeit(name, fn, *args, reps=5):
    f = jax.jit(lambda *a: posdep(fn(*a)))
    float(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            v = float(f(*args))
        best = min(best, (time.time() - t0) / reps)
    print(f"{name:56s} {best*1e3:9.2f} ms", flush=True)


x1 = jnp.asarray(rng.normal(size=(PAIR_CAP,)), jnp.float32)
x16 = jnp.asarray(rng.normal(size=(PAIR_CAP, 16)), jnp.float32)
timeit("copy (4M,16) f32 (x+1)", lambda x: x + 1.0, x16)
timeit("cumsum (4M,) f32", lambda x: jnp.cumsum(x), x1)
timeit("cumsum (4M,) i32", lambda x: jnp.cumsum(x),
       jnp.asarray(rng.integers(0, 3, size=PAIR_CAP), jnp.int32))
timeit("cumsum (4M,16) f32 axis0", lambda x: jnp.cumsum(x, 0), x16)

counts = np.maximum(rng.poisson(3.4, size=P), 0).astype(np.int32)
cum = np.cumsum(counts)
offs = jnp.asarray(cum - counts)
rows16 = jnp.asarray(rng.normal(size=(P, 16)), jnp.float32)
timeit("delta-scatter (1M,16)f32 rows at sorted offsets",
       lambda o, r: jnp.zeros((PAIR_CAP, 16), jnp.float32)
       .at[o].add(r, mode="drop"), offs, rows16)
timeit("delta-scatter (1M,16) rows +sorted/unique flags",
       lambda o, r: jnp.zeros((PAIR_CAP, 16), jnp.float32)
       .at[o].add(r, mode="drop", indices_are_sorted=True,
                  unique_indices=True), offs, rows16)
timeit("delta-scatter 1-col (1M,)i32",
       lambda o: jnp.zeros((PAIR_CAP,), jnp.int32).at[o].add(1, mode="drop"),
       offs)

key = jnp.asarray(rng.integers(0, 1 << 30, size=PAIR_CAP), jnp.int32)
key2 = jnp.asarray(rng.integers(0, 1 << 30, size=PAIR_CAP), jnp.int32)
ops16 = [x16[:, i] + 0.0 for i in range(16)]
slot = jnp.arange(PAIR_CAP, dtype=jnp.int32)
timeit("sort 1key 1-op", lambda k: jax.lax.sort(
    (k,), num_keys=1, is_stable=False)[0], key)
timeit("sort 1key 2-op", lambda k, s: jax.lax.sort(
    (k, s), num_keys=1, is_stable=False)[1], key, slot)
timeit("sort 1key 18-op (key+slot+16f32)",
       lambda k, s, *o: jax.lax.sort((k, s) + o, num_keys=1,
                                     is_stable=False)[5], key, slot, *ops16)
timeit("sort 1key 10-op", lambda k, s, *o: jax.lax.sort(
    (k, s) + o, num_keys=1, is_stable=False)[5], key, slot, *ops16[:8])
timeit("sort 3key 4-op int", lambda a, b, c, d: jax.lax.sort(
    (a, b, c, d), num_keys=3, is_stable=False)[3], key, key2, slot, slot)
timeit("sort 1key 2-op P-scale (1M)", lambda k, s: jax.lax.sort(
    (k, s), num_keys=1, is_stable=False)[1], key[:P], slot[:P])

table = jnp.asarray(rng.normal(size=(P + 1, 16)), jnp.float32)
gid_rand = jnp.asarray(rng.integers(0, P, size=PAIR_CAP), jnp.int32)
gid_mono = jnp.sort(gid_rand)
timeit("gather (4M,16) random idx", lambda t, g: t[g], table, gid_rand)
timeit("gather (4M,16) monotone idx", lambda t, g: t[g], table, gid_mono)
timeit("gather (4M,16) mono + sorted-flag",
       lambda t, g: jnp.take(t, g, axis=0, indices_are_sorted=True,
                             mode="fill", fill_value=0.0), table, gid_mono)
timeit("gather (4M,4)i32 random", lambda t, g: t[g],
       jnp.asarray(rng.integers(0, 100, size=(P + 1, 4)), jnp.int32),
       gid_rand)
timeit("gather (4M,1)f32 random", lambda t, g: t[g], table[:, :1], gid_rand)
small = jnp.asarray(rng.normal(size=(1024,)), jnp.float32)
sidx = jnp.asarray(rng.integers(0, 1024, size=PAIR_CAP), jnp.int32)
timeit("gather (4M,) from 1024 table", lambda t, g: t[g], small, sidx)
sidx_mono = jnp.sort(sidx)
timeit("gather (4M,) from 1024 table mono", lambda t, g: t[g], small,
       sidx_mono)
chunk_tile = jnp.asarray(rng.integers(0, 1024, size=PAIR_CAP // 128),
                         jnp.int32)
timeit("repeat chunk_tile x128", lambda c: jnp.repeat(c, 128), chunk_tile)

dest = jnp.sort(jnp.asarray(rng.integers(0, PAIR_CAP, size=PAIR_CAP),
                            jnp.int32))
gs = jnp.asarray(rng.integers(0, P, size=PAIR_CAP), jnp.int32)
timeit("scatter-set 4M i32 sorted idx",
       lambda d, g: jnp.full((PAIR_CAP,), P, jnp.int32)
       .at[d].set(g, mode="drop"), dest, gs)
timeit("scatter-set 4M i32 sorted idx +flags",
       lambda d, g: jnp.full((PAIR_CAP,), P, jnp.int32)
       .at[d].set(g, mode="drop", indices_are_sorted=True,
                  unique_indices=True), dest, gs)
timeit("searchsorted 1025 in 4M sorted",
       lambda t: jnp.searchsorted(t, jnp.arange(1025, dtype=jnp.int32),
                                  side="left").astype(jnp.int32), dest)
