"""Micro-ops, amortized: K dependency-chained applications inside one jit,
one host pull; per-op cost = (t_K - t_0) via linear fit over two K values.
Immune to host round-trip latency and to XLA dead-code tricks."""
import time

import numpy as np
import jax
import jax.numpy as jnp

P = 1_000_000
PAIR_CAP = 4_000_000
rng = np.random.default_rng(0)


def run(fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        float(f(*args))
        best = min(best, time.time() - t0)
    return best


def timeit(name, chain, *args, k1=1, k2=4):
    """chain(k, *args) applies the op k times with data dependencies."""
    t1 = run(lambda *a: chain(k1, *a), *args)
    t2 = run(lambda *a: chain(k2, *a), *args)
    per = (t2 - t1) / (k2 - k1)
    print(f"{name:56s} {per*1e3:9.2f} ms", flush=True)


x16 = jnp.asarray(rng.normal(size=(PAIR_CAP, 16)), jnp.float32)
x1 = x16[:, 0] + 0.0


def chain_ew(k, x):
    for i in range(k):
        x = x * 1.000001 + float(i)
    return x[0, 0] + x[-1, -1]


timeit("elementwise (4M,16) f32 mul-add", chain_ew, x16)


def chain_cumsum(k, x):
    for i in range(k):
        x = jnp.cumsum(x * 1e-6, axis=0)
    return x[0] + x[-1]


timeit("cumsum (4M,) f32", chain_cumsum, x1)


def chain_cumsum16(k, x):
    for i in range(k):
        x = jnp.cumsum(x * 1e-6, axis=0)
    return x[0, 0] + x[-1, -1]


timeit("cumsum (4M,16) f32", chain_cumsum16, x16)

key = jnp.asarray(rng.integers(0, 1 << 30, size=PAIR_CAP), jnp.int32)
slot = jnp.arange(PAIR_CAP, dtype=jnp.int32)


def _s1(k, key, slot):
    x = key
    for i in range(k):
        x = jax.lax.sort((x ^ (i + 1),), num_keys=1, is_stable=False)[0]
    return x[0] + x[-1]


timeit("sort 4M 1key 1-op", _s1, key, slot)


def _s(nops, nkeys):
    def f(k, key, slot):
        ops = [key] + [slot ^ i for i in range(1, nops)]
        for i in range(k):
            out = jax.lax.sort(tuple(ops), num_keys=nkeys, is_stable=False)
            ops = [out[-1] ^ (i + 1)] + list(out[:-1])
        return sum(o[0] + o[-1] for o in ops)
    return f


timeit("sort 4M 1key 2-op", _s(2, 1), key, slot)
timeit("sort 4M 1key 3-op", _s(3, 1), key, slot)
timeit("sort 4M 3key 4-op", _s(4, 3), key, slot)
timeit("sort 4M 1key 10-op", _s(10, 1), key, slot)
timeit("sort 1M 1key 2-op", _s(2, 1), key[:P], slot[:P])

table = jnp.asarray(rng.normal(size=(P + 1, 16)), jnp.float32)
gid = jnp.asarray(rng.integers(0, P, size=PAIR_CAP), jnp.int32)


def chain_gather(k, t, g):
    acc = 0.0
    for i in range(k):
        rows = t[g]
        acc = acc + rows[0, 0] + rows[-1, -1]
        g = (g + jax.lax.bitcast_convert_type(rows[:, 0], jnp.int32)) % P
    return acc


timeit("gather (4M,16)f32 random", chain_gather, table, gid)


def chain_gather4(k, t, g):
    acc = 0.0
    for i in range(k):
        rows = t[g]
        acc = acc + rows[0, 0] + rows[-1, -1]
        g = (g + rows[:, 0]) % P
    return acc


timeit("gather (4M,4)i32 random", chain_gather4,
       jnp.asarray(rng.integers(0, 100, size=(P + 1, 4)), jnp.int32), gid)

small = jnp.asarray(rng.normal(size=(1024,)), jnp.float32)
sidx = jnp.asarray(rng.integers(0, 1024, size=PAIR_CAP), jnp.int32)


def chain_gsmall(k, t, g):
    acc = 0.0
    for i in range(k):
        v = t[g]
        acc = acc + v[0] + v[-1]
        g = (g + jax.lax.bitcast_convert_type(v, jnp.int32)) % 1024
    return acc


timeit("gather (4M,) from 1024-entry table", chain_gsmall, small, sidx)

dest = jnp.sort(jnp.asarray(rng.integers(0, PAIR_CAP, size=PAIR_CAP),
                            jnp.int32))
gs = jnp.asarray(rng.integers(0, P, size=PAIR_CAP), jnp.int32)


def chain_scat(k, d, g):
    acc = 0
    for i in range(k):
        out = jnp.full((PAIR_CAP,), P, jnp.int32).at[d].set(g, mode="drop")
        acc = acc + out[0] + out[-1]
        g = g ^ out
    return acc


timeit("scatter-set 4M i32 (sorted idx)", chain_scat, dest, gs)

offs = jnp.asarray(np.sort(rng.integers(0, PAIR_CAP, size=P)), jnp.int32)
rows16 = table[:P]


def chain_dscat(k, o, r):
    acc = 0.0
    for i in range(k):
        out = jnp.zeros((PAIR_CAP, 16), jnp.float32).at[o].add(
            r, mode="drop", indices_are_sorted=True, unique_indices=False)
        acc = acc + out[0, 0] + out[-1, -1]
        r = r + out[:P]
    return acc


timeit("delta-scatter (1M,16)f32 rows", chain_dscat, offs, rows16)


def chain_dscat1(k, o):
    acc = 0
    m = jnp.int32(1)
    for i in range(k):
        out = jnp.zeros((PAIR_CAP,), jnp.int32).at[o].add(m, mode="drop")
        acc = acc + out[0] + out[-1]
        m = m + out[0]
    return acc


timeit("mark-scatter (1M,)i32 add", chain_dscat1, offs)
