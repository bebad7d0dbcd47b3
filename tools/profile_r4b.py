"""Microbenchmarks for the binning redesign: gather/scatter/sort/cumsum cost
structure on v5e (table size, monotonicity, width, update count)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
NP_PAIRS = 3_400_000
P = 1_000_000


def timeit(name, fn, *args, reps=5):
    f = jax.jit(fn)
    float(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            float(f(*args))
        best = min(best, (time.time() - t0) / reps)
    print(f"{name:64s} {best*1e3:9.2f} ms", flush=True)
    return best


# chained double-gather to cancel the fixed dispatch: cost printed is for
# TWO gathers incl. any per-op fixed cost
def g2(t, i):
    a = t[i]
    b = t[jnp.minimum(i + 1, t.shape[0] - 1)]
    return jnp.sum(a) + jnp.sum(b)


print("== gather: table-size scaling (n=3.4M lookups, width 16)")
for rows in (4_096, 65_536, 1_000_000):
    tbl = jnp.asarray(rng.normal(size=(rows, 16)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, rows, size=NP_PAIRS), jnp.int32)
    timeit(f"2x gather rows={rows:>9,}", g2, tbl, idx)

print("== gather: width scaling (n=3.4M, rows=1M)")
tbl1 = jnp.asarray(rng.normal(size=(P, 1)), jnp.float32)
tbl4 = jnp.asarray(rng.normal(size=(P, 4)), jnp.float32)
tbl16 = jnp.asarray(rng.normal(size=(P, 16)), jnp.float32)
idx = jnp.asarray(rng.integers(0, P, size=NP_PAIRS), jnp.int32)
timeit("2x gather width=1", g2, tbl1, idx)
timeit("2x gather width=4", g2, tbl4, idx)
timeit("2x gather width=16", g2, tbl16, idx)

print("== gather: monotone vs random indices (n=3.4M, rows=1M, w=16)")
idx_m = jnp.sort(idx)
timeit("2x gather monotone", g2, tbl16, idx_m)

print("== gather: 1M and 651k lookups from 3.4M-row table (w=16)")
big = jnp.asarray(rng.normal(size=(NP_PAIRS, 16)), jnp.float32)
for n in (651_000, 1_000_000):
    ii = jnp.asarray(np.sort(rng.integers(0, NP_PAIRS, size=n)), jnp.int32)
    timeit(f"2x gather n={n:,} monotone", g2, big, ii)

print("== scatter-add: update-count scaling into (3.4M,) i32 / (3.4M,16) f32")
for n in (651_000, 1_000_000):
    pos = jnp.asarray(rng.integers(0, NP_PAIRS, size=n), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    rows = jnp.asarray(rng.normal(size=(n, 16)), jnp.float32)

    def sc1(p, v):
        a = jnp.zeros((NP_PAIRS,), jnp.float32).at[p].add(v)
        b = jnp.zeros((NP_PAIRS,), jnp.float32).at[p].add(v + 1.0)
        return jnp.sum(a) + jnp.sum(b)

    def sc16(p, r):
        a = jnp.zeros((NP_PAIRS, 16), jnp.float32).at[p].add(r)
        b = jnp.zeros((NP_PAIRS, 16), jnp.float32).at[p].add(r + 1.0)
        return jnp.sum(a) + jnp.sum(b)

    timeit(f"2x scatter-add scalar n={n:,}", sc1, pos, vals)
    timeit(f"2x scatter-add 16-row n={n:,}", sc16, pos, rows)

print("== sort: operand scaling at 3.4M")
keys = jnp.asarray(rng.integers(0, 1 << 30, size=NP_PAIRS), jnp.int32)
ops = [jnp.asarray(rng.integers(0, 1 << 30, size=NP_PAIRS), jnp.int32)
       for _ in range(4)]


def mk_sort(n_ops, stable):
    def f(k, *os):
        outs = jax.lax.sort((k,) + os[:n_ops], num_keys=1, is_stable=stable)
        return sum(o[0] + o[-1] for o in outs)
    return f

for n_ops in (1, 2, 3, 4):
    timeit(f"sort 1key+{n_ops}ops unstable", mk_sort(n_ops, False), keys, *ops)
timeit("sort 1key+2ops STABLE", mk_sort(2, True), keys, *ops)

print("== cumsum at 3.4M")
x16 = jnp.asarray(rng.normal(size=(NP_PAIRS, 16)), jnp.float32)


def cs(x):
    a = jnp.cumsum(x * 1e-6, axis=0)
    return a[0, 0] + a[-1, -1]


timeit("cumsum (3.4M,16)", cs, x16)
x1 = x16[:, 0] + 0
timeit("cumsum (3.4M,)", lambda x: jnp.cumsum(x)[-1], x1)
