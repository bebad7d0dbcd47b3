"""Chained-K primitive costs at the real bench sizes (P=1M, pairs 3.4M pad
4M).  Decides the fwd/bwd binning design: gather widths vs sort operands."""
import time

import numpy as np
import jax
import jax.numpy as jnp

P = 1_000_000
PAIRS = 4_000_000
rng = np.random.default_rng(0)


def run(f, *args):
    float(f(*args))
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        float(f(*args))
        best = min(best, time.time() - t0)
    return best


def chained(name, step, seed, k1=1, k2=4):
    def mk(k):
        def f(x):
            s = jnp.float32(0)
            for _ in range(k):
                s = step(x + s * 1e-30)
            return s
        return jax.jit(f)

    t1 = run(mk(k1), seed)
    t2 = run(mk(k2), seed)
    per = (t2 - t1) / (k2 - k1)
    print(f"{name:56s} {per*1e3:9.2f} ms", flush=True)


idx = jnp.asarray(rng.integers(0, P, size=PAIRS), jnp.int32)
idx_m = jnp.sort(idx)
tbl4 = jnp.asarray(rng.normal(size=(P + 1, 4)), jnp.float32)
tbl16 = jnp.asarray(rng.normal(size=(P + 1, 16)), jnp.float32)
seed16 = jnp.zeros((16,), jnp.float32)

chained("gather 4w @4M from 1M-table (monotone idx)",
        lambda x: jnp.sum(tbl4.at[0, :4].add(x[:4])[idx_m]), seed16)
chained("gather 16w @4M from 1M-table (random idx)",
        lambda x: jnp.sum((tbl16 + x[None, :])[idx]), seed16)
chained("gather 16w @4M from 1M-table (monotone idx)",
        lambda x: jnp.sum((tbl16 + x[None, :])[idx_m]), seed16)

big10 = jnp.asarray(rng.normal(size=(PAIRS, 10)), jnp.float32)
perm = jnp.asarray(rng.permutation(PAIRS), jnp.int32)
chained("perm gather 10w @4M from 4M-table",
        lambda x: jnp.sum((big10 + x[None, :10])[perm]), seed16)

bidx = jnp.asarray(np.sort(rng.integers(0, PAIRS, size=P + 1)), jnp.int32)
chained("boundary gather 10w @1M from 4M-table (monotone)",
        lambda x: jnp.sum((big10 + x[None, :10])[bidx]), seed16)

key = jnp.asarray(rng.integers(0, 1 << 31, size=PAIRS, dtype=np.int64),
                  jnp.uint32)
cols = [jnp.asarray(rng.normal(size=(PAIRS,)), jnp.float32)
        for _ in range(11)]
slot = jnp.arange(PAIRS, dtype=jnp.int32)


def mk_sortn(n):
    def f(x):
        out = jax.lax.sort((key, *(c + x[0] for c in cols[:n]), slot),
                           num_keys=1, is_stable=False)
        return sum(o[0].astype(jnp.float32) + o[-1].astype(jnp.float32)
                   for o in out[1:-1])
    return f


for n in (1, 2, 5, 11):
    chained(f"sort 1key+{n}f32+slot @4M", mk_sortn(n), seed16)

g_v = jnp.asarray(rng.integers(0, P, size=PAIRS), jnp.int32)
chained("sort 1key+(g,slot) @4M",
        lambda x: sum(o[0].astype(jnp.float32) for o in
                      jax.lax.sort((key, g_v + x[0].astype(jnp.int32), slot),
                                   num_keys=1, is_stable=False)[1:]),
        seed16)

x16 = jnp.asarray(rng.normal(size=(PAIRS, 16)), jnp.float32)
chained("cumsum (4M,16)", lambda x: jnp.sum(jnp.cumsum(x16 * 1e-7 + x[None, :], axis=0)[-1]), seed16)
x1 = x16[:, 0] + 0
chained("cumsum (4M,)", lambda x: jnp.cumsum(x1 * 1e-7 + x[0])[-1], seed16)
chained("cummax (4M,) i32",
        lambda x: jax.lax.cummax(g_v + x[0].astype(jnp.int32))[-1]
        .astype(jnp.float32), seed16)

offs = jnp.asarray(np.sort(rng.integers(0, PAIRS, size=P)), jnp.int32)
chained("scatter-add 1s @1M into (4M,)",
        lambda x: jnp.sum(jnp.zeros((PAIRS,), jnp.float32)
                          .at[offs].add(1.0 + x[0])),
        seed16)

# stack of 11 columns -> (4M, 11) materialization cost
chained("stack 11 cols -> (4M,11)",
        lambda x: jnp.sum(jnp.stack([c + x[0] for c in cols], axis=-1)),
        seed16)
