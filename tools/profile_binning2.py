"""Micro-ops for the binning redesign: cumsum widths, delta-scatter,
many-operand sorts, monotone vs random gathers, repeat."""
import time

import numpy as np
import jax
import jax.numpy as jnp

P = 1_000_000
PAIR_CAP = 4_000_000
rng = np.random.default_rng(0)


def timeit(name, fn, *args, reps=5):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / reps)
    print(f"{name:56s} {best*1e3:9.2f} ms", flush=True)


x1 = jnp.asarray(rng.normal(size=(PAIR_CAP,)), jnp.float32)
x16 = jnp.asarray(rng.normal(size=(PAIR_CAP, 16)), jnp.float32)
x8 = x16[:, :8]
timeit("cumsum (4M,) f32", lambda x: jnp.cumsum(x).sum(), x1)
timeit("cumsum (4M,16) f32 axis0", lambda x: jnp.cumsum(x, 0).sum(), x16)
timeit("cumsum (4M,8) f32 axis0", lambda x: jnp.cumsum(x, 0).sum(), x8)

# delta-scatter: P rows into (PAIR_CAP,16) at sorted offsets
counts = np.maximum(rng.poisson(3.4, size=P), 0).astype(np.int32)
cum = np.cumsum(counts)
offs = jnp.asarray(cum - counts)
rows16 = jnp.asarray(rng.normal(size=(P, 16)), jnp.float32)
timeit("delta-scatter (1M,16)f32 rows at sorted offsets",
       lambda o, r: jnp.zeros((PAIR_CAP, 16), jnp.float32)
       .at[o].add(r, mode="drop").sum(), offs, rows16)
timeit("delta-scatter sorted-flagged",
       lambda o, r: jnp.zeros((PAIR_CAP, 16), jnp.float32)
       .at[o].add(r, mode="drop", indices_are_sorted=True,
                  unique_indices=True).sum(), offs, rows16)

key = jnp.asarray(rng.integers(0, 1 << 30, size=PAIR_CAP), jnp.int32)
ops16 = [x16[:, i] for i in range(16)]
slot = jnp.arange(PAIR_CAP, dtype=jnp.int32)
timeit("sort 1key 18-operand (key+16f32+slot)",
       lambda k, s, *o: sum(j.sum() for j in jax.lax.sort(
           (k, s) + o, num_keys=1, is_stable=False)), key, slot, *ops16)
timeit("sort 1key 10-operand (key+8f32+slot)",
       lambda k, s, *o: sum(j.sum() for j in jax.lax.sort(
           (k, s) + o, num_keys=1, is_stable=False)), key, slot, *ops16[:8])

table = jnp.asarray(rng.normal(size=(P + 1, 16)), jnp.float32)
gid_rand = jnp.asarray(rng.integers(0, P, size=PAIR_CAP), jnp.int32)
gid_mono = jnp.sort(gid_rand)
timeit("gather (4M,16) random idx", lambda t, g: t[g].sum(), table, gid_rand)
timeit("gather (4M,16) monotone idx", lambda t, g: t[g].sum(), table, gid_mono)
timeit("gather (4M,16) monotone idx sorted-flag",
       lambda t, g: jnp.take(t, g, axis=0, indices_are_sorted=True,
                             mode="fill", fill_value=0.0).sum(),
       table, gid_mono)

table32 = jnp.concatenate([table, table], axis=1)
timeit("gather (4M,32) random idx", lambda t, g: t[g].sum(), table32, gid_rand)
table8 = table[:, :8]
timeit("gather (4M,8) random idx", lambda t, g: t[g].sum(), table8, gid_rand)
table4 = table[:, :4]
timeit("gather (4M,4) f32 random idx", lambda t, g: t[g].sum(), table4, gid_rand)

small = jnp.asarray(rng.normal(size=(1024,)), jnp.float32)
sidx = jnp.asarray(rng.integers(0, 1024, size=PAIR_CAP), jnp.int32)
timeit("gather (4M,) from 1024-entry table", lambda t, g: t[g].sum(),
       small, sidx)
chunk_tile = jnp.asarray(rng.integers(0, 1024, size=PAIR_CAP // 128),
                         jnp.int32)
timeit("repeat chunk_tile x128", lambda c: jnp.repeat(c, 128).sum(),
       chunk_tile)

# one-wide scatter set vs add
dest = jnp.sort(jnp.asarray(rng.integers(0, PAIR_CAP, size=PAIR_CAP),
                            jnp.int32))
gs = jnp.asarray(rng.integers(0, P, size=PAIR_CAP), jnp.int32)
timeit("scatter-set 4M int32 at sorted idx",
       lambda d, g: jnp.full((PAIR_CAP,), P, jnp.int32)
       .at[d].set(g, mode="drop").sum(), dest, gs)
timeit("scatter-set 4M int32 sorted+unique flags",
       lambda d, g: jnp.full((PAIR_CAP,), P, jnp.int32)
       .at[d].set(g, mode="drop", indices_are_sorted=True,
                  unique_indices=True).sum(), dest, gs)
