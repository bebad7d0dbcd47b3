"""Exact 3-nearest-neighbor mean squared distance, the TPU way.

Capability match for the reference's simple-knn CUDA extension
(simple_knn.cu:147-183 ``boxMeanDist`` / spatial.cu:15-26 ``distCUDA2``):
for every point, the mean of the squared distances to its 3 nearest
neighbors, used to initialize Gaussian scales
(scene/gaussian_model.py:133-134).

The reference builds a Morton-code acceleration structure with box
rejection — a latency-oriented design for scalar GPU cores.  On TPU the
all-pairs distance matrix is two matmuls away, so we instead stream the
N x N distance matrix through the MXU in (row_block x col_block) tiles,
keeping a running top-3 via lax.top_k.  This is *exact* (the reference's
algorithm is also exact), O(N^2) FLOPs — which the MXU turns into
~milliseconds up to 10^6 points — and O(N * block) memory.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST
# python float, not a jnp scalar: a module-level device array would
# initialize the XLA backend at import, breaking jax.distributed.initialize
_BIG = 3.4e38


def _pad_to(x, n, fill):
    return jnp.pad(x, [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1),
                   constant_values=fill)


@functools.partial(jax.jit, static_argnames=("k", "row_block", "col_block"))
def knn_sq_dists(
    points: jax.Array,
    alive: jax.Array | None = None,
    k: int = 3,
    row_block: int = 1024,
    col_block: int = 4096,
) -> jax.Array:
    """(P, k) squared distances to the k nearest *other* alive points.

    Dead rows (alive=False) get 0; dead columns never count as neighbors.
    """
    P = points.shape[0]
    if alive is None:
        alive = jnp.ones((P,), bool)
    rb = min(row_block, max(8, P))
    cb = min(col_block, max(128, P))
    n_rows = -(-P // rb) * rb
    n_cols = -(-P // cb) * cb

    pts_r = _pad_to(points.astype(jnp.float32), n_rows, 0.0)
    pts_c = _pad_to(points.astype(jnp.float32), n_cols, 0.0)
    alive_c = _pad_to(alive, n_cols, False)

    sq_r = jnp.sum(pts_r * pts_r, axis=-1)                    # (n_rows,)
    sq_c = jnp.sum(pts_c * pts_c, axis=-1)                    # (n_cols,)

    def row_chunk(r0):
        rows = jax.lax.dynamic_slice_in_dim(pts_r, r0, rb)     # (rb, 3)
        rows_sq = jax.lax.dynamic_slice_in_dim(sq_r, r0, rb)
        ridx = r0 + jnp.arange(rb)

        def col_step(best, c0):
            cols = jax.lax.dynamic_slice_in_dim(pts_c, c0, cb)
            cols_sq = jax.lax.dynamic_slice_in_dim(sq_c, c0, cb)
            cols_alive = jax.lax.dynamic_slice_in_dim(alive_c, c0, cb)
            cidx = c0 + jnp.arange(cb)
            # d^2 = |r|^2 + |c|^2 - 2 r.c   (the matmul is the MXU's job)
            cross = jnp.matmul(rows, cols.T, precision=_HI)    # (rb, cb)
            d2 = rows_sq[:, None] + cols_sq[None, :] - 2.0 * cross
            d2 = jnp.maximum(d2, 0.0)
            invalid = (
                (~cols_alive)[None, :]
                | (ridx[:, None] == cidx[None, :])             # self
                | (cidx[None, :] >= P)
            )
            d2 = jnp.where(invalid, _BIG, d2)
            blk_top = -jax.lax.top_k(-d2, k)[0]                # (rb, k) smallest
            merged = jnp.concatenate([best, blk_top], axis=-1)
            best = -jax.lax.top_k(-merged, k)[0]
            return best, None

        best0 = jnp.full((rb, k), _BIG, jnp.float32)
        best, _ = jax.lax.scan(
            col_step, best0, jnp.arange(0, n_cols, cb)
        )
        return best

    out = jax.lax.map(row_chunk, jnp.arange(0, n_rows, rb))    # (n_rows/rb, rb, k)
    out = out.reshape(n_rows, k)[:P]
    out = jnp.where(out >= _BIG, 0.0, out)                     # < k alive points
    return jnp.where(alive[:, None], out, 0.0)


def mean_sq_dist_3nn(
    points: jax.Array, alive: jax.Array | None = None, **kw
) -> jax.Array:
    """(P,) mean of squared distances to the 3 nearest neighbors —
    the quantity distCUDA2 returns (simple_knn.cu:182)."""
    return jnp.mean(knn_sq_dists(points, alive, k=3, **kw), axis=-1)
