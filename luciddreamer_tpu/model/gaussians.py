"""Gaussian model state ops: creation, densification, pruning, opacity reset.

Functional, fixed-capacity equivalents of the reference ``GaussianModel``
methods (scene/gaussian_model.py).  The parameter buffer has static shape
(capacity, ...) with an ``alive`` mask; densify/prune scatter into dead
slots and flip the mask instead of reallocating tensors, so the jitted
train step never changes shape (the reference reallocates + performs
optimizer-state surgery every 100 iterations, gaussian_model.py:258-327).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from luciddreamer_tpu.core import sh as shlib
from luciddreamer_tpu.core.covariance import quat_to_rotmat
from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.model.optim import AdamState
from luciddreamer_tpu.points.knn import mean_sq_dist_3nn


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def create_from_pcd(
    points: jax.Array,
    colors: jax.Array,
    sh_degree: int = 3,
    capacity: int | None = None,
) -> GaussianParams:
    """Initialize Gaussians from a colored point cloud
    (gaussian_model.py:126-149): SH DC from RGB, isotropic scale from the
    3-NN mean squared distance, identity rotation, opacity 0.1."""
    P = points.shape[0]
    capacity = capacity or P
    if capacity < P:
        raise ValueError(
            f"capacity {capacity} < point count {P}; subsample the cloud or "
            "raise the capacity"
        )
    n_rest = (sh_degree + 1) ** 2 - 1

    dist2 = jnp.maximum(mean_sq_dist_3nn(points), 1e-7)
    log_scale = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        return jnp.pad(
            x, [(0, capacity - P)] + [(0, 0)] * (x.ndim - 1),
            constant_values=fill,
        )

    rot = jnp.zeros((capacity, 4), jnp.float32).at[:, 0].set(1.0)
    return GaussianParams(
        xyz=pad(points.astype(jnp.float32)),
        features_dc=pad(shlib.rgb2sh(colors.astype(jnp.float32))[:, None, :]),
        features_rest=pad(jnp.zeros((P, n_rest, 3), jnp.float32)),
        scaling=pad(log_scale),
        rotation=rot,  # identity quats everywhere, incl. padding rows
        opacity=pad(jnp.full((P, 1), inverse_sigmoid(0.1), jnp.float32)),
        alive=pad(jnp.ones((P,), bool), fill=False),
    )


def reset_opacity(params: GaussianParams, adam: AdamState):
    """Clamp opacity to <= 0.01 and zero its Adam moments
    (gaussian_model.py:210-213 + replace_tensor_to_optimizer)."""
    new_op = inverse_sigmoid(
        jnp.minimum(params.get_opacity(), 0.01)
    ).astype(jnp.float32)
    params = params.replace(opacity=new_op)
    mu = dict(adam.mu, opacity=jnp.zeros_like(adam.mu["opacity"]))
    nu = dict(adam.nu, opacity=jnp.zeros_like(adam.nu["opacity"]))
    return params, adam.replace(mu=mu, nu=nu)


@struct.dataclass
class DensifyStats:
    """Running densification statistics (gaussian_model.py:50-53,405-407)."""

    grad_accum: jax.Array    # (P,) sum of ||dL/dmean2d.xy||
    denom: jax.Array         # (P,) number of visible frames
    max_radii2d: jax.Array   # (P,) int32

    @classmethod
    def zero(cls, capacity: int):
        return cls(
            grad_accum=jnp.zeros((capacity,), jnp.float32),
            denom=jnp.zeros((capacity,), jnp.float32),
            max_radii2d=jnp.zeros((capacity,), jnp.int32),
        )


def add_densification_stats(
    stats: DensifyStats, mean2d_grad: jax.Array, radii: jax.Array
) -> DensifyStats:
    """Accumulate per-visible-Gaussian screen-gradient norms
    (luciddreamer.py:308-312, gaussian_model.py:405-407).  ``mean2d_grad``
    is dL/d(mean2d offset) from the train step; visibility = radii > 0."""
    vis = radii > 0
    g = jnp.linalg.norm(mean2d_grad[:, :2], axis=-1)
    return DensifyStats(
        grad_accum=stats.grad_accum + jnp.where(vis, g, 0.0),
        denom=stats.denom + vis.astype(jnp.float32),
        max_radii2d=jnp.maximum(stats.max_radii2d, jnp.where(vis, radii, 0)),
    )


def _rank_to_slot(free: jax.Array) -> jax.Array:
    """free: (P,) bool -> (P,) int32 mapping rank r -> index of the r-th
    free slot (undefined past the number of free slots)."""
    P = free.shape[0]
    rank = jnp.cumsum(free.astype(jnp.int32)) - 1        # slot -> its rank
    slot = jnp.arange(P, dtype=jnp.int32)
    out = jnp.zeros((P,), jnp.int32).at[jnp.where(free, rank, P)].set(
        slot, mode="drop"
    )
    return out


def densify_and_prune(
    params: GaussianParams,
    adam: AdamState,
    stats: DensifyStats,
    key: jax.Array,
    grad_threshold: float,
    min_opacity: float,
    extent: float,
    max_screen_size: int | None,
    percent_dense: float = 0.01,
):
    """Clone small / split large high-gradient Gaussians, prune transparent
    ones (gaussian_model.py:339-403), as a shape-static scatter.

    Returns (params, adam, fresh zero stats, overflowed: bool scalar).
    New rows (clones and split children) get zeroed Adam moments — the
    functional equivalent of cat_tensors_to_optimizer's zero-padding.
    """
    P = params.capacity
    avg_grad = jnp.where(stats.denom > 0, stats.grad_accum / stats.denom, 0.0)
    max_scale = jnp.max(params.get_scaling(), axis=-1)
    hot = params.alive & (avg_grad >= grad_threshold)
    clone_mask = hot & (max_scale <= percent_dense * extent)
    split_mask = hot & (max_scale > percent_dense * extent)

    # --- payloads: clones (P) then split children A and B (P each) ---
    scales = params.get_scaling()
    quats = params.get_rotation()
    R = quat_to_rotmat(quats)                               # (P, 3, 3)
    nA = jax.random.normal(key, (P, 3)) * scales
    nB = jax.random.normal(jax.random.fold_in(key, 1), (P, 3)) * scales
    child_xyz_a = jnp.einsum("pij,pj->pi", R, nA) + params.xyz
    child_xyz_b = jnp.einsum("pij,pj->pi", R, nB) + params.xyz
    child_scaling = jnp.log(scales / (0.8 * 2.0))           # /1.6, :360

    def payload(xyz, scaling):
        return {
            "xyz": xyz, "f_dc": params.features_dc,
            "f_rest": params.features_rest, "scaling": scaling,
            "rotation": params.rotation, "opacity": params.opacity,
        }

    payloads = [
        (payload(params.xyz, params.scaling), clone_mask),
        (payload(child_xyz_a, child_scaling), split_mask),
        (payload(child_xyz_b, child_scaling), split_mask),
    ]
    valid = jnp.concatenate([m for _, m in payloads])        # (3P,)

    free = ~params.alive
    n_free = jnp.sum(free.astype(jnp.int32))
    rank2slot = _rank_to_slot(free)
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1           # payload -> rank
    n_new = jnp.sum(valid.astype(jnp.int32))
    overflow = n_new > n_free
    placed = valid & (rank < n_free)
    dest = jnp.where(placed, rank2slot[jnp.clip(rank, 0, P - 1)], P)

    pdict = params.param_pytree()
    new_pdict, new_mu, new_nu = {}, {}, {}
    for name in pdict:
        stacked = jnp.concatenate([pl[name] for pl, _ in payloads], axis=0)
        new_pdict[name] = pdict[name].at[dest].set(stacked, mode="drop")
        zeros = jnp.zeros_like(stacked)
        new_mu[name] = adam.mu[name].at[dest].set(zeros, mode="drop")
        new_nu[name] = adam.nu[name].at[dest].set(zeros, mode="drop")

    alive = params.alive.at[dest].set(placed, mode="drop")
    # split sources die (their mass moved to the children), :366-368
    alive = alive & ~split_mask

    params = GaussianParams.from_param_pytree(new_pdict, alive)

    # --- prune (applies to old and newly inserted rows alike, :389-399) ---
    prune = params.get_opacity()[:, 0] < min_opacity
    if max_screen_size is not None:
        # stats.max_radii2d is stale (zero) for new rows — same as reference,
        # which prunes on radii recorded before the densify call.
        radii = stats.max_radii2d.at[dest].set(0, mode="drop")
        big_scale = jnp.max(params.get_scaling(), axis=-1) > 0.1 * extent
        prune = prune | (radii > max_screen_size) | big_scale
    params = params.replace(alive=params.alive & ~prune)

    return (
        params,
        adam.replace(mu=new_mu, nu=new_nu),
        DensifyStats.zero(P),
        overflow,
    )


def grow_capacity(
    params: GaussianParams, adam: AdamState, stats: DensifyStats,
    new_capacity: int,
):
    """Host-side capacity growth (forces retrace of jitted steps)."""
    old = params.capacity
    assert new_capacity >= old

    def pad(x, fill=0.0):
        return jnp.pad(
            x, [(0, new_capacity - old)] + [(0, 0)] * (x.ndim - 1),
            constant_values=fill,
        )

    pdict = jax.tree.map(pad, params.param_pytree())
    params = GaussianParams.from_param_pytree(
        pdict, pad(params.alive, fill=False)
    )
    adam = adam.replace(
        mu=jax.tree.map(pad, adam.mu), nu=jax.tree.map(pad, adam.nu)
    )
    stats = DensifyStats(
        grad_accum=pad(stats.grad_accum),
        denom=pad(stats.denom),
        max_radii2d=pad(stats.max_radii2d),
    )
    return params, adam, stats
