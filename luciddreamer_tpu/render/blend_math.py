"""Chunked front-to-back alpha compositing math, shared by the dense oracle
renderer and the tiled production path.

Replicates the per-pixel semantics of the reference forward blend loop
(forward.cu:329-373) in a vectorized, XLA-friendly form: instead of a
sequential per-Gaussian loop with early exit, a chunk of K depth-ordered
Gaussians is composited at once using an exclusive cumulative product of
(1 - alpha) for the transmittance and a sticky "done" mask for the
T < 1e-4 early-termination rule.

Semantics checklist (all from forward.cu):
  - power = -0.5*(A dx^2 + C dy^2) - B dx dy; skip if power > 0        (:339-341)
  - alpha = min(0.99, opacity * exp(power)); skip if alpha < 1/255     (:347-349)
    The reference backward ignores the 0.99 clamp when propagating
    d(alpha)/d(opacity) and d(alpha)/dG (backward.cu:567,583), so the clamp is
    applied straight-through (identity gradient).
  - if T*(1-alpha) < 1e-4: the triggering Gaussian is itself skipped and
    the pixel is done                                                  (:350-355)
  - C += rgb * alpha * T ; D += depth * alpha * T ; acc += alpha * T   (:357-365)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

ALPHA_CLAMP = 0.99
ALPHA_MIN = 1.0 / 255.0
T_MIN = 1.0e-4


class BlendCarry(NamedTuple):
    """Per-pixel compositing state. All fields have shape (..., N_pix)."""

    T: jax.Array        # transmittance
    rgb: jax.Array      # (3, ..., N_pix) accumulated color (pre-background)
    depth: jax.Array    # accumulated depth * weight
    acc: jax.Array      # accumulated weight (seeded 1e-6, forward.cu:307)
    done: jax.Array     # bool, early-termination latch
    n_contrib: jax.Array  # int32 index (in the global depth order) after the
    #                       last committed Gaussian; mirrors forward.cu:371

    @classmethod
    def init(cls, n_pix: int, dtype=jnp.float32):
        return cls(
            T=jnp.ones((n_pix,), dtype),
            rgb=jnp.zeros((3, n_pix), dtype),
            depth=jnp.zeros((n_pix,), dtype),
            acc=jnp.full((n_pix,), 1e-6, dtype),
            done=jnp.zeros((n_pix,), jnp.bool_),
            n_contrib=jnp.zeros((n_pix,), jnp.int32),
        )


def straight_through_min(x, cap):
    """min(x, cap) with identity gradient (matches backward.cu:567,583)."""
    return x + jax.lax.stop_gradient(jnp.minimum(x, cap) - x)


def gaussian_alpha(dx, dy, conic_a, conic_b, conic_c, opacity):
    """alpha and the power>0 mask for a (K, N) block of Gaussian/pixel pairs."""
    power = -0.5 * (conic_a * dx * dx + conic_c * dy * dy) - conic_b * dx * dy
    in_ellipse = power <= 0.0
    alpha_raw = opacity * jnp.exp(jnp.minimum(power, 0.0))
    alpha = straight_through_min(alpha_raw, ALPHA_CLAMP)
    return alpha, in_ellipse


def exclusive_cumprod(x, axis=0):
    prod = jnp.cumprod(x, axis=axis)
    one = jnp.ones_like(jax.lax.slice_in_dim(prod, 0, 1, axis=axis))
    return jnp.concatenate(
        [one, jax.lax.slice_in_dim(prod, 0, x.shape[axis] - 1, axis=axis)], axis=axis
    )


def blend_chunk(
    carry: BlendCarry,
    alpha: jax.Array,        # (K, N) pre-computed alphas (straight-through-clamped)
    valid: jax.Array,        # (K, N) bool: in-ellipse & alpha>=1/255 & pair-valid
    rgb: jax.Array,          # (K, 3) per-Gaussian color
    depth: jax.Array,        # (K,) per-Gaussian view z
    base_index: jax.Array,   # scalar int32: global depth-order index of chunk row 0
) -> BlendCarry:
    """Composite one chunk of K depth-ordered Gaussians over N pixels."""
    K = alpha.shape[0]
    a = jnp.where(valid, alpha, 0.0)                     # (K, N)
    t_before = carry.T[None, :] * exclusive_cumprod(1.0 - a, axis=0)
    t_after = t_before * (1.0 - a)
    # t_after is monotone non-increasing and a live pixel enters the chunk
    # with T >= T_MIN (the triggering Gaussian is never committed), so the
    # sticky "some pair at or before i triggered" is just t_after_i < T_MIN
    done_after = carry.done[None, :] | (t_after < T_MIN)
    commit = valid & ~done_after
    w = jnp.where(commit, a * t_before, 0.0)             # (K, N)

    _hi = jax.lax.Precision.HIGHEST
    new_rgb = carry.rgb + jnp.einsum("kn,kc->cn", w, rgb, precision=_hi)
    new_depth = carry.depth + jnp.matmul(depth, w, precision=_hi)
    new_acc = carry.acc + jnp.sum(w, axis=0)
    new_T = carry.T * jnp.prod(1.0 - jnp.where(commit, a, 0.0), axis=0)

    # n_contrib: 1 + global index of the last committed Gaussian (0 if none yet).
    idx = base_index + jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0) + 1
    contrib_idx = jnp.max(jnp.where(commit, idx, 0), axis=0)
    new_n_contrib = jnp.maximum(carry.n_contrib, contrib_idx)

    return BlendCarry(
        T=new_T,
        rgb=new_rgb,
        depth=new_depth,
        acc=new_acc,
        done=done_after[-1],
        n_contrib=new_n_contrib,
    )


def finalize(carry: BlendCarry, bg: jax.Array, acc_min: float = 0.5):
    """Background compositing + the depth normalization rule
    (forward.cu:381-388).  Differentiable; returns (rgb(3,N), depth(N))."""
    rgb = carry.rgb + carry.T[None, :] * bg[:, None]
    depth = jnp.where(carry.acc > acc_min, carry.depth / carry.acc, 0.0)
    return rgb, depth
