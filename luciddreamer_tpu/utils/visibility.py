"""Standalone visibility query — the reference's markVisible
(rasterizer_impl.cu:54-66,141-153): frustum test per Gaussian without a full
render."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.types import Camera, GaussianParams


@jax.jit
def mark_visible(params: GaussianParams, camera: Camera) -> jax.Array:
    """(P,) bool: view-space z beyond the near plane (auxiliary.h:139-164)
    and alive."""
    vm = camera.viewmatrix
    z = params.xyz @ vm[2, :3] + vm[2, 3]
    return (z > 0.2) & params.alive
