"""Core pytree types: Gaussian parameters and cameras.

TPU-first design notes
----------------------
* All arrays are statically shaped.  A Gaussian buffer is allocated at a fixed
  capacity ``P`` with an ``alive`` mask; densify/prune compact in place instead
  of reallocating (the reference reallocates tensors + performs optimizer-state
  surgery every densify, scene/gaussian_model.py:258-327).
* Matrices use plain math convention: ``x_view = view @ [x, 1]``.  The reference
  stores *transposed* matrices ("due to glm", scene/cameras.py:58-60) — we do
  not replicate that quirk; conversion helpers live in core.transforms.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GaussianParams:
    """Raw (pre-activation) Gaussian parameters.

    Mirrors the parameter store of the reference ``GaussianModel``
    (scene/gaussian_model.py:46-61):

    - ``xyz``           (P, 3)  world-space means
    - ``features_dc``   (P, 1, 3)  SH DC coefficients
    - ``features_rest`` (P, (deg+1)^2-1, 3)  higher SH coefficients
    - ``scaling``       (P, 3)  log-scales  (activation: exp)
    - ``rotation``      (P, 4)  quaternions wxyz (activation: normalize)
    - ``opacity``       (P, 1)  logits (activation: sigmoid)
    - ``alive``         (P,)    capacity mask (True = real Gaussian)
    """

    xyz: jax.Array
    features_dc: jax.Array
    features_rest: jax.Array
    scaling: jax.Array
    rotation: jax.Array
    opacity: jax.Array
    alive: jax.Array

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_alive(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))

    @property
    def max_sh_degree(self) -> int:
        n_coeffs = 1 + self.features_rest.shape[1]
        return int(round(n_coeffs**0.5)) - 1

    # ---- activations (reference scene/gaussian_model.py:28-43) ----
    def get_scaling(self) -> jax.Array:
        return jnp.exp(self.scaling)

    def get_rotation(self) -> jax.Array:
        # sqrt(sum + eps) keeps the gradient finite at q = 0 (dead capacity
        # rows); norm() would produce NaN there and poison the Adam moments.
        n = jnp.sqrt(jnp.sum(self.rotation**2, axis=-1, keepdims=True) + 1e-24)
        return self.rotation / n

    def get_opacity(self) -> jax.Array:
        return jax.nn.sigmoid(self.opacity)

    def get_features(self) -> jax.Array:
        """(P, (deg+1)^2, 3) concatenated SH coefficients."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def param_pytree(self):
        """The trainable leaves only (excludes the alive mask)."""
        return {
            "xyz": self.xyz,
            "f_dc": self.features_dc,
            "f_rest": self.features_rest,
            "scaling": self.scaling,
            "rotation": self.rotation,
            "opacity": self.opacity,
        }

    @classmethod
    def from_param_pytree(cls, p, alive) -> "GaussianParams":
        return cls(
            xyz=p["xyz"],
            features_dc=p["f_dc"],
            features_rest=p["f_rest"],
            scaling=p["scaling"],
            rotation=p["rotation"],
            opacity=p["opacity"],
            alive=alive,
        )


@struct.dataclass
class Camera:
    """A pinhole camera, ready for rasterization.

    ``viewmatrix`` is the 4x4 world->camera matrix V; ``projmatrix`` is the
    full transform P @ V (the reference's ``full_proj_transform``,
    scene/cameras.py:60, stored untransposed here).  ``campos`` is the camera
    center in world space.  Image size is static (python ints) so jit traces
    specialize per resolution; fovs stay as arrays to avoid retraces per pose.
    """

    viewmatrix: jax.Array               # (4, 4)
    projmatrix: jax.Array               # (4, 4) = proj @ view
    campos: jax.Array                   # (3,)
    tanfovx: jax.Array                  # scalar
    tanfovy: jax.Array                  # scalar
    height: int = struct.field(pytree_node=False, default=512)
    width: int = struct.field(pytree_node=False, default=512)
    znear: float = struct.field(pytree_node=False, default=0.01)
    zfar: float = struct.field(pytree_node=False, default=100.0)

    @property
    def focal_x(self) -> jax.Array:
        return self.width / (2.0 * self.tanfovx)

    @property
    def focal_y(self) -> jax.Array:
        return self.height / (2.0 * self.tanfovy)


@struct.dataclass
class ProcessedGaussians:
    """Per-Gaussian screen-space quantities produced by render.preprocess.

    Matches the buffers the reference preprocess kernel writes
    (forward.cu:249-255): depths, radii, 2D means, conic+opacity, RGB, tile
    rect, tiles_touched, plus a visibility mask.
    """

    mean2d: jax.Array        # (P, 2) pixel coords
    depth: jax.Array         # (P,) view-space z
    conic: jax.Array         # (P, 3) inverse 2D covariance (a, b, c)
    opacity: jax.Array       # (P,)
    rgb: jax.Array           # (P, 3)
    radius: jax.Array        # (P,) int32 pixel radius (0 = culled)
    rect_min: jax.Array      # (P, 2) int32 tile coords (x, y)
    rect_max: jax.Array      # (P, 2) int32 tile coords, exclusive
    tiles_touched: jax.Array  # (P,) int32
    visible: jax.Array       # (P,) bool
