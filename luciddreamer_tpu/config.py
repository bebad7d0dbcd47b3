"""Typed configuration for the whole framework.

Replaces the reference's three coexisting config mechanisms (argparse CLI in
``run.py:10-28``, hardcoded ``GSParams``/``CameraParams`` in ``arguments.py:9-51``,
and ZoeDepth's layered dict system) with plain dataclasses.

Default values mirror /root/reference/arguments.py:9-51.
"""
from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass
class GSConfig:
    """3DGS optimization hyperparameters (reference arguments.py:9-39 ``GSParams``)."""

    sh_degree: int = 3
    white_background: bool = False
    use_depth: bool = False          # latent flag in the reference; real here
    iterations: int = 2990
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 2990
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    # Depth-loss weight (the reference declares use_depth but never reads it;
    # we implement the depth term for real).
    lambda_depth: float = 0.0
    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


@dataclasses.dataclass
class CameraConfig:
    """Pinhole intrinsics for generated scenes (reference arguments.py:41-51)."""

    image_width: int = 512
    image_height: int = 512
    focal: tuple[float, float] = (5.8269e02, 5.8269e02)

    @property
    def fov_x(self) -> float:
        return 2.0 * math.atan(self.image_width / (2.0 * self.focal[0]))

    @property
    def fov_y(self) -> float:
        return 2.0 * math.atan(self.image_height / (2.0 * self.focal[1]))

    @property
    def K(self):
        import numpy as np

        w, h = self.image_width, self.image_height
        return np.array(
            [
                [self.focal[0], 0.0, w / 2.0],
                [0.0, self.focal[1], h / 2.0],
                [0.0, 0.0, 1.0],
            ],
            dtype=np.float32,
        )


@dataclasses.dataclass
class RenderConfig:
    """Rasterizer geometry & capacity knobs (TPU-specific; no reference analogue).

    The reference sizes its pair buffers dynamically on device
    (rasterizer_impl.cu:276-319).  Under XLA everything is statically shaped, so
    capacities are explicit here; the renderer reports overflow so callers can
    re-trace with a bigger capacity.
    """

    tile_size: int = 16              # matches cuda_rasterizer/config.h:16-17 semantics
    max_pairs_per_gaussian: int = 0  # 0 = unlimited (rect area is the bound)
    pair_capacity_multiplier: float = 8.0  # max_pairs = multiplier * P
    chunk_size: int = 128            # gaussians blended per inner step
    # blend cutoffs (forward.cu:347-355)
    alpha_clamp: float = 0.99
    alpha_min: float = 1.0 / 255.0
    transmittance_min: float = 1.0e-4
    acc_min: float = 0.5             # depth emitted only where acc > 0.5
    near_plane: float = 0.2          # frustum cull (auxiliary.h:154)
