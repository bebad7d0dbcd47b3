"""Neural model implementations (flax): monodepth (ZoeDepth-class) stack."""

from luciddreamer_tpu.models.zoedepth import (
    ZoeDepthConfig,
    FlaxZoeDepth,
    FlaxZoeDepthEstimator,
)

__all__ = ["ZoeDepthConfig", "FlaxZoeDepth", "FlaxZoeDepthEstimator"]
