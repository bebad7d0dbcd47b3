from luciddreamer_tpu.core.types import Camera, GaussianParams, ProcessedGaussians
from luciddreamer_tpu.core import transforms, sh, covariance

__all__ = [
    "Camera",
    "GaussianParams",
    "ProcessedGaussians",
    "transforms",
    "sh",
    "covariance",
]
