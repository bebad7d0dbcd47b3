"""LucidDreamer-TPU: a TPU-native 3D Gaussian splatting scene-generation framework.

A from-scratch JAX/Pallas rebuild of the capabilities of
luciddreamer-cvlab/LucidDreamer (single image + text -> 3D Gaussian scene):

- ``core``       : Gaussian/camera pytrees, projection math, spherical harmonics
- ``render``     : differentiable tile-based rasterizer (Pallas kernels + dense oracle)
- ``points``     : point-cloud ops (3-NN mean distance, Morton codes)
- ``model``      : Gaussian parameter store, optimizer, densification, PLY I/O
- ``scene``      : cameras + traindata -> scene binding
- ``trajectory`` : camera-pose generators and render-path presets
- ``train``      : 3DGS optimization loop (L1 + D-SSIM + depth loss)
- ``dream``      : point-cloud "dreaming" pipeline (warp/inpaint/lift)
- ``parallel``   : multi-chip/multi-host tile-sharded rendering and training
"""

__version__ = "0.1.0"
