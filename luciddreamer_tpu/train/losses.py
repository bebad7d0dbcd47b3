"""Image losses: L1, 11x11 sigma-1.5 SSIM, PSNR, depth smoothing helpers.

Ports of the reference loss semantics (utils/loss.py:18-98, utils/image.py).
The SSIM window conv is expressed as two separable depthwise convolutions —
XLA fuses them; same result as the reference's dense 11x11 window because the
Gaussian window is an outer product (utils/loss.py:30-36).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def l1_loss(x, y):
    return jnp.mean(jnp.abs(x - y))


def l2_loss(x, y):
    return jnp.mean((x - y) ** 2)


def mse(img1, img2):
    return jnp.mean((img1 - img2) ** 2)


def psnr(img1, img2):
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse(img1, img2)))


@functools.lru_cache
def _gaussian_window(window_size: int, sigma: float):
    # numpy on purpose: an lru_cache holding a traced jnp array would leak
    # tracers out of jit scopes
    import numpy as np

    g = np.array(
        [
            math.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2))
            for x in range(window_size)
        ],
        np.float32,
    )
    return g / np.sum(g)


def _blur(x, window):
    """Separable depthwise 'same' conv over the last two axes of (C, H, W)."""
    w = window.shape[0]
    pad = w // 2
    # rows
    x = jax.lax.conv_general_dilated(
        x[:, None],                                   # (C, 1, H, W)
        window.reshape(1, 1, w, 1),
        (1, 1), [(pad, pad), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    x = jax.lax.conv_general_dilated(
        x, window.reshape(1, 1, 1, w),
        (1, 1), [(0, 0), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return x[:, 0]


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5,
         size_average: bool = True):
    """img1/img2: (C, H, W) in [0, 1].  Matches reference _ssim
    (utils/loss.py:49-69): zero-padded window conv, C1=0.01^2, C2=0.03^2."""
    window = _gaussian_window(window_size, sigma)
    mu1 = _blur(img1, window)
    mu2 = _blur(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window) - mu2_sq
    sigma12 = _blur(img1 * img2, window) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(ssim_map) if size_average else jnp.mean(ssim_map, (1, 2))


_CROSS = jnp.array([[0.0, 1.0, 0.0], [1.0, 0.0, 1.0], [0.0, 1.0, 0.0]],
                   jnp.float32)


def near_mean_map(array, mask, kernelsize: int = 3):
    """Masked 4-neighbor mean of a (H, W) map (utils/loss.py:86-98) — used
    for depth-smoothing losses.  Pure function; the reference builds the conv
    at import time on the GPU."""
    assert kernelsize == 3
    k = _CROSS.reshape(1, 1, 3, 3)
    conv = lambda x: jax.lax.conv_general_dilated(
        x[None, None], k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    num = conv(array * mask)
    cnt = conv(jnp.ones_like(array) * mask)
    return num / (cnt + 1e-8)


def sobel_edge_mask(image, threshold: float = 0.2, edge_is_one: bool = True):
    """Edge mask for depth-loss weighting.  Capability stand-in for the
    reference's cv2.Canny mask (utils/loss.py:74-79) — which the training
    loss never consumes — using a pure-JAX Sobel magnitude threshold."""
    gray = jnp.mean(image, axis=0)                       # (H, W)
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = kx.T
    conv = lambda x, k: jax.lax.conv_general_dilated(
        x[None, None], k.reshape(1, 1, 3, 3), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    mag = jnp.sqrt(conv(gray, kx) ** 2 + conv(gray, ky) ** 2)
    edge = (mag > threshold).astype(jnp.float32)
    return edge if edge_is_one else 1.0 - edge
