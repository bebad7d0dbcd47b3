"""Image losses: L1, 11x11 sigma-1.5 SSIM, PSNR, depth smoothing helpers.

Ports of the reference loss semantics (utils/loss.py:18-98, utils/image.py).
The SSIM window conv is expressed as two separable depthwise convolutions —
XLA fuses them; same result as the reference's dense 11x11 window because the
Gaussian window is an outer product (utils/loss.py:30-36).
"""
from __future__ import annotations

import functools
import math

import numpy as np
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


# numpy on purpose: a module-level jnp array would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize in
# multi-host programs (the reference has exactly this wart with its
# import-time CUDA conv, utils/loss.py:81-87)
_CROSS = np.array([[0.0, 1.0, 0.0], [1.0, 0.0, 1.0], [0.0, 1.0, 0.0]],
                  np.float32)


def near_mean_map(array, mask, kernelsize: int = 3):
    """Masked 4-neighbor mean of a (H, W) map (utils/loss.py:86-98) — used
    for depth-smoothing losses.  Pure function; the reference builds the conv
    at import time on the GPU."""
    assert kernelsize == 3
    k = jnp.asarray(_CROSS).reshape(1, 1, 3, 3)
    conv = lambda x: jax.lax.conv_general_dilated(
        x[None, None], k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    num = conv(array * mask)
    cnt = conv(jnp.ones_like(array) * mask)
    return num / (cnt + 1e-8)


def image2canny(image, thres1, thres2, isEdge1: bool = True):
    """Canny edge mask of an (H, W, 3) image in [0, 1] -> (H, W) float32.

    Port of the reference's cv2.Canny wrapper (utils/loss.py:74-79;
    computed per camera at scene/cameras.py:43 with (50, 150, isEdge1=False)
    and stored, though its training loss never consumes it).  Re-implemented
    from the Canny algorithm in numpy — no OpenCV dependency:

    * 3x3 Sobel per channel on the 0..255 intensity scale, per-pixel
      gradient taken from the channel with the largest L1 magnitude
      (cv2's multi-channel behavior, default L2gradient=False);
    * non-maximum suppression with 4-sector direction quantization;
    * double threshold + 8-connected hysteresis iterated to fixpoint.

    Thresholds are on the cv2 scale (image * 255 gradients).
    """
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    img = np.rint(img * 255.0).astype(np.float32)        # cv2 uint8 scale
    H, W, C = img.shape
    pad = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")

    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
    ky = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32)
    gx = np.zeros((H, W, C), np.float32)
    gy = np.zeros((H, W, C), np.float32)
    for dy in range(3):
        for dx in range(3):
            sl = pad[dy : dy + H, dx : dx + W]
            gx += kx[dy, dx] * sl
            gy += ky[dy, dx] * sl
    mag_c = np.abs(gx) + np.abs(gy)                      # L1, per channel
    pick = np.argmax(mag_c, axis=-1)
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gx = gx[ii, jj, pick]
    gy = gy[ii, jj, pick]
    mag = np.abs(gx) + np.abs(gy)

    # non-maximum suppression: quantize direction into 4 sectors
    ang = np.arctan2(gy, gx) % np.pi                     # [0, pi)
    sector = ((ang + np.pi / 8) // (np.pi / 4)).astype(np.int32) % 4
    offs = {0: (0, 1), 1: (1, 1), 2: (1, 0), 3: (1, -1)}
    magp = np.pad(mag, 1, mode="constant")
    keep = np.zeros((H, W), bool)
    for s, (oy, ox) in offs.items():
        n1 = magp[1 + oy : 1 + oy + H, 1 + ox : 1 + ox + W]
        n2 = magp[1 - oy : 1 - oy + H, 1 - ox : 1 - ox + W]
        keep |= (sector == s) & (mag >= n1) & (mag >= n2)

    lo, hi = float(min(thres1, thres2)), float(max(thres1, thres2))
    strong = keep & (mag > hi)
    weakm = keep & (mag > lo)

    # hysteresis: weak pixels 8-connected to strong survive
    out = strong.copy()
    while True:
        outp = np.pad(out, 1, mode="constant")
        grown = np.zeros((H, W), bool)
        for oy in (-1, 0, 1):
            for ox in (-1, 0, 1):
                grown |= outp[1 + oy : 1 + oy + H, 1 + ox : 1 + ox + W]
        new = out | (weakm & grown)
        if (new == out).all():
            break
        out = new

    canny = out.astype(np.float32)
    return canny if isEdge1 else 1.0 - canny


def sobel_edge_mask(image, threshold: float = 0.2, edge_is_one: bool = True):
    """Edge mask for depth-loss weighting: differentiable/jittable Sobel
    magnitude threshold (the jnp companion of ``image2canny``, which
    reproduces the reference's exact cv2.Canny mask on the host)."""
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
