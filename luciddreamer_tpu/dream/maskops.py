"""Mask utilities for the inpainting path.

JAX ports of the reference's mask helpers: ``pad_mask`` (box-dilate a mask
by p pixels via an all-ones conv, luciddreamer.py:51-55) and the ControlNet
inpaint conditioning image (masked pixels set to -1,
luciddreamer.py:159-167)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from luciddreamer_tpu.dream.warp import max_filter


def pad_mask(mask, pad_amount: int = 1):
    """(H, W) 0/1 mask -> bool mask dilated by ``pad_amount`` pixels."""
    m = jnp.asarray(mask, jnp.float32)
    return max_filter(m, 2 * pad_amount + 1) > 0.0


def controlnet_inpaint_condition(image, mask):
    """image (H, W, 3) [0,1], mask (H, W) 1=hole -> (1, 3, H, W) condition
    with masked pixels at -1 (luciddreamer.py:159-167)."""
    img = jnp.asarray(image, jnp.float32)
    m = jnp.asarray(mask, jnp.float32) > 0.5
    img = jnp.where(m[..., None], -1.0, img)
    return img.transpose(2, 0, 1)[None]
