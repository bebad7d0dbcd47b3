"""Monodepth training losses (ZoeDepth/zoedepth/trainers/loss.py ports).

All take (pred (B,H,W), gt (B,H,W), mask (B,H,W) bool) and return scalars.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked(x, mask):
    w = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    return x * w, w, n


def silog_loss(pred, gt, mask, beta: float = 0.15):
    """Scale-invariant log loss: 10 * sqrt(var(g) + beta * mean(g)^2),
    g = log(pred) - log(gt) (loss.py:42-93)."""
    pred = jnp.maximum(pred, 1e-6)
    gt = jnp.maximum(gt, 1e-6)
    g = jnp.log(pred) - jnp.log(gt)
    g, w, n = _masked(g, mask)
    mean = jnp.sum(g) / n
    var = jnp.sum(w * (g - mean) ** 2) / n
    return 10.0 * jnp.sqrt(var + beta * mean**2)


def grad_l1_loss(pred, gt, mask):
    """L1 on horizontal+vertical log-depth gradients (loss.py GradL1Loss)."""
    pred = jnp.log(jnp.maximum(pred, 1e-6))
    gt = jnp.log(jnp.maximum(gt, 1e-6))

    def grads(x):
        return x[:, :, 1:] - x[:, :, :-1], x[:, 1:, :] - x[:, :-1, :]

    px, py = grads(pred)
    gx, gy = grads(gt)
    mx = mask[:, :, 1:] & mask[:, :, :-1]
    my = mask[:, 1:, :] & mask[:, :-1, :]
    lx, wx, nx = _masked(jnp.abs(px - gx), mx)
    ly, wy, ny = _masked(jnp.abs(py - gy), my)
    return jnp.sum(lx) / nx + jnp.sum(ly) / ny


def scale_and_shift_invariant_loss(pred, gt, mask):
    """MiDaS-style SSI MSE: solve per-image (s, t) minimizing
    ||s*pred + t - gt||^2 over the mask, then the residual MSE
    (loss.py ScaleAndShiftInvariantLoss)."""
    w = mask.astype(jnp.float32)
    a00 = jnp.sum(w * pred * pred, axis=(1, 2))
    a01 = jnp.sum(w * pred, axis=(1, 2))
    a11 = jnp.sum(w, axis=(1, 2))
    b0 = jnp.sum(w * pred * gt, axis=(1, 2))
    b1 = jnp.sum(w * gt, axis=(1, 2))
    det = a00 * a11 - a01 * a01
    det = jnp.where(jnp.abs(det) < 1e-8, 1.0, det)
    s = (a11 * b0 - a01 * b1) / det
    t = (-a01 * b0 + a00 * b1) / det
    res = (s[:, None, None] * pred + t[:, None, None] - gt) ** 2
    return jnp.mean(jnp.sum(res * w, axis=(1, 2))
                    / jnp.maximum(a11, 1.0))


def ordinal_regression_loss(probs, gt, mask, bin_edges):
    """DORN-style ordinal regression over bin probabilities
    (loss.py OrdinalRegressionLoss): encourage cumulative probabilities to
    agree with the gt bin index.  probs (B,H,W,K), bin_edges (K+1,)."""
    K = probs.shape[-1]
    gt_idx = jnp.clip(
        jnp.searchsorted(bin_edges, gt) - 1, 0, K - 1
    )                                                       # (B,H,W)
    k = jnp.arange(K)
    ge = (k[None, None, None, :] <= gt_idx[..., None]).astype(jnp.float32)
    p = jnp.clip(probs, 1e-7, 1.0 - 1e-7)
    ll = ge * jnp.log(p) + (1 - ge) * jnp.log(1 - p)
    w = mask.astype(jnp.float32)[..., None]
    return -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w) * K, 1.0)


def discrete_nll_loss(probs, gt, mask, bin_centers):
    """Cross-entropy against the gt's nearest bin (loss.py DiscreteNLLLoss).
    probs (B,H,W,K), bin_centers (K,)."""
    idx = jnp.argmin(
        jnp.abs(gt[..., None] - bin_centers[None, None, None, :]), axis=-1
    )
    p = jnp.take_along_axis(
        jnp.clip(probs, 1e-7, 1.0), idx[..., None], axis=-1
    )[..., 0]
    nll, w, n = _masked(-jnp.log(p), mask)
    return jnp.sum(nll) / n
