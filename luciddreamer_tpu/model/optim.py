"""Transparent per-group Adam + the exp-decay xyz schedule.

Matches the reference optimizer setup (scene/gaussian_model.py:151-169):
per-parameter-group Adam (betas 0.9/0.999, eps 1e-15) with learning rates
  xyz      position_lr_init * spatial_lr_scale, exp-decayed to final
  f_dc     feature_lr            f_rest   feature_lr / 20
  opacity  opacity_lr            scaling  scaling_lr      rotation rotation_lr

Hand-rolled instead of optax so densification can perform *functional*
moment surgery (zeroing mu/nu at re-populated capacity slots) — the TPU
replacement for the reference's optimizer-state cat/prune surgery
(gaussian_model.py:258-327).  Bias correction matches torch.optim.Adam.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from luciddreamer_tpu.config import GSConfig

BETA1, BETA2 = 0.9, 0.999
EPS = 1e-15


@struct.dataclass
class AdamState:
    count: jax.Array     # scalar int32
    mu: dict             # same structure as the param dict
    nu: dict


def adam_init(params: dict) -> AdamState:
    z = jax.tree.map(jnp.zeros_like, params)
    return AdamState(count=jnp.zeros((), jnp.int32), mu=z,
                     nu=jax.tree.map(jnp.zeros_like, params))


def adam_update(params: dict, grads: dict, state: AdamState, lrs: dict):
    """One Adam step. ``lrs``: name -> scalar lr (same keys as params)."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    c1 = 1.0 - BETA1**t
    c2 = 1.0 - BETA2**t

    def upd(p, g, m, v, lr):
        m = BETA1 * m + (1.0 - BETA1) * g
        v = BETA2 * v + (1.0 - BETA2) * (g * g)
        step = lr * (m / c1) / (jnp.sqrt(v / c2) + EPS)
        return p - step, m, v

    new_p, new_m, new_v = {}, {}, {}
    for k in params:
        new_p[k], new_m[k], new_v[k] = upd(
            params[k], grads[k], state.mu[k], state.nu[k], lrs[k]
        )
    return new_p, AdamState(count=count, mu=new_m, nu=new_v)


def xyz_lr_schedule(cfg: GSConfig, spatial_lr_scale: float):
    """get_expon_lr_func semantics (utils/general.py:31-64): log-lerp between
    init and final over max_steps, with optional sine warm-up delay."""
    lr_init = cfg.position_lr_init * spatial_lr_scale
    lr_final = cfg.position_lr_final * spatial_lr_scale
    delay_mult = cfg.position_lr_delay_mult
    max_steps = cfg.position_lr_max_steps
    delay_steps = 0  # reference passes no lr_delay_steps (default 0)

    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        if delay_steps > 0:
            delay_rate = delay_mult + (1 - delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(
            jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t
        )
        return delay_rate * log_lerp

    return lr


def learning_rates(cfg: GSConfig, spatial_lr_scale: float, step) -> dict:
    """The per-group lr dict for adam_update at ``step`` (0-based)."""
    sched = xyz_lr_schedule(cfg, spatial_lr_scale)
    return {
        "xyz": sched(step),
        "f_dc": jnp.float32(cfg.feature_lr),
        "f_rest": jnp.float32(cfg.feature_lr / 20.0),
        "opacity": jnp.float32(cfg.opacity_lr),
        "scaling": jnp.float32(cfg.scaling_lr),
        "rotation": jnp.float32(cfg.rotation_lr),
    }
