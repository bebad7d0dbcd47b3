"""Monodepth training harness for the flax ZoeDepth.

Slim, functional port of the reference trainer capability
(ZoeDepth/zoedepth/trainers/base_trainer.py + zoedepth_trainer.py):
SILog (+ optional gradient) loss, OneCycle learning-rate schedule, gradient
clipping 0.1, NaN guard, periodic validation with best-checkpoint tracking,
and the a1/abs_rel/... metric suite.  Data arrives as (image, depth, mask)
batches from any iterable — the reference's DistributedSampler/DataLoader
machinery maps onto a sharded jnp batch axis when run on a mesh.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from luciddreamer_tpu.models.depth_eval import compute_metrics
from luciddreamer_tpu.models.depth_losses import grad_l1_loss, silog_loss
from luciddreamer_tpu.models.zoedepth import FlaxZoeDepth, ZoeDepthConfig


@dataclasses.dataclass
class DepthTrainConfig:
    """Mirrors config_zoedepth.json 'train' (lr 1.61e-4, wd 0.01, OneCycle
    with div_factor 1 / final_div_factor 1e4 / pct_start 0.7, grad clip 0.1,
    w_si 1, w_grad 0)."""

    lr: float = 1.61e-4
    weight_decay: float = 0.01
    epochs: int = 5
    steps_per_epoch: int = 100
    pct_start: float = 0.7
    div_factor: float = 1.0
    final_div_factor: float = 10_000.0
    grad_clip: float = 0.1
    w_si: float = 1.0
    w_grad: float = 0.0
    validate_every: int = 100


def onecycle_schedule(cfg: DepthTrainConfig):
    total = cfg.epochs * cfg.steps_per_epoch
    return optax.cosine_onecycle_schedule(
        transition_steps=total,
        peak_value=cfg.lr,
        pct_start=cfg.pct_start,
        div_factor=cfg.div_factor,
        final_div_factor=cfg.final_div_factor,
    )


class DepthTrainer:
    def __init__(self, model_cfg: Optional[ZoeDepthConfig] = None,
                 cfg: Optional[DepthTrainConfig] = None, seed: int = 0,
                 mesh=None):
        """``mesh``: optional jax Mesh with a 'data' axis — batches are
        sharded over it and parameters replicated, the jit/GSPMD equivalent
        of the reference's DDP training (train_mono.py:138-174,
        misc.py:251-282: NCCL DDP, batch divided per rank).  Multi-host
        slices additionally call parallel.multihost.initialize first."""
        self.model_cfg = model_cfg or ZoeDepthConfig.tiny()
        self.cfg = cfg or DepthTrainConfig()
        self.model = FlaxZoeDepth(self.model_cfg)
        h, w = self.model_cfg.img_size
        self.params = self.model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 3))
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.cfg.grad_clip),
            optax.adamw(onecycle_schedule(self.cfg),
                        weight_decay=self.cfg.weight_decay),
        )
        self.opt_state = self.tx.init(self.params)
        self.step = 0
        self.best_metric = float("inf")
        self.best_params = None
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._repl = NamedSharding(mesh, P())
            self._batch_sh = NamedSharding(mesh, P("data"))
            self.params = jax.device_put(self.params, self._repl)
            self.opt_state = jax.device_put(self.opt_state, self._repl)
        self._train_step = jax.jit(self._train_step_impl)

    def _shard_batch(self, x):
        if self.mesh is None:
            return jnp.asarray(x)
        return jax.device_put(jnp.asarray(x), self._batch_sh)

    def _loss(self, params, image, depth, mask):
        out = self.model.apply(params, image)
        pred = out["metric_depth"]
        loss = self.cfg.w_si * silog_loss(pred, depth, mask)
        if self.cfg.w_grad > 0:
            loss = loss + self.cfg.w_grad * grad_l1_loss(pred, depth, mask)
        return loss, pred

    def _train_step_impl(self, params, opt_state, image, depth, mask):
        (loss, pred), grads = jax.value_and_grad(self._loss, has_aux=True)(
            params, image, depth, mask
        )
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def train_batch(self, image, depth, mask=None):
        """One step; returns the loss (NaN batches are skipped, mirroring
        the reference's abort-on-NaN guard, base_trainer.py:125-128)."""
        if mask is None:
            mask = depth > 0
        params, opt_state, loss = self._train_step(
            self.params, self.opt_state,
            self._shard_batch(image), self._shard_batch(depth),
            self._shard_batch(mask),
        )
        if not bool(jnp.isfinite(loss)):
            return float(loss)          # skip the poisoned update
        self.params = params
        self.opt_state = opt_state
        self.step += 1
        return float(loss)

    def validate(self, batches: Iterable, crop: str | None = None) -> dict:
        """Metric suite averaged over batches; tracks the best abs_rel
        params (base_trainer.py:217-257)."""
        acc: dict[str, list] = {}
        for image, depth, *rest in batches:
            out = self.model.apply(self.params, jnp.asarray(image))
            pred = np.asarray(out["metric_depth"])
            for b in range(pred.shape[0]):
                m = compute_metrics(np.asarray(depth)[b], pred[b], crop=crop)
                for k, v in m.items():
                    acc.setdefault(k, []).append(v)
        means = {k: float(np.nanmean(v)) for k, v in acc.items()}
        if means.get("abs_rel", float("inf")) < self.best_metric:
            self.best_metric = means["abs_rel"]
            self.best_params = jax.device_get(self.params)
        return means

    def fit(self, data: Iterable, val_data=None, log_fn: Callable = print):
        """data yields (image (B,H,W,3), depth (B,H,W)[, mask]) tuples."""
        for i, batch in enumerate(data):
            loss = self.train_batch(*batch)
            if val_data is not None and (i + 1) % self.cfg.validate_every == 0:
                metrics = self.validate(val_data)
                log_fn(f"step {self.step}: loss {loss:.4f} "
                       f"abs_rel {metrics['abs_rel']:.4f}")
        return self.params
