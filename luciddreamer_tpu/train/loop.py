"""The 3DGS optimization loop ("baking"), jit-compiled end to end.

Reference: LucidDreamer.training (luciddreamer.py:274-327).  Differences by
design, all TPU-motivated:

* ONE jitted train step covering render -> loss -> backward -> Adam update ->
  densification-stat accumulation.  No shape changes inside: the Gaussian
  buffer has fixed capacity with an alive mask, so densify/prune (also
  jitted) never retraces.  The reference reallocates parameter + optimizer
  tensors every densify (gaussian_model.py:258-327).
* the SH warm-up (oneupSHdegree every 1000 its, luciddreamer.py:287-288) is
  a *traced* coefficient mask, not a static degree — zeroing SH bands is
  mathematically identical to evaluating a lower degree, and avoids a
  retrace per degree bump.
* optional real depth loss (the reference declares use_depth but never reads
  it, arguments.py:17): masked L1 on render depth vs frame depth.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from luciddreamer_tpu.config import GSConfig
from luciddreamer_tpu.core.types import Camera, GaussianParams
from luciddreamer_tpu.model.gaussians import (
    DensifyStats,
    add_densification_stats,
    densify_and_prune,
    reset_opacity,
)
from luciddreamer_tpu.model.optim import AdamState, adam_init, adam_update, learning_rates
from luciddreamer_tpu.render.tiled import render_tiled
from luciddreamer_tpu.train.losses import l1_loss, ssim


@struct.dataclass
class TrainState:
    params: GaussianParams
    adam: AdamState
    stats: DensifyStats
    step: jax.Array          # scalar int32, number of completed iterations


def sh_band_mask(active_degree, n_rest: int):
    """(n_rest, 1) 0/1 mask keeping SH bands <= active_degree (rest
    coefficients start at band 1)."""
    idx = jnp.arange(n_rest) + 1                      # coefficient index
    band = jnp.floor(jnp.sqrt(idx.astype(jnp.float32))).astype(jnp.int32)
    return (band <= active_degree).astype(jnp.float32)[:, None]


class Trainer:
    """Drives TrainState through cfg.iterations steps over a list of views.

    views: list of (Camera, image(3,H,W)) — or a Scene's train_views.
    """

    def __init__(
        self,
        params: GaussianParams,
        cfg: GSConfig,
        cameras_extent: float,
        pair_cap: int | None = None,
        backend: str | None = None,
        chunk: int = 384,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.extent = float(cameras_extent)
        self.backend = backend or (
            "pallas" if jax.default_backend() == "tpu" else "xla"
        )
        self.chunk = chunk
        self.pair_cap = pair_cap
        self.max_sh_degree = params.max_sh_degree
        self.bg = jnp.array(
            [1.0, 1.0, 1.0] if cfg.white_background else [0.0, 0.0, 0.0]
        )
        self.state = TrainState(
            params=params,
            adam=adam_init(params.param_pytree()),
            stats=DensifyStats.zero(params.capacity),
            step=jnp.zeros((), jnp.int32),
        )
        self.py_rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self._step_fn = jax.jit(self._step, donate_argnums=(0,))
        self._densify_fn = jax.jit(
            self._densify, donate_argnums=(0,), static_argnums=(2,)
        )
        self._reset_fn = jax.jit(self._opacity_reset, donate_argnums=(0,))
        self.last_overflow = False

    # ---- jitted pieces ----

    def _render_loss(self, pdict, mean2d_offset, alive, camera, gt_image,
                     gt_depth, sh_mask):
        params = GaussianParams.from_param_pytree(pdict, alive)
        params = params.replace(
            features_rest=params.features_rest * sh_mask[None]
        )
        out = render_tiled(
            params, camera, self.bg, active_sh_degree=self.max_sh_degree,
            chunk=self.chunk, pair_cap=self.pair_cap, backend=self.backend,
            mean2d_offset=mean2d_offset,
        )
        img = out["render"]
        ll1 = l1_loss(img, gt_image)
        loss = (1.0 - self.cfg.lambda_dssim) * ll1 + self.cfg.lambda_dssim * (
            1.0 - ssim(img, gt_image)
        )
        if self.cfg.lambda_depth > 0.0 and gt_depth is not None:
            dmask = (gt_depth > 0) & (out["depth"] > 0)
            dl = jnp.sum(jnp.abs(out["depth"] - gt_depth) * dmask) / (
                jnp.sum(dmask) + 1e-8
            )
            loss = loss + self.cfg.lambda_depth * dl
        aux = {
            "radii": out["radii"],
            "overflow": out["overflow"],
            "l1": ll1,
        }
        return loss, aux

    def _step(self, state: TrainState, camera: Camera, gt_image, gt_depth):
        # iteration is 1-based in the reference (luciddreamer.py:283)
        it = state.step + 1
        active_deg = jnp.minimum(it // 1000, self.max_sh_degree)
        sh_mask = sh_band_mask(active_deg, (self.max_sh_degree + 1) ** 2 - 1)
        pdict = state.params.param_pytree()
        offset = jnp.zeros_like(state.params.xyz[:, :2])

        grad_fn = jax.value_and_grad(self._render_loss, argnums=(0, 1),
                                     has_aux=True)
        (loss, aux), (grads, g2d) = grad_fn(
            pdict, offset, state.params.alive, camera, gt_image, gt_depth,
            sh_mask,
        )

        lrs = learning_rates(self.cfg, self.extent, it - 1)
        new_pdict, adam = adam_update(pdict, grads, state.adam, lrs)
        # the reference skips the optimizer step on the final iteration
        # (luciddreamer.py:325); harmless either way — we always step.
        stats = add_densification_stats(state.stats, g2d, aux["radii"])

        # NEVER commit an update computed from a truncated pair list: an
        # overflowed render dropped pairs, so its gradient is wrong.  The
        # reference never drops pairs (device-side buffer resize,
        # rasterize_points.cu:27-33); here the whole update is gated on the
        # overflow flag and the host loop re-runs the lost iteration after
        # growing pair_cap.  step is not advanced either, keeping the lr
        # schedule aligned with the number of real updates.
        ovf = aux["overflow"]
        gate = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(ovf, b, a), new, old
        )
        new_state = TrainState(
            params=GaussianParams.from_param_pytree(
                gate(new_pdict, pdict), state.params.alive
            ),
            adam=gate(adam, state.adam),
            stats=gate(stats, state.stats),
            step=jnp.where(ovf, state.step, it),
        )
        return new_state, loss, ovf

    def _densify(self, state: TrainState, key, max_screen_size):
        params, adam, stats, ovf = densify_and_prune(
            state.params, state.adam, state.stats, key,
            grad_threshold=self.cfg.densify_grad_threshold,
            min_opacity=0.005,
            extent=self.extent,
            max_screen_size=max_screen_size,
            percent_dense=self.cfg.percent_dense,
        )
        return state.replace(params=params, adam=adam, stats=stats), ovf

    def _opacity_reset(self, state: TrainState):
        params, adam = reset_opacity(state.params, state.adam)
        return state.replace(params=params, adam=adam)

    # ---- host loop ----

    def _grow_pair_cap(self):
        if self.pair_cap is None:
            from luciddreamer_tpu.render.tiled import default_pair_capacity

            self.pair_cap = default_pair_capacity(self.state.params.capacity)
        self.pair_cap *= 2
        self._step_fn = jax.jit(self._step, donate_argnums=(0,))
        self.last_overflow = True
        self._cap_gen += 1

    def run(self, views, iterations: int | None = None, callback=None,
            log_every: int = 0, timer=None):
        """views: list of (Camera, gt_image[, gt_depth]) or objects with
        .camera/.image[/.depth].

        ``log_every`` > 0 prints periodic loss / PSNR-proxy / alive-count
        lines (SURVEY §5.5 — the reference only shows tqdm bars).  ``timer``
        is an optional utils.profiling.PhaseTimer.

        ``callback(it, state, loss)`` receives ``loss`` as a DEVICE scalar
        (jax.Array), not a Python float: pulling it every iteration would
        serialize dispatch on a host round-trip and break the one-step-lag
        pipeline below.  Call ``float(loss)`` inside the callback only if
        you accept that per-iteration sync (or sample it every N steps).

        Host-sync discipline: the overflow flag of step k is pulled while
        step k+1 runs (one-step lag), so dispatch is never serialized on a
        per-iteration device round-trip.  Overflowed steps are device-side
        no-ops (see _step), so a late detection costs only the lost
        iterations, which are re-run after the pair budget doubles.
        """
        cfg = self.cfg
        iterations = iterations or cfg.iterations
        norm = []
        for v in views:
            if hasattr(v, "camera"):
                depth = getattr(v, "depth", None)
                norm.append((
                    v.camera, jnp.asarray(v.image),
                    None if depth is None else jnp.asarray(depth),
                ))
            else:
                cam, img = v[0], jnp.asarray(v[1])
                depth = jnp.asarray(v[2]) if len(v) > 2 and v[2] is not None else None
                norm.append((cam, img, depth))

        self._cap_gen = 0
        pending = None                # (ovf device array, cap_gen at launch)
        it = 0
        launched = 0                  # steps assumed committed (optimistic)
        while launched < iterations:
            it += 1
            launched += 1
            cam, img, depth = norm[self.py_rng.integers(len(norm))]
            ctx = timer.phase("train_step") if timer is not None else None
            if ctx is not None:
                ctx.__enter__()
            self.state, loss, ovf = self._step_fn(self.state, cam, img, depth)
            if ctx is not None:
                ctx.__exit__(None, None, None)

            # resolve the PREVIOUS step's overflow flag (one-step lag); an
            # overflowed step was a device-side no-op, so un-count it.  Only
            # the first flag per capacity generation triggers a growth —
            # in-flight steps launched before the retrace flag the old
            # capacity again and must not double twice.
            if pending is not None:
                p_ovf, p_gen = pending
                if bool(p_ovf):
                    launched -= 1
                    if p_gen == self._cap_gen:
                        self._grow_pair_cap()
            pending = (ovf, self._cap_gen)

            if self.cfg.debug and not bool(jnp.isfinite(loss)):
                # snapshot-on-failure (the reference dumps snapshot_fw/bw on
                # CUDA errors, rasterizer __init__.py:83-90)
                from luciddreamer_tpu.utils.debug import check_finite

                check_finite(
                    {"params": self.state.params.param_pytree(),
                     "gt": img, "camera": {"view": cam.viewmatrix}},
                    outdir="debug_snapshots", tag=f"train_it{it}",
                )
                raise FloatingPointError(f"non-finite loss at iteration {it}")

            if log_every and it % log_every == 0:
                alive = int(jnp.sum(self.state.params.alive))
                print(
                    f"[bake] it {it:5d}  loss {float(loss):.4f}  "
                    f"gaussians {alive}  pair_cap {self.pair_cap}",
                    flush=True,
                )

            if it < cfg.densify_until_iter:
                if (
                    it > cfg.densify_from_iter
                    and it % cfg.densification_interval == 0
                ):
                    size_thr = (
                        20 if it > cfg.opacity_reset_interval else None
                    )
                    self.key, sub = jax.random.split(self.key)
                    self.state, dovf = self._densify_fn(
                        self.state, sub, size_thr
                    )
                    if bool(dovf):
                        self.last_overflow = True
                if it % cfg.opacity_reset_interval == 0 or (
                    cfg.white_background and it == cfg.densify_from_iter
                ):
                    self.state = self._reset_fn(self.state)

            if callback is not None:
                # the loss is passed as the DEVICE scalar: float()-ing it
                # here would block on the device every iteration and defeat
                # the one-step-lag overflow discipline above.  Callbacks that
                # want the value pay for the sync explicitly.
                callback(it, self.state, loss)

        # flush the trailing overflow flag: if the final step overflowed it
        # was a no-op, so grow and re-run until a clean update lands
        while pending is not None:
            p_ovf, p_gen = pending
            pending = None
            if bool(p_ovf):
                if p_gen == self._cap_gen:
                    self._grow_pair_cap()
                cam, img, depth = norm[self.py_rng.integers(len(norm))]
                self.state, loss, ovf = self._step_fn(
                    self.state, cam, img, depth
                )
                pending = (ovf, self._cap_gen)
        return self.state
