"""Multi-device 3DGS training driver: the dp x tiles twin of train.loop.Trainer.

Drives ``sharded_train_step_batch`` across iterations with the full host-side
protocol of the single-device Trainer (train/loop.py):

* one-step-lag overflow resolution — the overflow flag of step k is pulled
  while step k+1 runs, so dispatch never serializes on a device round-trip;
  overflowed steps are device-side no-ops (state update voided inside the
  jitted step) and are re-run after the per-shard pair budget doubles;
* densify/prune + opacity reset on the reference cadence
  (luciddreamer.py:274-327), executed replicated under the mesh — the
  P-scale compaction is tiny next to the render and XLA keeps the params
  replicated across chips with no extra collectives;
* each iteration consumes mesh.shape['data'] cameras (classic DP over the
  camera axis); with data=1 the iteration sequence is identical to the
  single-device Trainer given the same seed (tested in
  tests/test_parallel.py::test_sharded_trainer_matches_single_device).

The gradient all-reduce over the mesh is inserted by XLA in the backward of
shard_map (replicated params used by every tile shard) where the scheduler
can overlap it with remaining backward work (SURVEY.md §7.9).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.config import GSConfig
from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.model.gaussians import (
    DensifyStats,
    densify_and_prune,
    reset_opacity,
)
from luciddreamer_tpu.model.optim import adam_init
from luciddreamer_tpu.train.loop import TrainState
from luciddreamer_tpu.parallel.sharded import sharded_train_step_batch


class ShardedTrainer:
    """Trains a TrainState over a ``('data', 'tiles')`` mesh.

    views: list of (Camera, image(3,H,W)[, depth(H,W)]) or objects with
    .camera/.image[/.depth] — same normalization as Trainer.run.
    """

    def __init__(
        self,
        params: GaussianParams,
        cfg: GSConfig,
        cameras_extent: float,
        mesh,
        pair_cap: int | None = None,
        backend: str | None = None,
        chunk: int = 64,
        seed: int = 0,
        grad_overlap: bool = False,
    ):
        self.cfg = cfg
        self.extent = float(cameras_extent)
        self.mesh = mesh
        self.backend = backend or (
            "pallas" if jax.default_backend() == "tpu" else "xla"
        )
        self.chunk = chunk
        n_tiles_axis = mesh.shape["tiles"]
        if pair_cap is None:
            pair_cap = max(4096, int(params.capacity * 8) // n_tiles_axis)
        self.pair_cap = pair_cap
        self.bg = jnp.array(
            [1.0, 1.0, 1.0] if cfg.white_background else [0.0, 0.0, 0.0]
        )
        self.state = TrainState(
            params=params,
            adam=adam_init(params.param_pytree()),
            stats=DensifyStats.zero(params.capacity),
            step=jnp.zeros((), jnp.int32),
        )
        # grad_overlap selects the manual chunked-ring reduction with the
        # Adam update interleaved per chunk (parallel/overlap.py) instead of
        # the autodiff psum — same numerics (incl. the masked depth-L1 term
        # when views carry depth and cfg.lambda_depth > 0), overlapped ICI
        # traffic.
        self.grad_overlap = grad_overlap
        self.py_rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self._build_step()
        self._densify_fn = jax.jit(
            self._densify, donate_argnums=(0,), static_argnums=(2,)
        )
        self._reset_fn = jax.jit(self._opacity_reset, donate_argnums=(0,))
        self.last_overflow = False

    # ---- jitted pieces ----

    def _build_step(self):
        pair_cap = self.pair_cap

        if self.grad_overlap:
            from luciddreamer_tpu.parallel.overlap import (
                sharded_train_step_overlapped,
            )

            def step(state, cam_batch, gt_batch, depth_batch):
                return sharded_train_step_overlapped(
                    state, cam_batch, gt_batch, self.bg, self.mesh,
                    self.cfg, self.extent, chunk=self.chunk,
                    pair_cap=pair_cap, backend=self.backend,
                    gt_depth_batch=depth_batch,
                )
        else:
            def step(state, cam_batch, gt_batch, depth_batch):
                return sharded_train_step_batch(
                    state, cam_batch, gt_batch, self.bg, self.mesh,
                    self.cfg, self.extent, gt_depth_batch=depth_batch,
                    chunk=self.chunk, pair_cap=pair_cap,
                    backend=self.backend,
                )

        self._step_fn = jax.jit(step, donate_argnums=(0,))

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
        self.pair_cap *= 2
        self._build_step()
        self.last_overflow = True
        self._cap_gen += 1

    def _sample_batch(self, norm):
        B = self.mesh.shape["data"]
        picks = [norm[self.py_rng.integers(len(norm))] for _ in range(B)]
        cam_batch = jax.tree.map(lambda *xs: jnp.stack(xs),
                                 *[p[0] for p in picks])
        gt_batch = jnp.stack([p[1] for p in picks])
        depths = [p[2] for p in picks]
        if any(d is None for d in depths):
            depth_batch = None
        else:
            depth_batch = jnp.stack(depths)
        return cam_batch, gt_batch, depth_batch

    def run(self, views, iterations: int | None = None, callback=None,
            log_every: int = 0):
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
                depth = (jnp.asarray(v[2])
                         if len(v) > 2 and v[2] is not None else None)
                norm.append((cam, img, depth))

        self._cap_gen = 0
        pending = None
        it = 0
        launched = 0
        with self.mesh:
            while launched < iterations:
                it += 1
                launched += 1
                cam_b, gt_b, dep_b = self._sample_batch(norm)
                self.state, loss, ovf = self._step_fn(
                    self.state, cam_b, gt_b, dep_b
                )

                if pending is not None:
                    p_ovf, p_gen = pending
                    if bool(p_ovf):
                        launched -= 1
                        if p_gen == self._cap_gen:
                            self._grow_pair_cap()
                pending = (ovf, self._cap_gen)

                if log_every and it % log_every == 0:
                    alive = int(jnp.sum(self.state.params.alive))
                    print(
                        f"[bake/sharded] it {it:5d}  loss {float(loss):.4f}  "
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
                    callback(it, self.state, loss)

            # flush the trailing overflow flag (same protocol as Trainer.run)
            while pending is not None:
                p_ovf, p_gen = pending
                pending = None
                if bool(p_ovf):
                    if p_gen == self._cap_gen:
                        self._grow_pair_cap()
                    cam_b, gt_b, dep_b = self._sample_batch(norm)
                    self.state, loss, ovf = self._step_fn(
                        self.state, cam_b, gt_b, dep_b
                    )
                    pending = (ovf, self._cap_gen)
        return self.state
