"""Full training-state checkpoint/restore.

Counterpart of GaussianModel.capture()/restore() (gaussian_model.py:63-95),
which the reference defines but never calls; here it is a first-class
capability: the whole TrainState (params incl. alive mask, Adam moments,
densification stats, step) round-trips through orbax.
"""
from __future__ import annotations

import os

import jax
import numpy as np

from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.model.gaussians import DensifyStats
from luciddreamer_tpu.model.optim import AdamState
from luciddreamer_tpu.train.loop import TrainState


def _state_to_pytree(state: TrainState) -> dict:
    return {
        "params": dict(state.params.param_pytree(), alive=state.params.alive),
        "adam": {"count": state.adam.count, "mu": state.adam.mu,
                 "nu": state.adam.nu},
        "stats": {
            "grad_accum": state.stats.grad_accum,
            "denom": state.stats.denom,
            "max_radii2d": state.stats.max_radii2d,
        },
        "step": state.step,
    }


def _state_from_pytree(t: dict) -> TrainState:
    p = dict(t["params"])
    alive = p.pop("alive")
    return TrainState(
        params=GaussianParams.from_param_pytree(p, alive),
        adam=AdamState(count=t["adam"]["count"], mu=t["adam"]["mu"],
                       nu=t["adam"]["nu"]),
        stats=DensifyStats(
            grad_accum=t["stats"]["grad_accum"],
            denom=t["stats"]["denom"],
            max_radii2d=t["stats"]["max_radii2d"],
        ),
        step=t["step"],
    )


def save_checkpoint(state: TrainState, path: str):
    """Write the full TrainState to ``path`` (an orbax checkpoint dir)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, _state_to_pytree(jax.device_get(state)), force=True)
    return path


def load_checkpoint(path: str) -> TrainState:
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    t = ckpt.restore(os.path.abspath(path))
    t = jax.tree.map(
        lambda x: jax.numpy.asarray(x) if isinstance(x, np.ndarray) else x, t
    )
    return _state_from_pytree(t)
