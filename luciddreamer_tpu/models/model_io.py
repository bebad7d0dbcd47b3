"""Depth-model registry, builder, and checkpoint save/load.

The flax replacement for the reference's importlib registry and resource
loader (ZoeDepth/zoedepth/models/builder.py:27-51, model_io.py):

- ``build_depth_model(name, ...)`` resolves a registered architecture to a
  ready ``FlaxZoeDepthEstimator`` (optionally loading weights);
- ``save_params`` / ``load_params`` persist flax param trees as msgpack
  (flax.serialization), the functional analogue of torch.save state dicts;
- ``load_pretrained`` accepts either a native msgpack checkpoint or a torch
  .pt ZoeD_N checkpoint (routed through models/convert.py), mirroring the
  reference's ``local::``/checkpoint-dict handling.
"""
from __future__ import annotations

import os
from typing import Callable

import jax
import numpy as np
from flax import serialization

from luciddreamer_tpu.models.zoedepth import (
    FlaxZoeDepth,
    FlaxZoeDepthEstimator,
    ZoeDepthConfig,
)

_REGISTRY: dict[str, Callable[[], ZoeDepthConfig]] = {}


def register_depth_model(name: str, cfg_factory: Callable[[], ZoeDepthConfig]):
    _REGISTRY[name] = cfg_factory


register_depth_model("zoedepth", ZoeDepthConfig)          # ZoeD_N geometry
register_depth_model("zoedepth_tiny", ZoeDepthConfig.tiny)


def available_depth_models() -> list[str]:
    return sorted(_REGISTRY)


def save_params(params, path: str) -> str:
    """Serialize a flax param tree to msgpack bytes at ``path``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    return path


def load_params(path: str, like=None):
    """Load a msgpack param tree; ``like`` (a template tree) restores exact
    structure/dtypes, otherwise the raw nested dict is returned."""
    with open(path, "rb") as f:
        data = f.read()
    if like is not None:
        return serialization.from_bytes(like, data)
    return serialization.msgpack_restore(data)


def load_pretrained(path: str, cfg: ZoeDepthConfig):
    """Load depth-model weights from ``path`` into a FlaxZoeDepth param tree.

    ``.pt``/``.pth`` files are treated as torch ZoeD_N checkpoints and run
    through the name-mapping converter; anything else is read as a native
    msgpack tree saved by ``save_params``.
    """
    if path.endswith((".pt", ".pth")):
        from luciddreamer_tpu.models.convert import (
            convert_zoedepth_state_dict,
            load_torch_state_dict,
        )

        return convert_zoedepth_state_dict(load_torch_state_dict(path), cfg)
    return load_params(path)


def build_depth_model(name: str = "zoedepth", pretrained: str | None = None,
                      cfg: ZoeDepthConfig | None = None,
                      **estimator_kw) -> FlaxZoeDepthEstimator:
    """Registry entry point (builder.py:27-51 equivalent).

    ``pretrained`` may be a filesystem path to a checkpoint; when omitted,
    the env var ``LDT_ZOE_CKPT`` is consulted.  Building the full-size
    ``zoedepth`` WITHOUT weights raises — a random-initialized BEiT-L
    presented as a metric depth model is a silent failure mode, not a model
    (the reference always loads pretrained weights, hubconf.py:66).
    """
    if cfg is None:
        if name not in _REGISTRY:
            raise KeyError(
                f"unknown depth model {name!r}; have {available_depth_models()}"
            )
        cfg = _REGISTRY[name]()
    pretrained = pretrained or os.environ.get("LDT_ZOE_CKPT") or None
    params = None
    if pretrained:
        if not os.path.exists(pretrained):
            raise FileNotFoundError(
                f"depth checkpoint {pretrained!r} does not exist"
            )
        params = load_pretrained(pretrained, cfg)
    elif name == "zoedepth":
        raise RuntimeError(
            "build_depth_model('zoedepth') needs pretrained weights: pass "
            "pretrained=<path to ZoeD_N .pt or a msgpack checkpoint> or set "
            "LDT_ZOE_CKPT. Use name='zoedepth_tiny' for a random-init "
            "test-scale model."
        )
    return FlaxZoeDepthEstimator(cfg=cfg, params=params, **estimator_kw)
