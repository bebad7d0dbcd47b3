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

_REGISTRY: dict[str, tuple[Callable[[], ZoeDepthConfig], str]] = {}

# names of full-size entries that refuse to build random-initialized
_FULL_SIZE = frozenset({"zoedepth", "zoedepth_k", "zoedepth_nk"})


def register_depth_model(name: str, cfg_factory: Callable[[], ZoeDepthConfig],
                         kind: str = "zoedepth"):
    """``kind`` selects the architecture: 'zoedepth' (single-head N/K) or
    'zoedepth_nk' (two-head + router, hubconf.py:107)."""
    _REGISTRY[name] = (cfg_factory, kind)


register_depth_model("zoedepth", ZoeDepthConfig)          # ZoeD_N geometry
register_depth_model("zoedepth_tiny", ZoeDepthConfig.tiny)
register_depth_model("zoedepth_k", ZoeDepthConfig.kitti)  # ZoeD_K (normed)
register_depth_model("zoedepth_k_tiny", ZoeDepthConfig.kitti_tiny)
register_depth_model("zoedepth_nk", ZoeDepthConfig, kind="zoedepth_nk")
register_depth_model("zoedepth_nk_tiny", ZoeDepthConfig.tiny,
                     kind="zoedepth_nk")


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


def load_pretrained(path: str, cfg: ZoeDepthConfig, kind: str = "zoedepth"):
    """Load depth-model weights from ``path`` into a flax param tree.

    ``.pt``/``.pth`` files are treated as torch ZoeDepth checkpoints and run
    through the name-mapping converter for ``kind``; anything else is read
    as a native msgpack tree saved by ``save_params``.
    """
    if path.endswith((".pt", ".pth")):
        from luciddreamer_tpu.models import convert

        sd = convert.load_torch_state_dict(path)
        if kind == "zoedepth_nk":
            return convert.convert_zoedepth_nk_state_dict(sd, cfg)
        return convert.convert_zoedepth_state_dict(sd, cfg)
    return load_params(path)


def build_depth_model(name: str = "zoedepth", pretrained: str | None = None,
                      cfg: ZoeDepthConfig | None = None,
                      **estimator_kw) -> FlaxZoeDepthEstimator:
    """Registry entry point (builder.py:27-51 equivalent); covers the
    reference hub entries ZoeD_N ('zoedepth'), ZoeD_K ('zoedepth_k') and
    ZoeD_NK ('zoedepth_nk') plus their tiny test-scale twins.

    ``pretrained`` may be a filesystem path to a checkpoint; when omitted,
    the env var ``LDT_ZOE_CKPT`` is consulted.  Building a full-size model
    WITHOUT weights raises — a random-initialized BEiT-L presented as a
    metric depth model is a silent failure mode, not a model (the reference
    always loads pretrained weights, hubconf.py:66,107,150).
    """
    kind = "zoedepth"
    if name in _REGISTRY:
        factory, kind = _REGISTRY[name]
        if cfg is None:
            cfg = factory()
    elif cfg is None:
        raise KeyError(
            f"unknown depth model {name!r}; have {available_depth_models()}"
        )
    pretrained = pretrained or os.environ.get("LDT_ZOE_CKPT") or None
    params = None
    if pretrained:
        if not os.path.exists(pretrained):
            raise FileNotFoundError(
                f"depth checkpoint {pretrained!r} does not exist"
            )
        params = load_pretrained(pretrained, cfg, kind)
    elif name in _FULL_SIZE:
        raise RuntimeError(
            f"build_depth_model({name!r}) needs pretrained weights: pass "
            "pretrained=<path to a torch .pt or a msgpack checkpoint> or set "
            f"LDT_ZOE_CKPT. Use name='{name}_tiny' for a random-init "
            "test-scale model."
        )
    if kind == "zoedepth_nk":
        from luciddreamer_tpu.models.zoedepth_nk import FlaxZoeDepthNK

        estimator_kw.setdefault("model_cls", FlaxZoeDepthNK)
    return FlaxZoeDepthEstimator(cfg=cfg, params=params, **estimator_kw)
