"""torch-checkpoint -> flax-params converter for the ZoeDepth stack.

Maps a pretrained ZoeD_N state dict (the torch-hub checkpoint the reference
loads at ZoeDepth/hubconf.py:66 via zoedepth/models/model_io.py) onto the
parameter tree of ``FlaxZoeDepth`` (models/zoedepth.py).  Pure numpy — no
torch import needed once the state dict is materialized as arrays; use
``load_torch_state_dict`` for .pt files (gated torch import).

Name map (torch -> flax), derived from the reference module tree:

    core.core.pretrained.model.*      timm BEiT-L backbone
        patch_embed.proj              core/vit/patch_embed        (OIHW->HWIO)
        cls_token                     core/vit/cls_token
        blocks.{i}.norm1|norm2        core/vit/block{i}/norm1|2
        blocks.{i}.gamma_1|gamma_2    core/vit/block{i}/gamma1|2
        blocks.{i}.attn.qkv.weight    core/vit/block{i}/attn/qkv  (q_bias +
                                      zero k bias + v_bias composed)
        blocks.{i}.attn.proj          core/vit/block{i}/attn/proj
        blocks.{i}.attn.relative_position_bias_table
                                      core/vit/block{i}/attn/rel_pos
                                      (grid part bilinearly resized when the
                                      checkpoint window differs; 3 special
                                      rows preserved)
    core.core.pretrained.act_postprocess{k}.*   (k = 1..4)
        .0.project.0 (Linear 2C->C)   core/readout{k-1}/project
        .3 (Conv 1x1)                 core/project{k-1}
        .4 (ConvTranspose / Conv s2)  core/resample{k-1}
    core.core.scratch.layer{k}_rn     core/layer{k-1}_rn
    core.core.scratch.refinenet{k}    core/fusion{k}  (rcu1/rcu2/out_conv)
    core.core.scratch.output_conv.0|2|4   core/head1|head2|head3
    conv2                             conv2
    seed_bin_regressor._net.0|2       seed_bin_regressor/c1|c2
    seed_projector._net.0|2           seed_projector/c1|c2
    projectors.{i}._net.0|2           projector{i}/c1|c2
    attractors.{i}._net.0|2           attractor{i}/c1|c2
    conditional_log_binomial.mlp.0|2  conditional_log_binomial/mlp1|mlp2

Layout conventions: torch Conv2d weight (O, I, kh, kw) -> flax (kh, kw, I, O);
torch ConvTranspose2d weight (I, O, kh, kw) -> flax ConvTranspose kernel
(kh, kw, I, O); torch Linear weight (O, I) -> flax Dense kernel (I, O).
All mappings are numerically validated against a torch twin of the tiny
config in tests/test_zoe_convert.py.
"""
from __future__ import annotations

import numpy as np

from luciddreamer_tpu.models.zoedepth import ZoeDepthConfig


def _conv(sd, key):
    w = np.asarray(sd[f"{key}.weight"], np.float32)
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"], np.float32)
    return out


def _conv_t(sd, key):
    # torch ConvTranspose2d is the gradient of a conv: it paints each input
    # pixel's kxk output patch with the kernel in NATURAL order.  flax
    # nn.ConvTranspose (transpose_kernel=False) does not reverse spatial
    # dims, so the torch kernel must be flipped here or every upsample block
    # is applied 180-degree rotated (verified empirically in
    # tests/test_zoe_convert.py::test_conv_transpose_primitive).
    w = np.asarray(sd[f"{key}.weight"], np.float32)      # (I, O, kh, kw)
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"], np.float32)
    return out


def _dense(sd, key):
    w = np.asarray(sd[f"{key}.weight"], np.float32)
    out = {"kernel": w.T}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"], np.float32)
    return out


def _norm(sd, key):
    return {
        "scale": np.asarray(sd[f"{key}.weight"], np.float32),
        "bias": np.asarray(sd[f"{key}.bias"], np.float32),
    }


def _resize_rel_pos_table(table: np.ndarray, grid_hw: tuple[int, int]):
    """Resize a BEiT relative-position-bias table to a new token grid.

    The first (2h-1)(2w-1) rows form a 2D grid of biases which is bilinearly
    interpolated (the approach MiDaS 3.1 uses to run BEiT at non-square
    resolutions); the 3 trailing cls rows pass through unchanged.
    """
    h, w = grid_hw
    th, tw = 2 * h - 1, 2 * w - 1
    n_special = 3
    grid = table[:-n_special]
    heads = table.shape[1]
    if grid.shape[0] == th * tw:        # already at the target grid
        return table.astype(np.float32)
    src = int(round(np.sqrt(grid.shape[0])))
    if src * src != grid.shape[0]:
        raise ValueError(
            f"rel-pos table grid {grid.shape[0]} matches neither the target "
            f"{th}x{tw} nor a square source; cannot resize"
        )
    g = grid.reshape(src, src, heads)

    def interp_axis(a, n_out, axis):
        # half-pixel centers, matching torch F.interpolate(mode='bilinear')
        # with its default align_corners=False — the convention MiDaS 3.1
        # uses when resizing BEiT rel-pos tables to non-square grids
        n_in = a.shape[axis]
        if n_in == n_out:
            return a
        pos = np.clip((np.arange(n_out) + 0.5) * n_in / n_out - 0.5,
                      0.0, n_in - 1.0)
        lo = np.floor(pos).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        t = (pos - lo).reshape([-1 if i == axis else 1 for i in range(a.ndim)])
        return np.take(a, lo, axis) * (1 - t) + np.take(a, hi, axis) * t

    g = interp_axis(interp_axis(g, th, 0), tw, 1)
    return np.concatenate(
        [g.reshape(th * tw, heads), table[-n_special:]], axis=0
    ).astype(np.float32)


def strip_prefixes(sd: dict) -> dict:
    """Unwrap {'model': ...} checkpoints and drop DDP 'module.' prefixes
    (the two normalizations model_io.load_state_dict performs)."""
    if "model" in sd and not hasattr(sd["model"], "shape"):
        sd = sd["model"]
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def _convert_core(sd: dict, cfg: ZoeDepthConfig) -> dict:
    """The MiDaS/DPT core subtree (``core.core.pretrained`` + ``scratch``),
    shared by the N/K and NK converters."""
    c = cfg.vit
    bb = "core.core.pretrained.model"

    vit: dict = {
        "patch_embed": _conv(sd, f"{bb}.patch_embed.proj"),
        "cls_token": np.asarray(sd[f"{bb}.cls_token"], np.float32),
    }
    ih, iw = cfg.img_size
    grid_hw = (ih // c.patch_size, iw // c.patch_size)
    for i in range(c.depth):
        b = f"{bb}.blocks.{i}"
        qkv = _dense(sd, f"{b}.attn.qkv")
        C = c.embed_dim
        if f"{b}.attn.qkv.bias" not in sd:
            q_b = np.asarray(sd[f"{b}.attn.q_bias"], np.float32)
            v_b = np.asarray(sd[f"{b}.attn.v_bias"], np.float32)
            qkv["bias"] = np.concatenate([q_b, np.zeros(C, np.float32), v_b])
        blk = {
            "norm1": _norm(sd, f"{b}.norm1"),
            "norm2": _norm(sd, f"{b}.norm2"),
            "gamma1": np.asarray(sd[f"{b}.gamma_1"], np.float32),
            "gamma2": np.asarray(sd[f"{b}.gamma_2"], np.float32),
            "attn": {"qkv": qkv, "proj": _dense(sd, f"{b}.attn.proj")},
            "fc1": _dense(sd, f"{b}.mlp.fc1"),
            "fc2": _dense(sd, f"{b}.mlp.fc2"),
        }
        if c.use_rel_pos_bias:
            table = np.asarray(
                sd[f"{b}.attn.relative_position_bias_table"], np.float32
            )
            blk["attn"]["rel_pos"] = {
                "rel_pos_table": _resize_rel_pos_table(table, grid_hw)
            }
        vit[f"block{i}"] = blk

    core: dict = {"vit": vit}
    pp = "core.core.pretrained"
    for k in range(4):
        ap = f"{pp}.act_postprocess{k + 1}"
        if c.readout == "project":
            core[f"readout{k}"] = {"project": _dense(sd, f"{ap}.0.project.0")}
        core[f"project{k}"] = _conv(sd, f"{ap}.3")
        if k in (0, 1):
            core[f"resample{k}"] = _conv_t(sd, f"{ap}.4")
        elif k == 3:
            core[f"resample{k}"] = _conv(sd, f"{ap}.4")
        core[f"layer{k}_rn"] = _conv(sd, f"core.core.scratch.layer{k + 1}_rn")

    for k in range(1, 5):
        rf = f"core.core.scratch.refinenet{k}"
        fusion = {
            "rcu2": {
                "conv1": _conv(sd, f"{rf}.resConfUnit2.conv1"),
                "conv2": _conv(sd, f"{rf}.resConfUnit2.conv2"),
            },
            "out_conv": _conv(sd, f"{rf}.out_conv"),
        }
        if f"{rf}.resConfUnit1.conv1.weight" in sd:
            fusion["rcu1"] = {
                "conv1": _conv(sd, f"{rf}.resConfUnit1.conv1"),
                "conv2": _conv(sd, f"{rf}.resConfUnit1.conv2"),
            }
        core[f"fusion{k}"] = fusion

    oc = "core.core.scratch.output_conv"
    core["head1"] = _conv(sd, f"{oc}.0")
    core["head2"] = _conv(sd, f"{oc}.2")
    core["head3"] = _conv(sd, f"{oc}.4")
    return core


def convert_zoedepth_state_dict(sd: dict, cfg: ZoeDepthConfig) -> dict:
    """Torch ZoeD_N/ZoeD_K state dict -> {'params': ...} for
    FlaxZoeDepth.apply (the single-head model; 'normed' vs 'softplus' bin
    centers share the same parameter names).

    ``sd`` maps torch names to numpy-convertible arrays.  Raises KeyError on
    missing required weights; unknown extra keys are ignored (buffers like
    relative_position_index, k_bias, frozen-BN stats).
    """
    sd = strip_prefixes(sd)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {
        "core": _convert_core(sd, cfg),
        "conv2": _conv(sd, "conv2"),
        "seed_bin_regressor": {
            "c1": _conv(sd, "seed_bin_regressor._net.0"),
            "c2": _conv(sd, "seed_bin_regressor._net.2"),
        },
        "seed_projector": {
            "c1": _conv(sd, "seed_projector._net.0"),
            "c2": _conv(sd, "seed_projector._net.2"),
        },
        "conditional_log_binomial": {
            "mlp1": _conv(sd, "conditional_log_binomial.mlp.0"),
            "mlp2": _conv(sd, "conditional_log_binomial.mlp.2"),
        },
    }
    for i in range(len(cfg.n_attractors)):
        params[f"projector{i}"] = {
            "c1": _conv(sd, f"projectors.{i}._net.0"),
            "c2": _conv(sd, f"projectors.{i}._net.2"),
        }
        params[f"attractor{i}"] = {
            "c1": _conv(sd, f"attractors.{i}._net.0"),
            "c2": _conv(sd, f"attractors.{i}._net.2"),
        }
    return {"params": params}


def convert_zoedepth_nk_state_dict(
    sd: dict, cfg: ZoeDepthConfig, bin_conf_names=("nyu", "kitti")
) -> dict:
    """Torch ZoeD_NK state dict -> {'params': ...} for FlaxZoeDepthNK.apply.

    On top of the shared DPT core, maps the NK-specific modules
    (zoedepth_nk_v1.py:100-160):

        patch_transformer.embedding_convPxP          patch_transformer/embed
        patch_transformer.transformer_encoder
            .layers.{i}.self_attn.in_proj_*          .../layer{i}/qkv
            .layers.{i}.self_attn.out_proj           .../layer{i}/proj
            .layers.{i}.linear1|linear2              .../layer{i}/fc1|fc2
            .layers.{i}.norm1|norm2                  .../layer{i}/norm1|2
        mlp_classifier.0|2                           cls1|cls2
        seed_bin_regressors.{name}._net.0|2          seed_bin_{name}/c1|c2
        seed_projector / projectors.{i}              (shared, as in N)
        attractors.{name}.{i}._net.0|2               attractor{i}_{name}/c1|c2
        conditional_log_binomial.{name}.mlp.0|2      clb_{name}/mlp1|mlp2
    """
    sd = strip_prefixes(sd)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {
        "core": _convert_core(sd, cfg),
        "conv2": _conv(sd, "conv2"),
        "cls1": _dense(sd, "mlp_classifier.0"),
        "cls2": _dense(sd, "mlp_classifier.2"),
        "seed_projector": {
            "c1": _conv(sd, "seed_projector._net.0"),
            "c2": _conv(sd, "seed_projector._net.2"),
        },
    }

    pt: dict = {"embed": _conv(sd, "patch_transformer.embedding_convPxP")}
    for i in range(4):
        b = f"patch_transformer.transformer_encoder.layers.{i}"
        # torch MHA packs [q; k; v] row-blocks into in_proj_weight (3E, E);
        # the flax layer's single qkv Dense splits its output the same way
        w = np.asarray(sd[f"{b}.self_attn.in_proj_weight"], np.float32)
        bias = np.asarray(sd[f"{b}.self_attn.in_proj_bias"], np.float32)
        pt[f"layer{i}"] = {
            "qkv": {"kernel": w.T, "bias": bias},
            "proj": _dense(sd, f"{b}.self_attn.out_proj"),
            "fc1": _dense(sd, f"{b}.linear1"),
            "fc2": _dense(sd, f"{b}.linear2"),
            "norm1": _norm(sd, f"{b}.norm1"),
            "norm2": _norm(sd, f"{b}.norm2"),
        }
    params["patch_transformer"] = pt

    for i in range(len(cfg.n_attractors)):
        params[f"projector{i}"] = {
            "c1": _conv(sd, f"projectors.{i}._net.0"),
            "c2": _conv(sd, f"projectors.{i}._net.2"),
        }
    for name in bin_conf_names:
        params[f"seed_bin_{name}"] = {
            "c1": _conv(sd, f"seed_bin_regressors.{name}._net.0"),
            "c2": _conv(sd, f"seed_bin_regressors.{name}._net.2"),
        }
        for i in range(len(cfg.n_attractors)):
            params[f"attractor{i}_{name}"] = {
                "c1": _conv(sd, f"attractors.{name}.{i}._net.0"),
                "c2": _conv(sd, f"attractors.{name}.{i}._net.2"),
            }
        params[f"clb_{name}"] = {
            "mlp1": _conv(sd, f"conditional_log_binomial.{name}.mlp.0"),
            "mlp2": _conv(sd, f"conditional_log_binomial.{name}.mlp.2"),
        }
    return {"params": params}


def load_torch_state_dict(path: str) -> dict:
    """Read a torch .pt checkpoint into a plain {name: np.ndarray} dict."""
    import torch  # gated: only needed when actually loading .pt files

    try:
        # plain state-dict checkpoints (incl. ZoeD_N releases) load without
        # unpickling arbitrary code
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        import warnings

        warnings.warn(
            f"{path}: not a weights-only checkpoint; falling back to full "
            "unpickling (only do this for trusted files)"
        )
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd and hasattr(
        sd["model"], "state_dict"
    ):
        sd["model"] = sd["model"].state_dict()
    sd = strip_prefixes(sd)
    return {
        k: v.detach().cpu().numpy()
        for k, v in sd.items()
        if hasattr(v, "detach")
    }
