"""Numerical validation of models/convert.py against a torch twin.

A from-scratch torch implementation of the tiny ZoeDepth (NCHW, reference
module naming: timm-BEiT blocks, MiDaS act_postprocess/scratch tree,
metric-bins head — semantics per ZoeDepth/zoedepth/models/zoedepth/
zoedepth_v1.py:124-202 and base_models/midas.py) is randomly initialized,
its ``state_dict()`` is pushed through ``convert_zoedepth_state_dict``, and
the flax model must reproduce the torch outputs end to end.  This pins down
every layout convention in the converter (conv/conv-transpose/linear
transposes, qkv bias composition, rel-pos table indexing, readout).
"""
import dataclasses
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from luciddreamer_tpu.models.backbone import ViTConfig  # noqa: E402
from luciddreamer_tpu.models.convert import (  # noqa: E402
    _resize_rel_pos_table,
    convert_zoedepth_state_dict,
)
from luciddreamer_tpu.models.zoedepth import (  # noqa: E402
    FlaxZoeDepth,
    ZoeDepthConfig,
)

# tiny twin configuration: 4-block ViT, project readout (the ZoeD_N path)
TINY_VIT = ViTConfig(patch_size=16, embed_dim=64, depth=4, num_heads=2,
                     hooks=(0, 1, 2, 3), readout="project")
TINY_CFG = dataclasses.replace(
    ZoeDepthConfig.tiny(), vit=TINY_VIT,
)


# ---------------------------------------------------------------------------
# torch twin (test-only; independent NCHW implementation with the reference's
# module names so state_dict() keys line up with the converter's name map)
# ---------------------------------------------------------------------------


class TwinAttention(nn.Module):
    def __init__(self, dim, num_heads, grid):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, 3 * dim, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.proj = nn.Linear(dim, dim)
        h, w = grid
        num_rel = (2 * h - 1) * (2 * w - 1) + 3
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros(num_rel, num_heads)
        )
        # timm BEiT relative_position_index construction
        coords = torch.stack(
            torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
        ).flatten(1)                                      # (2, N)
        rel = coords[:, :, None] - coords[:, None, :]     # (2, N, N)
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += h - 1
        rel[:, :, 1] += w - 1
        rel[:, :, 0] *= 2 * w - 1
        n = h * w
        idx = torch.zeros((n + 1, n + 1), dtype=torch.long)
        idx[1:, 1:] = rel.sum(-1)
        idx[0, 0:] = num_rel - 3
        idx[0:, 0] = num_rel - 2
        idx[0, 0] = num_rel - 1
        self.register_buffer("relative_position_index", idx)

    def forward(self, x):
        B, N, C = x.shape
        hd = C // self.num_heads
        bias = torch.cat(
            [self.q_bias, torch.zeros_like(self.v_bias), self.v_bias]
        )
        qkv = F.linear(x, self.qkv.weight, bias)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        rel = self.relative_position_bias_table[
            self.relative_position_index
        ].permute(2, 0, 1)
        attn = attn + rel.unsqueeze(0)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


class TwinMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TwinBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio, grid):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TwinAttention(dim, num_heads, grid)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TwinMlp(dim, int(dim * mlp_ratio))
        self.gamma_1 = nn.Parameter(torch.ones(dim))
        self.gamma_2 = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        x = x + self.gamma_1 * self.attn(self.norm1(x))
        return x + self.gamma_2 * self.mlp(self.norm2(x))


class TwinViT(nn.Module):
    def __init__(self, c: ViTConfig, grid):
        super().__init__()
        self.hooks = tuple(c.hooks)
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(
            3, c.embed_dim, c.patch_size, stride=c.patch_size
        )
        self.cls_token = nn.Parameter(torch.zeros(1, 1, c.embed_dim))
        self.blocks = nn.ModuleList(
            [TwinBlock(c.embed_dim, c.num_heads, c.mlp_ratio, grid)
             for _ in range(c.depth)]
        )

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x)
        x = x.flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], 1)
        feats = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in self.hooks:
                feats.append(x)
        return feats


class TwinReadoutProject(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.project = nn.Sequential(nn.Linear(2 * dim, dim), nn.GELU())

    def forward(self, tokens):
        cls = tokens[:, :1]
        patches = tokens[:, 1:]
        return self.project(
            torch.cat([patches, cls.expand_as(patches)], -1)
        )


class TwinRCU(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.conv1 = nn.Conv2d(features, features, 3, padding=1)
        self.conv2 = nn.Conv2d(features, features, 3, padding=1)

    def forward(self, x):
        y = F.relu(x)
        y = self.conv1(y)
        y = F.relu(y)
        return x + self.conv2(y)


class TwinFusion(nn.Module):
    def __init__(self, features, with_rcu1):
        super().__init__()
        if with_rcu1:
            self.resConfUnit1 = TwinRCU(features)
        self.resConfUnit2 = TwinRCU(features)
        self.out_conv = nn.Conv2d(features, features, 1)

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        return self.out_conv(x)


class TwinNet(nn.Module):
    """1x1-conv MLP with the reference's ``_net`` Sequential naming."""

    def __init__(self, cin, hidden, cout):
        super().__init__()
        self._net = nn.Sequential(
            nn.Conv2d(cin, hidden, 1), nn.ReLU(), nn.Conv2d(hidden, cout, 1),
            nn.Softplus(),
        )

    def forward(self, x):
        return self._net(x)


class TwinProjector(nn.Module):
    def __init__(self, cin, hidden, cout):
        super().__init__()
        self._net = nn.Sequential(
            nn.Conv2d(cin, hidden, 1), nn.ReLU(), nn.Conv2d(hidden, cout, 1),
        )

    def forward(self, x):
        return self._net(x)


class TwinNormedNet(nn.Module):
    """conv->relu->conv->relu 1x1 MLP (the 'normed' seed/attractor nets)."""

    def __init__(self, cin, hidden, cout):
        super().__init__()
        self._net = nn.Sequential(
            nn.Conv2d(cin, hidden, 1), nn.ReLU(), nn.Conv2d(hidden, cout, 1),
            nn.ReLU(),
        )

    def forward(self, x):
        return self._net(x)


def build_twin_core(cfg: ZoeDepthConfig) -> nn.Module:
    """The MiDaS/DPT core module tree shared by the N/K and NK twins."""
    c = cfg.vit
    ih, iw = cfg.img_size
    grid = (ih // c.patch_size, iw // c.patch_size)
    f = cfg.midas_features
    och = cfg.out_channels

    pretrained = nn.Module()
    pretrained.model = TwinViT(c, grid)
    for k in range(4):
        ap = nn.Sequential()
        ap.add_module("0", TwinReadoutProject(c.embed_dim))
        ap.add_module("3", nn.Conv2d(c.embed_dim, och[k], 1))
        if k == 0:
            ap.add_module(
                "4", nn.ConvTranspose2d(och[k], och[k], 4, stride=4)
            )
        elif k == 1:
            ap.add_module(
                "4", nn.ConvTranspose2d(och[k], och[k], 2, stride=2)
            )
        elif k == 3:
            ap.add_module(
                "4", nn.Conv2d(och[k], och[k], 3, stride=2, padding=1)
            )
        setattr(pretrained, f"act_postprocess{k + 1}", ap)

    scratch = nn.Module()
    for k in range(4):
        setattr(scratch, f"layer{k + 1}_rn",
                nn.Conv2d(och[k], f, 3, padding=1, bias=False))
    for k in range(1, 5):
        setattr(scratch, f"refinenet{k}", TwinFusion(f, with_rcu1=k < 4))
    scratch.output_conv = nn.Sequential()
    scratch.output_conv.add_module("0", nn.Conv2d(f, f // 2, 3, padding=1))
    scratch.output_conv.add_module("2", nn.Conv2d(f // 2, 32, 3, padding=1))
    scratch.output_conv.add_module("4", nn.Conv2d(32, 1, 1))

    inner = nn.Module()
    inner.pretrained = pretrained
    inner.scratch = scratch
    core = nn.Module()
    core.core = inner
    return core


def twin_midas_forward(cfg: ZoeDepthConfig, core: nn.Module, x):
    c = cfg.vit
    inner = core.core
    B, _, H, W = x.shape
    ph, pw = H // c.patch_size, W // c.patch_size
    feats = inner.pretrained.model(x)
    layers = []
    for k in range(4):
        ap = getattr(inner.pretrained, f"act_postprocess{k + 1}")
        y = ap[0](feats[k])
        y = y.transpose(1, 2).reshape(B, c.embed_dim, ph, pw)
        y = ap[1](y)
        if len(ap) > 2:
            y = ap[2](y)
        y = getattr(inner.scratch, f"layer{k + 1}_rn")(y)
        layers.append(y)
    l1_rn, l2_rn, l3_rn, l4_rn = layers
    r4 = inner.scratch.refinenet4(l4_rn)
    r3 = inner.scratch.refinenet3(r4, l3_rn)
    r2 = inner.scratch.refinenet2(r3, l2_rn)
    r1 = inner.scratch.refinenet1(r2, l1_rn)
    # output_conv holds modules named "0", "2", "4" at positions 0, 1, 2
    y = inner.scratch.output_conv[0](r1)
    y = F.interpolate(y, size=(H, W), mode="bilinear", align_corners=True)
    y = inner.scratch.output_conv[1](y)
    out_conv = F.relu(y)
    rel = F.relu(inner.scratch.output_conv[2](out_conv))
    return rel[:, 0], (out_conv, l4_rn, r4, r3, r2, r1)


# the reference's attractor layers call dist(dx) WITHOUT forwarding the
# configured alpha/gamma (attractor.py:120), so the jit-script defaults are
# what shipped checkpoints ran with
DIST_ALPHA, DIST_GAMMA = 300.0, 2


class TwinZoe(nn.Module):
    def __init__(self, cfg: ZoeDepthConfig):
        super().__init__()
        self.cfg = cfg
        self.normed = cfg.bin_centers_type == "normed"
        f = cfg.midas_features
        self.core = build_twin_core(cfg)

        btl = f
        self.conv2 = nn.Conv2d(btl, btl, 1)
        if self.normed:
            self.seed_bin_regressor = TwinNormedNet(btl, 256, cfg.n_bins)
            self.attractors = nn.ModuleList(
                [TwinNormedNet(cfg.bin_embedding_dim, 128, 2 * n)
                 for n in cfg.n_attractors]
            )
        else:
            self.seed_bin_regressor = TwinNet(btl, 256, cfg.n_bins)
            self.attractors = nn.ModuleList(
                [TwinNet(cfg.bin_embedding_dim, 128, n)
                 for n in cfg.n_attractors]
            )
        self.seed_projector = TwinProjector(btl, 128, cfg.bin_embedding_dim)
        self.projectors = nn.ModuleList(
            [TwinProjector(f, 128, cfg.bin_embedding_dim) for _ in range(4)]
        )
        cin = 33 + cfg.bin_embedding_dim
        self.conditional_log_binomial = nn.Module()
        self.conditional_log_binomial.mlp = nn.Sequential(
            nn.Conv2d(cin, cin // 2, 1), nn.GELU(),
            nn.Conv2d(cin // 2, 4, 1), nn.Softplus(),
        )

    def midas_forward(self, x):
        return twin_midas_forward(self.cfg, self.core, x)

    def forward(self, x):
        cfg = self.cfg
        x = (x - 0.5) / 0.5
        rel_depth, hooks = self.midas_forward(x)
        out_conv, btlnck, r4, r3, r2, r1 = hooks

        xb = self.conv2(btlnck)
        if self.normed:
            y = self.seed_bin_regressor(xb) + 1e-3
            wn = y / y.sum(dim=1, keepdim=True)
            widths = (cfg.max_depth - cfg.min_depth) * wn
            widths = F.pad(widths, (0, 0, 0, 0, 1, 0), value=cfg.min_depth)
            edges = torch.cumsum(widths, dim=1)
            seed_centers = 0.5 * (edges[:, :-1] + edges[:, 1:])
            b_prev = (seed_centers - cfg.min_depth) / (
                cfg.max_depth - cfg.min_depth
            )
        else:
            b_prev = self.seed_bin_regressor(xb)
        prev_emb = self.seed_projector(xb)
        b_centers = b_prev
        for i, blk in enumerate((r4, r3, r2, r1)):
            emb = self.projectors[i](blk)
            pe = F.interpolate(prev_emb, size=emb.shape[2:], mode="bilinear",
                               align_corners=True)
            a = self.attractors[i](emb + pe)
            bc = F.interpolate(b_prev, size=emb.shape[2:], mode="bilinear",
                               align_corners=True)
            if self.normed:
                a = a + 1e-3
                n, c2, h, w = a.shape
                points = a.view(n, c2 // 2, 2, h, w)[:, :, 0]
            else:
                points = a
            dx = points.unsqueeze(2) - bc.unsqueeze(1)  # (B, A, nbins, h, w)
            delta = dx / (1.0 + DIST_ALPHA * dx ** DIST_GAMMA)
            delta = delta.sum(dim=1)
            if cfg.attractor_kind == "mean":
                delta = delta / points.shape[1]
            b_prev = bc + delta
            if self.normed:
                scaled = (cfg.max_depth - cfg.min_depth) * b_prev \
                    + cfg.min_depth
                scaled, _ = torch.sort(scaled, dim=1)
                b_centers = torch.clip(scaled, cfg.min_depth, cfg.max_depth)
            else:
                b_centers = b_prev
            prev_emb = emb

        last = out_conv
        rel_cond = F.interpolate(rel_depth.unsqueeze(1), size=last.shape[2:],
                                 mode="bilinear", align_corners=True)
        last = torch.cat([last, rel_cond], dim=1)
        emb_up = F.interpolate(prev_emb, size=last.shape[2:], mode="bilinear",
                               align_corners=True)

        y = self.conditional_log_binomial.mlp(torch.cat([last, emb_up], 1))
        p2, t2 = y[:, :2] + 1e-4, y[:, 2:] + 1e-4
        p = p2[:, 0] / (p2[:, 0] + p2[:, 1])
        t = t2[:, 0] / (t2[:, 0] + t2[:, 1])
        t = (cfg.max_temp - cfg.min_temp) * t + cfg.min_temp
        K = cfg.n_bins
        k = torch.arange(K, dtype=torch.float32)
        eps = 1e-7
        n = torch.tensor(float(K - 1)) + eps
        kk = k + eps
        log_coef = (n * torch.log(n) - kk * torch.log(kk)
                    - (n - kk) * torch.log(n - kk + eps))
        pcl = p.clamp(1e-4, 1.0).unsqueeze(1)
        ompcl = (1.0 - p).clamp(1e-4, 1.0).unsqueeze(1)
        logits = (log_coef.view(1, K, 1, 1)
                  + k.view(1, K, 1, 1) * torch.log(pcl)
                  + (K - 1 - k).view(1, K, 1, 1) * torch.log(ompcl))
        probs = torch.softmax(logits / t.unsqueeze(1), dim=1)
        centers = F.interpolate(b_centers, size=probs.shape[2:],
                                mode="bilinear", align_corners=True)
        depth = (probs * centers).sum(dim=1)
        B, _, H, W = x.shape
        depth = F.interpolate(depth.unsqueeze(1), size=(H, W),
                              mode="bilinear", align_corners=True)[:, 0]
        return {"metric_depth": depth, "rel_depth": rel_depth}


class TwinPatchTransformer(nn.Module):
    """Reference patch_transformer.py: 1x1 conv embedding, ZERO-pad class
    token, sinusoidal positions, torch nn.TransformerEncoder (post-norm)."""

    def __init__(self, in_channels, embedding_dim=128):
        super().__init__()
        layer = nn.TransformerEncoderLayer(embedding_dim, 4,
                                           dim_feedforward=1024)
        self.transformer_encoder = nn.TransformerEncoder(layer, num_layers=4)
        self.embedding_convPxP = nn.Conv2d(in_channels, embedding_dim, 1)

    def forward(self, x):
        e = self.embedding_convPxP(x).flatten(2)      # (N, E, S-1)
        e = F.pad(e, (1, 0))                          # zero class token
        e = e.permute(2, 0, 1)                        # (S, N, E)
        S, N, E = e.shape
        pos = torch.arange(S, dtype=torch.float32).unsqueeze(1)
        idx = torch.arange(0, E, 2, dtype=torch.float32).unsqueeze(0)
        div = torch.exp(idx * (-torch.log(torch.tensor(10000.0)) / E))
        pe = torch.cat([torch.sin(pos * div), torch.cos(pos * div)], dim=1)
        e = e + pe.unsqueeze(1)
        return self.transformer_encoder(e)


def twin_clb_depth(cfg, y, b_centers, H, W):
    """Shared CLB -> expected-depth math (dist_layers.py + final resize)."""
    K = b_centers.shape[1]
    p2, t2 = y[:, :2] + 1e-4, y[:, 2:] + 1e-4
    p = p2[:, 0] / (p2[:, 0] + p2[:, 1])
    t = t2[:, 0] / (t2[:, 0] + t2[:, 1])
    t = (cfg.max_temp - cfg.min_temp) * t + cfg.min_temp
    k = torch.arange(K, dtype=torch.float32)
    eps = 1e-7
    n = torch.tensor(float(K - 1)) + eps
    kk = k + eps
    log_coef = (n * torch.log(n) - kk * torch.log(kk)
                - (n - kk) * torch.log(n - kk + eps))
    pcl = p.clamp(1e-4, 1.0).unsqueeze(1)
    ompcl = (1.0 - p).clamp(1e-4, 1.0).unsqueeze(1)
    logits = (log_coef.view(1, K, 1, 1)
              + k.view(1, K, 1, 1) * torch.log(pcl)
              + (K - 1 - k).view(1, K, 1, 1) * torch.log(ompcl))
    probs = torch.softmax(logits / t.unsqueeze(1), dim=1)
    centers = F.interpolate(b_centers, size=probs.shape[2:],
                            mode="bilinear", align_corners=True)
    depth = (probs * centers).sum(dim=1)
    return F.interpolate(depth.unsqueeze(1), size=(H, W),
                         mode="bilinear", align_corners=True)[:, 0]


class TwinZoeNK(nn.Module):
    """Reference NK twin (zoedepth_nk_v1.py module tree): router + two
    heads; computes BOTH domain depths so parity can be checked without
    routing (the reference routes per batch, the flax model per image)."""

    NAMES = ("nyu", "kitti")

    def __init__(self, cfg: ZoeDepthConfig):
        super().__init__()
        self.cfg = cfg
        f = cfg.midas_features
        bed = cfg.bin_embedding_dim
        self.core = build_twin_core(cfg)
        self.conv2 = nn.Conv2d(f, f, 1)
        self.patch_transformer = TwinPatchTransformer(f, 128)
        self.mlp_classifier = nn.Sequential(
            nn.Linear(128, 128), nn.ReLU(), nn.Linear(128, 2)
        )
        self.seed_bin_regressors = nn.ModuleDict(
            {n: TwinNet(f, bed // 2, cfg.n_bins) for n in self.NAMES}
        )
        self.seed_projector = TwinProjector(f, bed // 2, bed)
        self.projectors = nn.ModuleList(
            [TwinProjector(f, bed // 2, bed) for _ in range(4)]
        )
        # NK passes n_attractors[i] into the n_bins slot, so every layer
        # has the DEFAULT 16 attractor points and mlp_dim = bed
        # (zoedepth_nk_v1.py:146-152)
        self.attractors = nn.ModuleDict(
            {n: nn.ModuleList([TwinNet(bed, bed, 16) for _ in range(4)])
             for n in self.NAMES}
        )
        cin = 32 + bed          # NO +1: NK does not concat rel depth
        self.conditional_log_binomial = nn.ModuleDict()
        for n in self.NAMES:
            m = nn.Module()
            m.mlp = nn.Sequential(
                nn.Conv2d(cin, cin // 4, 1), nn.GELU(),
                nn.Conv2d(cin // 4, 4, 1), nn.Softplus(),
            )
            self.conditional_log_binomial[n] = m

    def forward(self, x):
        cfg = self.cfg
        B, _, H, W = x.shape
        x = (x - 0.5) / 0.5
        rel_depth, hooks = twin_midas_forward(cfg, self.core, x)
        out_conv, btlnck, r4, r3, r2, r1 = hooks
        xb = self.conv2(btlnck)
        emb = self.patch_transformer(xb)[0]           # class token (N, E)
        logits = self.mlp_classifier(emb)
        depths = []
        for name in self.NAMES:
            b_prev = self.seed_bin_regressors[name](xb)
            prev_emb = self.seed_projector(xb)
            b_centers = b_prev
            for i, blk in enumerate((r4, r3, r2, r1)):
                e2 = self.projectors[i](blk)
                pe = F.interpolate(prev_emb, size=e2.shape[2:],
                                   mode="bilinear", align_corners=True)
                a = self.attractors[name][i](e2 + pe)
                bc = F.interpolate(b_prev, size=e2.shape[2:],
                                   mode="bilinear", align_corners=True)
                dx = a.unsqueeze(2) - bc.unsqueeze(1)
                delta = (dx / (1.0 + DIST_ALPHA * dx ** DIST_GAMMA)).sum(1)
                delta = delta / a.shape[1]            # kind='mean'
                b_prev = bc + delta
                b_centers = b_prev
                prev_emb = e2
            last = out_conv                           # no rel concat in NK
            emb_up = F.interpolate(prev_emb, size=last.shape[2:],
                                   mode="bilinear", align_corners=True)
            y = self.conditional_log_binomial[name].mlp(
                torch.cat([last, emb_up], 1)
            )
            depths.append(twin_clb_depth(cfg, y, b_centers, H, W))
        return {
            "per_domain_depth": torch.stack(depths, dim=-1),
            "domain_logits": logits,
            "rel_depth": rel_depth,
        }


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def _rand_init(module, gen):
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)


def test_conv_transpose_primitive(rng):
    """flax ConvTranspose needs the torch kernel spatially flipped."""
    from luciddreamer_tpu.models.convert import _conv_t
    from flax import linen as fnn

    g = torch.Generator().manual_seed(0)
    tc = nn.ConvTranspose2d(3, 5, 4, stride=4)
    _rand_init(tc, g)
    x = torch.randn(2, 3, 6, 6, generator=g)
    with torch.no_grad():
        y_t = tc(x).numpy()
    sd = {f"t.{k}": v.numpy() for k, v in tc.state_dict().items()}
    fp = _conv_t(sd, "t")
    m = fnn.ConvTranspose(5, (4, 4), strides=(4, 4))
    y_j = m.apply(
        {"params": {"kernel": jnp.asarray(fp["kernel"]),
                    "bias": jnp.asarray(fp["bias"])}},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(y_j).transpose(0, 3, 1, 2), y_t, atol=1e-5
    )


def test_rel_pos_table_resize_matches_f_interpolate():
    g = torch.Generator().manual_seed(1)
    src = 9                                  # (2*5-1): trained at 5x5 grid
    heads = 4
    table = torch.randn(src * src + 3, heads, generator=g).numpy()
    out = _resize_rel_pos_table(table, (4, 6))        # -> (7, 11) grid
    grid = torch.from_numpy(table[:-3]).reshape(src, src, heads)
    ref = F.interpolate(
        grid.permute(2, 0, 1).unsqueeze(0), size=(7, 11),
        mode="bilinear", align_corners=False,
    )[0].permute(1, 2, 0).reshape(-1, heads).numpy()
    np.testing.assert_allclose(out[:-3], ref, atol=1e-6)
    np.testing.assert_allclose(out[-3:], table[-3:])


def test_end_to_end_torch_twin_parity(rng):
    torch.manual_seed(0)
    g = torch.Generator().manual_seed(42)
    twin = TwinZoe(TINY_CFG).eval()
    _rand_init(twin, g)
    # keep bin widths in a sane range: softplus nets get smaller weights
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}

    variables = convert_zoedepth_state_dict(sd, TINY_CFG)
    flax_model = FlaxZoeDepth(TINY_CFG)

    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_j = flax_model.apply(variables, jnp.asarray(x))

    rel_t = out_t["rel_depth"].numpy()
    rel_j = np.asarray(out_j["rel_depth"])
    np.testing.assert_allclose(rel_j, rel_t, atol=2e-4, rtol=1e-3)

    d_t = out_t["metric_depth"].numpy()
    d_j = np.asarray(out_j["metric_depth"])
    assert np.isfinite(d_j).all()
    np.testing.assert_allclose(d_j, d_t, atol=5e-4, rtol=1e-3)


TINY_K_CFG = dataclasses.replace(
    TINY_CFG, bin_centers_type="normed", max_depth=80.0
)


def test_kitti_normed_torch_twin_parity(rng):
    """ZoeD_K path: normed (bounded) bin centers; the converter's name map
    is identical, the math (seed normalization, attractor point pairs,
    sort+clip) must line up end to end."""
    torch.manual_seed(0)
    g = torch.Generator().manual_seed(11)
    twin = TwinZoe(TINY_K_CFG).eval()
    _rand_init(twin, g)
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = convert_zoedepth_state_dict(sd, TINY_K_CFG)
    flax_model = FlaxZoeDepth(TINY_K_CFG)

    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_j = flax_model.apply(variables, jnp.asarray(x))
    d_t = out_t["metric_depth"].numpy()
    d_j = np.asarray(out_j["metric_depth"])
    assert np.isfinite(d_j).all()
    # normed centers live on (min_depth, 80): loosen atol accordingly
    np.testing.assert_allclose(d_j, d_t, atol=5e-3, rtol=1e-3)


def test_nk_torch_twin_parity(rng):
    """ZoeD_NK: two-head + patch-transformer router.  Compares BOTH domain
    depths and the router logits (routing itself differs by design: the
    reference votes per batch, the flax model per image)."""
    from luciddreamer_tpu.models.convert import convert_zoedepth_nk_state_dict
    from luciddreamer_tpu.models.zoedepth_nk import FlaxZoeDepthNK

    torch.manual_seed(0)
    g = torch.Generator().manual_seed(13)
    twin = TwinZoeNK(TINY_CFG).eval()
    _rand_init(twin, g)
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = convert_zoedepth_nk_state_dict(sd, TINY_CFG)
    flax_model = FlaxZoeDepthNK(TINY_CFG)

    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_j = flax_model.apply(variables, jnp.asarray(x))

    np.testing.assert_allclose(
        np.asarray(out_j["rel_depth"]), out_t["rel_depth"].numpy(),
        atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_j["domain_logits"]), out_t["domain_logits"].numpy(),
        atol=1e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_j["per_domain_depth"]),
        out_t["per_domain_depth"].numpy(),
        atol=1e-3, rtol=1e-3,
    )
    # flax routing: metric_depth equals the argmax-selected domain slice
    pick = np.argmax(np.asarray(out_j["domain_logits"]), axis=-1)
    sel = np.take_along_axis(
        np.asarray(out_j["per_domain_depth"]),
        pick[:, None, None, None], axis=-1,
    )[..., 0]
    np.testing.assert_allclose(np.asarray(out_j["metric_depth"]), sel)


def test_nk_converted_tree_structure_matches_init():
    from luciddreamer_tpu.models.convert import convert_zoedepth_nk_state_dict
    from luciddreamer_tpu.models.zoedepth_nk import FlaxZoeDepthNK

    torch.manual_seed(0)
    g = torch.Generator().manual_seed(17)
    twin = TwinZoeNK(TINY_CFG)
    _rand_init(twin, g)
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = convert_zoedepth_nk_state_dict(sd, TINY_CFG)

    model = FlaxZoeDepthNK(TINY_CFG)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ref_flat = {jax.tree_util.keystr(p): l.shape for p, l in
                jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_flat = {jax.tree_util.keystr(p): np.shape(l) for p, l in
                jax.tree_util.tree_flatten_with_path(variables)[0]}
    assert ref_flat == got_flat


@pytest.mark.slow
def test_full_size_zoed_n_torch_twin_parity(rng):
    """The FULL BEiT-L-384 geometry (embed 1024, 24 blocks, 16 heads, hooks
    5/11/17/23, DPT 256, 384x512) through the converter, random weights:
    catches the shape/indexing bugs the tiny config hides (hook indices past
    block 3, 47x63 rel-pos grids, 1024-dim qkv bias composition).
    Ref: hubconf.py:66, depth_model.py:57-128."""
    from luciddreamer_tpu.models.zoedepth import ZoeDepthConfig

    torch.manual_seed(0)
    g = torch.Generator().manual_seed(23)
    cfg = ZoeDepthConfig()                      # the production ZoeD_N config
    twin = TwinZoe(cfg).eval()
    _rand_init(twin, g)
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}

    variables = convert_zoedepth_state_dict(sd, cfg)
    flax_model = FlaxZoeDepth(cfg)

    x = rng.uniform(size=(1, 384, 512, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_j = flax_model.apply(variables, jnp.asarray(x))

    # random init drives activations to ~1e5 through 24 blocks, so a few
    # pixels accumulate percent-level fp32 drift; real checkpoints are far
    # tamer.  Bound the tail loosely and the bulk tightly.
    rel_t = out_t["rel_depth"].numpy()
    rel_j = np.asarray(out_j["rel_depth"])
    np.testing.assert_allclose(rel_j, rel_t, atol=1e-3, rtol=5e-2)
    frac_tight = np.mean(
        np.abs(rel_j - rel_t) <= 1e-3 + 1e-2 * np.abs(rel_t)
    )
    assert frac_tight > 0.999, frac_tight
    # expected depth = sum(softmax * centers) is hypersensitive to fp noise
    # at random-weight temperatures: bound the bulk tightly, the tail sanely
    d_t = out_t["metric_depth"].numpy()
    d_j = np.asarray(out_j["metric_depth"])
    assert np.isfinite(d_j).all()
    rel_err = np.abs(d_j - d_t) / (np.abs(d_t) + 1e-3)
    assert np.mean(rel_err <= 1e-2) > 0.999, np.mean(rel_err <= 1e-2)
    assert np.max(rel_err) < 0.5, np.max(rel_err)


@pytest.mark.slow
def test_full_size_rel_pos_resize_through_converter():
    """A 384x384-trained state dict (47x47 rel-pos grids, as the released
    ZoeD_N checkpoint ships) converted for 384x512 inference must come out
    with 47x63+3 tables equal to the validated bilinear resize."""
    from luciddreamer_tpu.models.zoedepth import ZoeDepthConfig

    cfg = ZoeDepthConfig()
    sq_cfg = dataclasses.replace(cfg, img_size=(384, 384))
    torch.manual_seed(1)
    g = torch.Generator().manual_seed(29)
    twin = TwinZoe(sq_cfg)                      # grid 24x24 -> 47x47 tables
    _rand_init(twin, g)
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}

    variables = convert_zoedepth_state_dict(sd, cfg)   # target 384x512
    t0 = sd[
        "core.core.pretrained.model.blocks.0.attn"
        ".relative_position_bias_table"
    ]
    got = variables["params"]["core"]["vit"]["block0"]["attn"]["rel_pos"][
        "rel_pos_table"
    ]
    assert got.shape == (47 * 63 + 3, 16)
    np.testing.assert_allclose(got, _resize_rel_pos_table(t0, (24, 32)))


def test_converted_param_tree_structure_matches_init(rng):
    """Every converted leaf must match the flax init tree in name and shape."""
    torch.manual_seed(0)
    g = torch.Generator().manual_seed(7)
    twin = TwinZoe(TINY_CFG)
    _rand_init(twin, g)
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = convert_zoedepth_state_dict(sd, TINY_CFG)

    model = FlaxZoeDepth(TINY_CFG)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ref_flat = {jax.tree_util.keystr(p): l.shape for p, l in
                jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_flat = {jax.tree_util.keystr(p): np.shape(l) for p, l in
                jax.tree_util.tree_flatten_with_path(variables)[0]}
    assert ref_flat == got_flat
