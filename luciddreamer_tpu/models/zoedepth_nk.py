"""ZoeDepth-NK: two metric heads (indoor/outdoor bin configs) routed by a
patch-transformer classifier on the DPT bottleneck.

Flax re-architecture of the reference zoedepth_nk_v1.py (two bin configs,
patch transformer with class token + 2-way MLP router, per-domain seed bin
regressors and attractors sharing the projector stack) and
layers/patch_transformer.py (sinusoidal 1D positional encoding).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from luciddreamer_tpu.models.backbone import DPT, ViTConfig, VIT_TINY_TEST, _resize
from luciddreamer_tpu.models.zoedepth import (
    AttractorLayerUnnormed,
    ConditionalLogBinomial,
    Projector,
    SeedBinRegressorUnnormed,
    ZoeDepthConfig,
)


@dataclasses.dataclass(frozen=True)
class BinConf:
    name: str
    n_bins: int
    min_depth: float
    max_depth: float


# config_zoedepth_nk.json bin_conf
NK_BIN_CONFS = (
    BinConf("nyu", 64, 1e-3, 10.0),
    BinConf("kitti", 64, 1e-3, 80.0),
)


class PatchTransformerEncoder(nn.Module):
    """patch_transformer.py: PxP conv embedding + sinusoidal positions +
    4-layer transformer encoder; returns the class-token embedding."""

    embedding_dim: int = 128
    patch_size: int = 1
    num_heads: int = 4
    num_layers: int = 4

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        e = nn.Conv(self.embedding_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    name="embed")(x)
        tokens = e.reshape(B, -1, self.embedding_dim)
        cls = self.param("cls", nn.initializers.normal(0.02),
                         (1, 1, self.embedding_dim))
        tokens = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), tokens], axis=1)

        # sinusoidal positional encoding (patch_transformer.py:51-67)
        S = tokens.shape[1]
        pos = jnp.arange(S, dtype=jnp.float32)[:, None]
        idx = jnp.arange(0, self.embedding_dim, 2, dtype=jnp.float32)[None, :]
        div = jnp.exp(idx * (-jnp.log(10000.0) / self.embedding_dim))
        pe = jnp.concatenate([jnp.sin(pos * div), jnp.cos(pos * div)], axis=1)
        tokens = tokens + pe[None, :, : self.embedding_dim]

        for i in range(self.num_layers):
            h = nn.LayerNorm(name=f"ln1_{i}")(tokens)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, name=f"attn_{i}")(h, h)
            tokens = tokens + h
            h = nn.LayerNorm(name=f"ln2_{i}")(tokens)
            h = nn.Dense(1024, name=f"fc1_{i}")(h)
            h = nn.relu(h)
            h = nn.Dense(self.embedding_dim, name=f"fc2_{i}")(h)
            tokens = tokens + h
        return tokens[:, 0]                                  # class token


class FlaxZoeDepthNK(nn.Module):
    """Two-domain metric head; the router picks the bin configuration per
    image (zoedepth_nk_v1.py:100-110 + forward)."""

    cfg: ZoeDepthConfig
    bin_confs: Sequence[BinConf] = NK_BIN_CONFS

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        xin = (x - 0.5) / 0.5
        rel_depth, hooks = DPT(c.vit, features=c.midas_features,
                               out_channels=tuple(c.out_channels),
                               name="core")(xin)
        out_conv, btlnck, r4, r3, r2, r1 = hooks
        x_blocks = (r4, r3, r2, r1)

        xb = nn.Conv(btlnck.shape[-1], (1, 1), name="conv2")(btlnck)

        # router
        cls_emb = PatchTransformerEncoder(name="patch_transformer")(xb)
        logits = nn.Dense(128, name="cls1")(cls_emb)
        logits = nn.relu(logits)
        logits = nn.Dense(len(self.bin_confs), name="cls2")(logits)
        domain_probs = jax.nn.softmax(logits, axis=-1)       # (B, 2)

        # per-domain bins (computed for all domains; routed by argmax prob —
        # the reference routes a whole batch by its mean logits)
        prev_emb = Projector(c.bin_embedding_dim,
                             mlp_dim=c.bin_embedding_dim // 2,
                             name="seed_projector")(xb)
        # the projector stack is SHARED between domains
        # (zoedepth_nk_v1.py: nn.ModuleList outside the per-conf dicts)
        projectors = [
            Projector(c.bin_embedding_dim, mlp_dim=c.bin_embedding_dim // 2,
                      name=f"projector{i}")
            for i in range(len(x_blocks))
        ]
        depths = []
        for conf in self.bin_confs:
            _, seed = SeedBinRegressorUnnormed(
                conf.n_bins, mlp_dim=c.bin_embedding_dim // 2,
                name=f"seed_bin_{conf.name}")(xb)
            b_prev = seed
            emb_prev = prev_emb
            b_centers = seed
            for i, (blk, n_att) in enumerate(zip(x_blocks, c.n_attractors)):
                emb = projectors[i](blk)
                b_prev, b_centers = AttractorLayerUnnormed(
                    n_att, c.attractor_alpha, c.attractor_gamma,
                    c.attractor_kind, c.attractor_type,
                    name=f"attractor{i}_{conf.name}",
                )(emb, b_prev, emb_prev)
                emb_prev = emb

            last = out_conv
            rel_cond = _resize(rel_depth[..., None], last.shape[1],
                               last.shape[2])
            last = jnp.concatenate([last, rel_cond], axis=-1)
            emb_up = _resize(emb_prev, last.shape[1], last.shape[2])
            probs = ConditionalLogBinomial(
                conf.n_bins, c.min_temp, c.max_temp,
                name=f"clb_{conf.name}")(last, emb_up)
            centers = _resize(b_centers, probs.shape[1], probs.shape[2])
            centers = jnp.clip(centers, conf.min_depth, conf.max_depth)
            d = jnp.sum(probs * centers, axis=-1)
            B, H, W, _ = x.shape
            depths.append(_resize(d[..., None], H, W)[..., 0])

        stacked = jnp.stack(depths, axis=-1)                 # (B, H, W, 2)
        pick = jnp.argmax(domain_probs, axis=-1)             # (B,)
        depth = jnp.take_along_axis(
            stacked, pick[:, None, None, None], axis=-1
        )[..., 0]
        return {
            "metric_depth": depth,
            "rel_depth": rel_depth,
            "domain_logits": logits,
            "per_domain_depth": stacked,
        }
