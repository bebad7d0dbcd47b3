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

import numpy as np
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


class _EncoderLayer(nn.Module):
    """One torch ``nn.TransformerEncoderLayer`` (its default POST-norm form:
    ``x = norm1(x + attn(x)); x = norm2(x + ff(x))``, relu FF)."""

    embedding_dim: int
    num_heads: int
    ff_dim: int = 1024

    @nn.compact
    def __call__(self, x):                                   # (B, S, E)
        B, S, E = x.shape
        hd = E // self.num_heads
        qkv = nn.Dense(3 * E, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(B, S, self.num_heads, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k)) / np.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        h = jnp.einsum("bhqk,bkhd->bqhd", attn, split(v)).reshape(B, S, E)
        h = nn.Dense(E, name="proj")(h)
        x = nn.LayerNorm(name="norm1")(x + h)
        h = nn.Dense(self.ff_dim, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dense(E, name="fc2")(h)
        return nn.LayerNorm(name="norm2")(x + h)


class PatchTransformerEncoder(nn.Module):
    """patch_transformer.py: PxP conv embedding + a ZERO class token
    (``F.pad(embeddings, (1, 0))`` — not a learned parameter,
    patch_transformer.py:83-85), sinusoidal positions, 4 post-norm encoder
    layers; returns the class-token embedding."""

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
        tokens = jnp.pad(tokens, ((0, 0), (1, 0), (0, 0)))   # zero cls token

        # sinusoidal positional encoding (patch_transformer.py:51-67)
        S = tokens.shape[1]
        pos = jnp.arange(S, dtype=jnp.float32)[:, None]
        idx = jnp.arange(0, self.embedding_dim, 2, dtype=jnp.float32)[None, :]
        div = jnp.exp(idx * (-jnp.log(10000.0) / self.embedding_dim))
        pe = jnp.concatenate([jnp.sin(pos * div), jnp.cos(pos * div)], axis=1)
        tokens = tokens + pe[None, :, : self.embedding_dim]

        for i in range(self.num_layers):
            tokens = _EncoderLayer(self.embedding_dim, self.num_heads,
                                   name=f"layer{i}")(tokens)
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
            # both reference bin confs use n_bins == 64 == the model n_bins
            # (config_zoedepth_nk.json); scaling with cfg.n_bins keeps the
            # tiny config consistent
            _, seed = SeedBinRegressorUnnormed(
                c.n_bins, mlp_dim=c.bin_embedding_dim // 2,
                name=f"seed_bin_{conf.name}")(xb)
            b_prev = seed
            emb_prev = prev_emb
            b_centers = seed
            for i, blk in enumerate(x_blocks):
                emb = projectors[i](blk)
                # NK passes n_attractors[i] POSITIONALLY into the n_bins
                # slot (zoedepth_nk_v1.py:146-152), so every layer really
                # has the default 16 attractor points and mlp_dim =
                # bin_embedding_dim — reproduced faithfully
                b_prev, b_centers = AttractorLayerUnnormed(
                    16, c.attractor_alpha, c.attractor_gamma,
                    c.attractor_kind, c.attractor_type,
                    mlp_dim=c.bin_embedding_dim,
                    name=f"attractor{i}_{conf.name}",
                )(emb, b_prev, emb_prev)
                emb_prev = emb

            # NK feeds out_conv alone to the CLB — NO rel-depth concat
            # (zoedepth_nk_v1.py:222-229; last_in = N_MIDAS_OUT = 32, vs
            # the N variant's 33) — and does not clip the softplus centers
            last = out_conv
            emb_up = _resize(emb_prev, last.shape[1], last.shape[2])
            probs = ConditionalLogBinomial(
                c.n_bins, c.min_temp, c.max_temp, bottleneck_factor=4,
                name=f"clb_{conf.name}")(last, emb_up)
            centers = _resize(b_centers, probs.shape[1], probs.shape[2])
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
