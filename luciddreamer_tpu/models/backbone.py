"""ViT encoder + DPT decoder (the MiDaS "DPT_BEiT_L_384" core), in flax.

Re-architecture of the torch-hub MiDaS backbone the reference downloads at
runtime (ZoeDepth/zoedepth/models/base_models/midas.py:341-342) together
with its feature hooks (midas.py:297-319): the encoder is a ViT with
BEiT-style relative position bias, four intermediate layers are reassembled
into a feature pyramid, and DPT fusion blocks refine top-down.  Returns the
six hooked tensors (out_conv, l4_rn, r4, r3, r2, r1) plus the relative
depth map — the exact interface MidasCore exposes to the ZoeDepth head
(zoedepth_v1.py:144-147).

NHWC layout throughout (TPU-native; the reference is NCHW).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    hooks: Sequence[int] = (5, 11, 17, 23)
    use_rel_pos_bias: bool = True       # BEiT-style
    readout: str = "project"            # cls-token handling at reassembly


BEIT_LARGE_384 = ViTConfig()
VIT_TINY_TEST = ViTConfig(
    patch_size=16, embed_dim=64, depth=4, num_heads=2, hooks=(0, 1, 2, 3),
    readout="ignore",
)


class RelPosBias(nn.Module):
    """BEiT relative position bias over a (h, w) token grid (+cls).

    Index convention matches timm's BEiT exactly (required for pretrained
    tables): patch-pair entries fill the (2h-1)(2w-1) grid; the 3 trailing
    table rows are cls->patch (num_rel-3), patch->cls (num_rel-2), and
    cls->cls (num_rel-1).
    """

    num_heads: int

    @nn.compact
    def __call__(self, h: int, w: int):
        num_rel = (2 * h - 1) * (2 * w - 1) + 3
        table = self.param(
            "rel_pos_table", nn.initializers.zeros, (num_rel, self.num_heads)
        )
        coords = jnp.stack(
            jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij"), 0
        ).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]       # (2, N, N)
        rel = rel + jnp.array([[h - 1], [w - 1]])[:, :, None]
        idx = rel[0] * (2 * w - 1) + rel[1]                 # (N, N)
        n = h * w
        full = jnp.zeros((n + 1, n + 1), jnp.int32)
        full = full.at[1:, 1:].set(idx)
        full = full.at[0, :].set(num_rel - 3)               # cls -> patches
        full = full.at[:, 0].set(num_rel - 2)               # patches -> cls
        full = full.at[0, 0].set(num_rel - 1)               # cls -> cls
        return table[full].transpose(2, 0, 1)               # (heads, N+1, N+1)


class Attention(nn.Module):
    dim: int
    num_heads: int
    use_rel_pos_bias: bool

    @nn.compact
    def __call__(self, x, grid_hw):
        B, N, C = x.shape
        head_dim = C // self.num_heads
        qkv = nn.Dense(3 * C, use_bias=True, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, self.num_heads, head_dim)
                            .transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]                      # (B, H, N, hd)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(head_dim)
        if self.use_rel_pos_bias:
            bias = RelPosBias(self.num_heads, name="rel_pos")(*grid_hw)
            attn = attn + bias[None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, name="proj")(out)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    use_rel_pos_bias: bool

    @nn.compact
    def __call__(self, x, grid_hw):
        gamma1 = self.param("gamma1", nn.initializers.ones, (self.dim,))
        gamma2 = self.param("gamma2", nn.initializers.ones, (self.dim,))
        h = Attention(self.dim, self.num_heads, self.use_rel_pos_bias,
                      name="attn")(nn.LayerNorm(name="norm1")(x), grid_hw)
        x = x + gamma1 * h
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(y)
        y = nn.gelu(y, approximate=False)         # timm uses exact-erf GELU
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + gamma2 * y


class ViT(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3), H/W multiples of patch_size.  Returns the hooked
        token sequences [(B, 1 + h*w, C)] (cls included) in hook order."""
        c = self.cfg
        B, H, W, _ = x.shape
        h, w = H // c.patch_size, W // c.patch_size
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size),
                    name="patch_embed")(x)
        x = x.reshape(B, h * w, c.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, c.embed_dim))
        x = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), x], axis=1)

        feats = []
        for i in range(c.depth):
            x = Block(c.embed_dim, c.num_heads, c.mlp_ratio,
                      c.use_rel_pos_bias, name=f"block{i}")(x, (h, w))
            if i in c.hooks:
                feats.append(x)
        return feats


class ProjectReadout(nn.Module):
    """MiDaS 'project' readout: concat each patch token with the cls token
    and project 2C -> C with a GELU (midas ProjectReadout semantics)."""

    dim: int

    @nn.compact
    def __call__(self, tokens):
        cls = tokens[:, :1]
        patches = tokens[:, 1:]
        feat = jnp.concatenate(
            [patches, jnp.broadcast_to(cls, patches.shape)], axis=-1
        )
        return nn.gelu(nn.Dense(self.dim, name="project")(feat),
                       approximate=False)


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(y)
        return x + y


def _resize(x, h, w):
    """Bilinear resize with align_corners=True semantics (NHWC).

    All interpolations in the reference model graph (DPT fusion upsampling,
    attractor/bin-center rescaling, conditioning maps) use torch
    F.interpolate(..., align_corners=True); jax.image.resize implements only
    half-pixel centers, so this hand-rolled gather version is used instead —
    required for pretrained-weight output parity."""
    B, H, W, C = x.shape
    if (H, W) == (h, w):
        return x
    ys = jnp.linspace(0.0, H - 1.0, h) if h > 1 else jnp.zeros((1,))
    xs = jnp.linspace(0.0, W - 1.0, w) if w > 1 else jnp.zeros((1,))
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class FusionBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        x = _resize(x, x.shape[1] * 2, x.shape[2] * 2)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPT(nn.Module):
    """Reassemble hooked ViT features to a pyramid, fuse top-down, emit the
    relative-depth head — the six MidasCore hook tensors included."""

    cfg: ViTConfig
    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        feats = ViT(self.cfg, name="vit")(x)
        ph, pw = H // self.cfg.patch_size, W // self.cfg.patch_size

        # reassemble to strides 4, 8, 16, 32 — the exact op sequence of the
        # MiDaS act_postprocess blocks (readout, 1x1 project, then
        # transposed-conv / identity / strided-conv resampling), so the
        # pretrained DPT weights map one-to-one (models/convert.py)
        layers = []
        for i, (t, ch) in enumerate(zip(feats, self.out_channels)):
            if self.cfg.readout == "project":
                y = ProjectReadout(self.cfg.embed_dim, name=f"readout{i}")(t)
            else:
                y = t[:, 1:]
            y = y.reshape(B, ph, pw, self.cfg.embed_dim)
            y = nn.Conv(ch, (1, 1), name=f"project{i}")(y)
            if i == 0:
                y = nn.ConvTranspose(ch, (4, 4), strides=(4, 4),
                                     name="resample0")(y)
            elif i == 1:
                y = nn.ConvTranspose(ch, (2, 2), strides=(2, 2),
                                     name="resample1")(y)
            elif i == 3:
                y = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                            name="resample3")(y)
            y = nn.Conv(self.features, (3, 3), padding=1,
                        use_bias=False, name=f"layer{i}_rn")(y)
            layers.append(y)
        l1_rn, l2_rn, l3_rn, l4_rn = layers

        r4 = FusionBlock(self.features, name="fusion4")(l4_rn)
        r3 = FusionBlock(self.features, name="fusion3")(r4, l3_rn)
        r2 = FusionBlock(self.features, name="fusion2")(r3, l2_rn)
        r1 = FusionBlock(self.features, name="fusion1")(r2, l1_rn)

        # output head (32-channel activation is the 'out_conv' hook)
        y = nn.Conv(self.features // 2, (3, 3), padding=1, name="head1")(r1)
        y = _resize(y, H, W)
        y = nn.Conv(32, (3, 3), padding=1, name="head2")(y)
        out_conv = nn.relu(y)
        rel = nn.Conv(1, (1, 1), name="head3")(out_conv)
        rel_depth = nn.relu(rel)[..., 0]                    # (B, H, W)

        return rel_depth, (out_conv, l4_rn, r4, r3, r2, r1)
