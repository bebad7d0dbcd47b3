"""Video rendering along preset camera paths (RGB + colorized depth).

Equivalent of LucidDreamer.render_video (luciddreamer.py:221-272) +
utils/depth.py: render every preset view, colorize depth with a
percentile-normalized (2/98) matplotlib colormap, write 60 fps mp4s.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.types import Camera, GaussianParams
from luciddreamer_tpu.render.tiled import render_tiled


def colorize_depth(
    depth: np.ndarray,
    cmap: str = "jet",
    vminp: float = 2.0,
    vmaxp: float = 98.0,
    vmin: Optional[float] = None,
    vmax: Optional[float] = None,
) -> np.ndarray:
    """Percentile-normalized colormap depth image (utils/depth.py:7-62);
    invalid (<= 0) pixels map to the background color black."""
    import matplotlib

    valid = depth > 0
    if vmin is None:
        vmin = float(np.percentile(depth[valid], vminp)) if valid.any() else 0.0
    if vmax is None:
        vmax = float(np.percentile(depth[valid], vmaxp)) if valid.any() else 1.0
    x = np.clip((depth - vmin) / max(vmax - vmin, 1e-8), 0.0, 1.0)
    cm = matplotlib.colormaps[cmap]
    rgba = cm(x, bytes=True)
    rgba[~valid] = 0
    return rgba[..., :3]


def render_frames(
    params: GaussianParams,
    cameras: list[Camera],
    bg: jax.Array,
    active_sh_degree: int = 3,
    backend: str | None = None,
    chunk: int = 128,
    pair_cap: int | None = None,
):
    """Render a camera path; returns (rgb_frames uint8 list, depth float list).
    Depth is negated+masked like the reference (luciddreamer.py:255-259:
    depth = -(depth * (depth > 0)) then globally normalized — we keep the
    positive metric values and normalize in colorize)."""
    backend = backend or (
        "pallas" if jax.default_backend() == "tpu" else "xla"
    )
    f = jax.jit(
        lambda p, c: render_tiled(
            p, c, bg, active_sh_degree=active_sh_degree, chunk=chunk,
            pair_cap=pair_cap, backend=backend,
        )
    )
    rgbs, depths = [], []
    for cam in cameras:
        out = f(params, cam)
        rgb = np.clip(np.asarray(out["render"]), 0.0, 1.0)
        rgbs.append((rgb.transpose(1, 2, 0) * 255).astype(np.uint8))
        depths.append(np.asarray(out["depth"]))
    return rgbs, depths


def write_videos(
    rgbs: list[np.ndarray],
    depths: list[np.ndarray],
    outdir: str,
    name: str,
    fps: int = 60,
    quality: int = 8,
):
    """{name}.mp4 + depth_{name}.mp4 (luciddreamer.py:267-271).

    Falls back to animated GIFs when no mp4 encoder (ffmpeg/pyav) is
    installed, so headless environments still get viewable outputs."""
    import imageio

    os.makedirs(outdir, exist_ok=True)
    alld = np.stack(depths)
    pos = alld[alld > 0]
    vmin = float(np.percentile(pos, 2)) if pos.size else 0.0
    vmax = float(np.percentile(pos, 98)) if pos.size else 1.0
    depth_frames = [colorize_depth(d, vmin=vmin, vmax=vmax) for d in depths]

    def write(base, frames):
        path = os.path.join(outdir, base + ".mp4")
        try:
            imageio.mimwrite(path, frames, fps=fps, quality=quality)
            return path
        except Exception:
            import warnings

            path = os.path.join(outdir, base + ".gif")
            warnings.warn("no mp4 encoder available; writing GIF instead")
            imageio.mimwrite(path, frames, duration=1000.0 / fps, loop=0)
            return path

    rgb_path = write(name, rgbs)
    depth_path = write(f"depth_{name}", depth_frames)
    return rgb_path, depth_path
