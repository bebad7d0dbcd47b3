"""Pluggable generative-model interfaces for the dreaming loop.

The reference hardwires three external models: a Stable Diffusion inpainting
pipeline (luciddreamer.py:73-74,113-154), ZoeDepth metric monodepth
(luciddreamer.py:76,156-157), and optionally LaMa + ControlNet
(luciddreamer.py:81-111).  Here they sit behind two small protocols so the
geometry stack has no torch dependency and the pipeline runs end-to-end
without network access:

* ``Inpainter``      — (image (H,W,3) in [0,1], mask (H,W) 1=hole, prompt,
                       negative_prompt, steps, rng) -> image
* ``DepthEstimator`` — (image (H,W,3) in [0,1]) -> metric depth (H,W)

Defaults are pure-JAX, weight-free stand-ins (ClassicInpainter /
RadialDepth) good enough to exercise the whole geometry pipeline; adapters
for real checkpoints (HF diffusers-style SD inpainting via torch,
transformers ZoeDepth, our flax ZoeDepth port) register lazily and are used
when their dependencies and weights are available.
"""
from __future__ import annotations

from typing import Callable, Optional, Protocol

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.dream.warp import max_filter, splat_linear


class Inpainter(Protocol):
    def __call__(self, image, mask, prompt: str = "",
                 negative_prompt: str = "", steps: int = 30,
                 rng: Optional[jax.Array] = None):
        ...


class DepthEstimator(Protocol):
    def __call__(self, image):
        ...


class ClassicInpainter:
    """Weight-free diffusion-style hole filling: iterative masked neighbor
    averaging with per-step noise annealing.  Capability stand-in for the
    SD/LaMa inpainters — fills holes smoothly and plausibly from boundary
    colors (no semantic hallucination, by construction)."""

    def __init__(self, noise_scale: float = 0.02):
        self.noise_scale = noise_scale
        self._fill = jax.jit(self._fill_impl, static_argnames=("steps",))

    def _fill_impl(self, image, mask, key, steps: int):
        H, W, _ = image.shape
        hole = mask > 0.5

        def body(state, k):
            img = state
            blur = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
            neigh = (
                blur[:-2, 1:-1] + blur[2:, 1:-1]
                + blur[1:-1, :-2] + blur[1:-1, 2:]
                + blur[:-2, :-2] + blur[:-2, 2:]
                + blur[2:, :-2] + blur[2:, 2:]
            ) / 8.0
            noise = jax.random.normal(k, img.shape) * self.noise_scale
            fill = jnp.clip(neigh + noise, 0.0, 1.0)
            return jnp.where(hole[..., None], fill, img), None

        keys = jax.random.split(key, steps)
        # seed holes with the image mean so the diffusion starts plausibly
        mean = jnp.sum(image * (1 - mask)[..., None], (0, 1)) / jnp.maximum(
            jnp.sum(1 - mask), 1.0
        )
        img0 = jnp.where(hole[..., None], mean[None, None, :], image)
        out, _ = jax.lax.scan(body, img0, keys)
        return out

    def __call__(self, image, mask, prompt: str = "",
                 negative_prompt: str = "", steps: int = 30,
                 rng: Optional[jax.Array] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        steps = max(int(steps), 1) * 8     # neighbor-fill needs more passes
        return self._fill(jnp.asarray(image, jnp.float32),
                          jnp.asarray(mask, jnp.float32), rng, steps)


class RadialDepth:
    """Weight-free monodepth stand-in: brightness-modulated radial depth
    field (darker/peripheral pixels farther).  Produces smooth, positive
    metric-scale depth so the unproject -> warp -> lift geometry runs."""

    def __init__(self, base: float = 2.0, amplitude: float = 1.0):
        self.base = base
        self.amplitude = amplitude
        self._f = jax.jit(self._impl)

    def _impl(self, image):
        H, W, _ = image.shape
        lum = jnp.mean(image, axis=-1)
        y, x = jnp.meshgrid(jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, W),
                            indexing="ij")
        r = jnp.sqrt(x * x + y * y)
        depth = self.base + self.amplitude * (0.5 * r + 0.5 * (1.0 - lum))
        # light smoothing
        p = jnp.pad(depth, ((1, 1), (1, 1)), mode="edge")
        depth = (
            p[1:-1, 1:-1] * 4 + p[:-2, 1:-1] + p[2:, 1:-1]
            + p[1:-1, :-2] + p[1:-1, 2:]
        ) / 8.0
        return depth

    def __call__(self, image):
        return self._f(jnp.asarray(image, jnp.float32))


# ---------------------------------------------------------------------------
# registries + gated adapters for real models
# ---------------------------------------------------------------------------

_INPAINTERS: dict[str, Callable[[], Inpainter]] = {
    "classic": lambda: ClassicInpainter(),
}
_DEPTH: dict[str, Callable[[], DepthEstimator]] = {
    "radial": lambda: RadialDepth(),
}


def register_inpainter(name: str, factory):
    _INPAINTERS[name] = factory


def register_depth_estimator(name: str, factory):
    _DEPTH[name] = factory


def get_inpainter(name: str = "classic") -> Inpainter:
    if name == "sd" and "sd" not in _INPAINTERS:
        _register_sd()
    return _INPAINTERS[name]()


def get_depth_estimator(name: str = "radial") -> DepthEstimator:
    if name == "zoedepth" and "zoedepth" not in _DEPTH:
        _register_zoedepth()
    if name == "zoedepth_flax" and "zoedepth_flax" not in _DEPTH:
        from luciddreamer_tpu.models.zoedepth import FlaxZoeDepthEstimator

        _DEPTH["zoedepth_flax"] = lambda: FlaxZoeDepthEstimator()
    return _DEPTH[name]()


def _register_sd():
    """HF diffusers SD-inpaint adapter (reference luciddreamer.py:73-74).
    Requires diffusers + checkpoint access; raises ImportError otherwise."""
    import torch  # noqa: F401  (env check)
    from diffusers import StableDiffusionInpaintPipeline  # may raise

    class SDInpainter:
        def __init__(self, model="runwayml/stable-diffusion-inpainting"):
            self.pipe = StableDiffusionInpaintPipeline.from_pretrained(model)

        def __call__(self, image, mask, prompt="", negative_prompt="",
                     steps=30, rng=None):
            from PIL import Image as PILImage

            seed = int(jax.random.randint(rng, (), 0, 2**31 - 1)) if rng is not None else 0
            import torch

            gen = torch.Generator().manual_seed(seed)
            img = PILImage.fromarray(
                (np.asarray(image) * 255).astype(np.uint8)
            )
            m = PILImage.fromarray((np.asarray(mask) * 255).astype(np.uint8))
            out = self.pipe(
                prompt=prompt, image=img, mask_image=m,
                negative_prompt=negative_prompt,
                num_inference_steps=steps, generator=gen,
            ).images[0]
            return jnp.asarray(np.asarray(out), jnp.float32) / 255.0

    register_inpainter("sd", SDInpainter)


def _register_zoedepth():
    """transformers ZoeDepth adapter (reference vendored tree's capability:
    ZoeD_N metric depth, ZoeDepth/hubconf.py:66)."""
    from transformers import pipeline as hf_pipeline  # may raise

    class HFZoeDepth:
        def __init__(self, model="Intel/zoedepth-nyu"):
            self.pipe = hf_pipeline("depth-estimation", model=model)

        def __call__(self, image):
            from PIL import Image as PILImage

            img = PILImage.fromarray(
                (np.asarray(image) * 255).astype(np.uint8)
            )
            out = self.pipe(img)["predicted_depth"]
            d = np.asarray(out.squeeze().cpu())
            if d.shape != image.shape[:2]:
                import cv2

                d = cv2.resize(d, (image.shape[1], image.shape[0]))
            return jnp.asarray(d, jnp.float32)

    register_depth_estimator("zoedepth", HFZoeDepth)
