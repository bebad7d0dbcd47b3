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

import os
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


def get_inpainter(name: str = "classic", model: str | None = None) -> Inpainter:
    """Build a registered inpainter; ``model`` optionally selects the SD
    checkpoint (HF repo id or local diffusers dir) for backends that take
    one — the role of the reference's ``--model_name`` / ``load_model``
    checkpoint swap (run.py:17, luciddreamer.py:81-111)."""
    if name == "sd" and "sd" not in _INPAINTERS:
        _register_sd()
    if name == "lama" and "lama" not in _INPAINTERS:
        _register_lama()
    if name == "sd_controlnet" and "sd_controlnet" not in _INPAINTERS:
        _register_sd_controlnet()
    factory = _INPAINTERS[name]
    if model is not None:
        import inspect

        try:
            takes_model = "model" in inspect.signature(factory).parameters
        except (TypeError, ValueError):
            takes_model = False
        if not takes_model:
            raise ValueError(
                f"inpainter {name!r} does not accept a checkpoint; "
                "use 'sd' or 'sd_controlnet' (or a factory with a "
                "'model' parameter) with --model_name"
            )
        return factory(model=model)
    return factory()


def resolve_sd_checkpoint(model_name: str | None,
                          out_root: str = "./stablediffusion") -> str | None:
    """Normalize an SD checkpoint argument (reference run.py:53-63).

    ``.safetensors`` files are converted once into a diffusers directory
    under ``out_root`` (via ``from_single_file``) and the directory path is
    returned; anything else (HF repo id / local diffusers dir / None)
    passes through unchanged.
    """
    if model_name is None or not model_name.endswith("safetensors"):
        return model_name
    out_dir = os.path.join(
        out_root, os.path.splitext(os.path.basename(model_name))[0]
    )
    if not os.path.exists(os.path.join(out_dir, "model_index.json")):
        from diffusers import StableDiffusionInpaintPipeline  # gated

        pipe = StableDiffusionInpaintPipeline.from_single_file(model_name)
        pipe.save_pretrained(out_dir)
    return out_dir


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


LAMA_URL = "https://github.com/Sanster/models/releases/download/add_big_lama/big-lama.pt"
LAMA_MD5 = "e3aa4aaa15225a33ec84f9f4bc47e500"


def _register_lama():
    """LaMa TorchScript adapter (reference utils/lama.py:13-18,137-188):
    checksummed big-lama.pt fetch, pad-to-mod-8, composite by mask."""
    import torch

    from luciddreamer_tpu.utils.download import fetch_checked

    class LamaInpainter:
        def __init__(self, cache_dir: str = "~/.cache/luciddreamer_tpu"):
            path = os.path.join(os.path.expanduser(cache_dir), "big-lama.pt")
            fetch_checked(LAMA_URL, path, md5=LAMA_MD5)
            self.model = torch.jit.load(path, map_location="cpu").eval()

        def __call__(self, image, mask, prompt="", negative_prompt="",
                     steps=30, rng=None):
            img = np.asarray(image, np.float32)
            m = (np.asarray(mask, np.float32) > 0.5).astype(np.float32)
            h, w = img.shape[:2]
            ph, pw = (8 - h % 8) % 8, (8 - w % 8) % 8   # mod-8 pad (lama.py:152-162)
            imgp = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="reflect")
            mp = np.pad(m, ((0, ph), (0, pw)), mode="reflect")
            ti = torch.from_numpy(imgp.transpose(2, 0, 1))[None]
            tm = torch.from_numpy(mp)[None, None]
            with torch.no_grad():
                out = self.model(ti, tm)[0].numpy().transpose(1, 2, 0)
            out = out[:h, :w]
            # composite: keep known pixels (lama.py:180-186)
            res = img * (1 - m[..., None]) + out * m[..., None]
            return jnp.asarray(np.clip(res, 0.0, 1.0), jnp.float32)

    register_inpainter("lama", LamaInpainter)


def _register_sd_controlnet():
    """ControlNet-inpaint + LaMa path (reference luciddreamer.py:96-154):
    pad the hole mask by 3 px, LaMa-fill for the init image, then SD
    ControlNet inpainting conditioned on the masked(-1) image, strength 0.9."""
    import torch
    from diffusers import (
        ControlNetModel,
        StableDiffusionControlNetInpaintPipeline,
    )

    from luciddreamer_tpu.dream.maskops import pad_mask

    class ControlNetInpainter:
        def __init__(self, model="runwayml/stable-diffusion-inpainting",
                     controlnet="lllyasviel/control_v11p_sd15_inpaint",
                     use_lama: bool = True):
            cn = ControlNetModel.from_pretrained(controlnet)
            self.pipe = StableDiffusionControlNetInpaintPipeline.from_pretrained(
                model, controlnet=cn, safety_checker=None,
            )
            self.lama = None
            if use_lama:
                _register_lama()
                self.lama = _INPAINTERS["lama"]()

        def __call__(self, image, mask, prompt="", negative_prompt="",
                     steps=30, rng=None):
            from PIL import Image as PILImage

            img = np.asarray(image, np.float32)
            m = np.asarray(mask, np.float32)
            # holes = explicit mask OR all-black pixels (luciddreamer.py:137)
            mask_sum = np.clip((img.prod(axis=-1) == 0) + m, 0, 1)
            mask_padded = np.asarray(pad_mask(mask_sum, 3)).astype(np.float32)
            if self.lama is not None:
                masked = img * (1.0 - mask_padded[..., None])
                init = np.asarray(self.lama(masked, mask_padded))
            else:
                init = img
            # ControlNet inpaint condition: masked pixels at -1
            cond = init.copy()
            cond[mask_padded > 0.5] = -1.0
            control = torch.from_numpy(
                cond.transpose(2, 0, 1)[None].astype(np.float32)
            )
            seed = (int(jax.random.randint(rng, (), 0, 2**31 - 1))
                    if rng is not None else 0)
            gen = torch.Generator().manual_seed(seed)
            out = self.pipe(
                prompt=prompt,
                negative_prompt=negative_prompt,
                image=PILImage.fromarray(
                    np.round(init * 255).astype(np.uint8)),
                mask_image=PILImage.fromarray(
                    (mask_padded * 255).astype(np.uint8)),
                control_image=control,
                strength=0.9,
                num_inference_steps=steps,
                generator=gen,
                height=img.shape[0],
                width=img.shape[1],
            ).images[0]
            return jnp.asarray(np.asarray(out), jnp.float32) / 255.0

    register_inpainter("sd_controlnet", ControlNetInpainter)


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
