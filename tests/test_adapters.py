"""Generative-model adapter plumbing, exercised with fakes (no network, no
diffusers): SD inpaint kwargs, LaMa mod-8 padding + compositing, ControlNet
mask padding / -1 conditioning / LaMa init chaining.

Mirrors the reference wiring these adapters port: luciddreamer.py:73-74,
96-154 and utils/lama.py:137-188."""
import sys
import types

import numpy as np
import pytest
from PIL import Image as PILImage

import luciddreamer_tpu.dream.protocols as protocols


class _FakePipeResult:
    def __init__(self, img):
        self.images = [img]


class _FakeSDPipe:
    calls = []

    @classmethod
    def from_pretrained(cls, model, **kw):
        inst = cls()
        inst.model = model
        return inst

    def __call__(self, **kw):
        type(self).calls.append(kw)
        w, h = kw["image"].size
        return _FakePipeResult(
            PILImage.fromarray(np.full((h, w, 3), 128, np.uint8))
        )


class _FakeControlNetPipe(_FakeSDPipe):
    calls = []

    @classmethod
    def from_pretrained(cls, model, controlnet=None, **kw):
        inst = cls()
        inst.model = model
        inst.controlnet = controlnet
        return inst


def _install_fake_diffusers(monkeypatch):
    mod = types.ModuleType("diffusers")
    mod.StableDiffusionInpaintPipeline = _FakeSDPipe
    mod.StableDiffusionControlNetInpaintPipeline = _FakeControlNetPipe
    mod.ControlNetModel = types.SimpleNamespace(
        from_pretrained=lambda name, **kw: {"name": name}
    )
    monkeypatch.setitem(sys.modules, "diffusers", mod)


def test_sd_adapter_plumbing(monkeypatch, rng):
    _install_fake_diffusers(monkeypatch)
    protocols._INPAINTERS.pop("sd", None)
    _FakeSDPipe.calls.clear()

    inp = protocols.get_inpainter("sd")
    img = rng.uniform(size=(32, 40, 3)).astype(np.float32)
    mask = np.zeros((32, 40), np.float32)
    mask[8:16, 8:16] = 1.0
    out = np.asarray(inp(img, mask, prompt="a cat", negative_prompt="bad",
                         steps=7))

    assert out.shape == (32, 40, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0
    (kw,) = _FakeSDPipe.calls
    assert kw["prompt"] == "a cat"
    assert kw["negative_prompt"] == "bad"
    assert kw["num_inference_steps"] == 7
    assert kw["image"].size == (40, 32)          # PIL (W, H)
    m = np.asarray(kw["mask_image"])
    assert m[12, 12] == 255 and m[0, 0] == 0


def test_sd_checkpoint_swap(monkeypatch, rng):
    """--model_name surface: a custom SD checkpoint reaches the diffusers
    from_pretrained call (reference run.py:17, luciddreamer.py:81-111)."""
    _install_fake_diffusers(monkeypatch)
    protocols._INPAINTERS.pop("sd", None)

    inp = protocols.get_inpainter("sd", model="someone/custom-inpaint")
    assert inp.pipe.model == "someone/custom-inpaint"

    # backends without a checkpoint parameter refuse one loudly
    protocols.register_inpainter("nockpt", lambda: protocols.ClassicInpainter())
    with pytest.raises(ValueError, match="does not accept a checkpoint"):
        protocols.get_inpainter("nockpt", model="x")


def test_resolve_sd_checkpoint(monkeypatch, tmp_path):
    """safetensors -> diffusers conversion (reference run.py:53-63):
    converted once into out_root, passthrough for ids/dirs/None."""
    calls = []

    class _FakeSingleFile:
        @classmethod
        def from_single_file(cls, path, **kw):
            calls.append(path)
            inst = cls()
            return inst

        def save_pretrained(self, out_dir, **kw):
            import os

            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, "model_index.json"), "w") as f:
                f.write("{}")

    mod = types.ModuleType("diffusers")
    mod.StableDiffusionInpaintPipeline = _FakeSingleFile
    monkeypatch.setitem(sys.modules, "diffusers", mod)

    assert protocols.resolve_sd_checkpoint(None) is None
    assert protocols.resolve_sd_checkpoint("org/repo") == "org/repo"

    ckpt = tmp_path / "myModel.safetensors"
    ckpt.write_bytes(b"fake")
    out = protocols.resolve_sd_checkpoint(str(ckpt),
                                          out_root=str(tmp_path / "sd"))
    assert out == str(tmp_path / "sd" / "myModel")
    assert calls == [str(ckpt)]
    # second resolve reuses the converted dir without re-converting
    out2 = protocols.resolve_sd_checkpoint(str(ckpt),
                                           out_root=str(tmp_path / "sd"))
    assert out2 == out and calls == [str(ckpt)]


def test_cli_model_name_flag():
    from luciddreamer_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["--image", "x.png", "--model_name", "org/repo"]
    )
    assert args.model_name == "org/repo"


def test_lama_adapter_padding_and_composite(monkeypatch, rng):
    torch = pytest.importorskip("torch")

    received = {}

    class _FakeLama:
        def eval(self):
            return self

        def __call__(self, ti, tm):
            received["img_shape"] = tuple(ti.shape)
            received["mask_shape"] = tuple(tm.shape)
            return torch.full_like(ti, 0.25)[0][None][0][None]

    monkeypatch.setattr(torch.jit, "load",
                        lambda path, map_location=None: _FakeLama())
    import luciddreamer_tpu.utils.download as dl

    monkeypatch.setattr(dl, "fetch_checked",
                        lambda url, path, md5=None: path)
    protocols._INPAINTERS.pop("lama", None)

    inp = protocols.get_inpainter("lama")
    img = rng.uniform(0.4, 0.6, size=(30, 41, 3)).astype(np.float32)
    mask = np.zeros((30, 41), np.float32)
    mask[5:10, 5:10] = 1.0
    out = np.asarray(inp(img, mask))

    # mod-8 padding: 30 -> 32, 41 -> 48 (utils/lama.py:152-162)
    assert received["img_shape"] == (1, 3, 32, 48)
    assert received["mask_shape"] == (1, 1, 32, 48)
    # composite keeps known pixels exactly, fills holes from the model
    np.testing.assert_allclose(out[0, 0], img[0, 0], atol=1e-6)
    np.testing.assert_allclose(out[7, 7], 0.25, atol=1e-6)


def test_controlnet_adapter_mask_and_condition(monkeypatch, rng):
    torch = pytest.importorskip("torch")
    _install_fake_diffusers(monkeypatch)
    _FakeControlNetPipe.calls.clear()
    protocols._INPAINTERS.pop("sd_controlnet", None)

    # fake LaMa fills holes with 0.5 so the init image is detectable
    class _FakeLamaInpainter:
        def __call__(self, image, mask, **kw):
            img = np.asarray(image, np.float32).copy()
            img[np.asarray(mask) > 0.5] = 0.5
            return img

    monkeypatch.setattr(protocols, "_register_lama", lambda: None)
    monkeypatch.setitem(protocols._INPAINTERS, "lama",
                        lambda: _FakeLamaInpainter())

    inp = protocols.get_inpainter("sd_controlnet")
    img = rng.uniform(0.3, 0.9, size=(24, 24, 3)).astype(np.float32)
    mask = np.zeros((24, 24), np.float32)
    mask[10:14, 10:14] = 1.0
    # an all-black pixel becomes a hole too (luciddreamer.py:137)
    img[2, 2] = 0.0
    out = np.asarray(inp(img, mask, prompt="p", steps=4))

    assert out.shape == (24, 24, 3)
    (kw,) = _FakeControlNetPipe.calls
    assert kw["strength"] == 0.9
    assert kw["num_inference_steps"] == 4
    # the mask was padded by 3 px (luciddreamer.py:51-55 pad_mask conv)
    m = np.asarray(kw["mask_image"]) / 255.0
    assert m[12, 12] == 1.0 and m[7, 12] == 1.0      # 10-3 = 7 inside pad
    assert m[3, 12] == 0.0
    # control condition: -1 at padded holes, init colors elsewhere
    cond = kw["control_image"].numpy()[0]            # (3, H, W)
    assert (cond[:, 12, 12] == -1.0).all()
    assert (cond[:, 2, 2] == -1.0).all()             # black pixel hole
    # init image fed to the pipe came from the (fake) LaMa fill
    init = np.asarray(kw["image"]) / 255.0
    np.testing.assert_allclose(init[12, 12], 0.5, atol=1 / 255.0)
    np.testing.assert_allclose(init[20, 20], img[20, 20], atol=1 / 255.0)


def test_canny_port(rng):
    from luciddreamer_tpu.train.losses import image2canny

    img = np.zeros((32, 32, 3), np.float32)
    img[8:24, 8:24] = 1.0                             # white square
    edge = image2canny(img, 50, 150)
    assert edge.shape == (32, 32)
    # edges at the square border, none deep inside or far outside
    assert edge[8, 16] == 1.0 or edge[7, 16] == 1.0
    assert edge[16, 16] == 0.0
    assert edge[0, 0] == 0.0
    inv = image2canny(img, 50, 150, isEdge1=False)
    np.testing.assert_allclose(inv, 1.0 - edge)

    # hysteresis: weak edges connected to strong survive, isolated don't
    g = np.linspace(0, 1, 32)[None, :].repeat(32, 0)
    grad_img = np.stack([g, g, g], -1).astype(np.float32)
    e2 = image2canny(grad_img, 50, 150)
    assert e2.sum() == 0.0                            # smooth ramp: no edges


def test_trainview_canny_mask(rng):
    from luciddreamer_tpu.scene.scene import TrainView
    from tests.helpers import make_test_camera

    img = np.zeros((3, 16, 16), np.float32)
    img[:, :, 8:] = 1.0
    v = TrainView(camera=make_test_camera(16, 16), image=img)
    m = v.canny_mask
    assert m.shape == (16, 16)
    # isEdge1=False -> mask is 0 AT edges, 1 elsewhere
    assert m[8, 8] == 0.0 or m[8, 7] == 0.0
    assert m[8, 2] == 1.0
    assert v.canny_mask is m                          # cached
