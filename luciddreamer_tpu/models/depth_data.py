"""Monodepth data pipeline: augmentations + dataset adapters.

Functional port of the ZoeDepth data machinery the rebuild needs
(ZoeDepth/zoedepth/data/transforms.py random crop/rotate/flip/color aug,
data_mono.py loaders, RepetitiveRoundRobinDataLoader for mixed-dataset
training).  Datasets are plain iterables of (image (H,W,3) [0,1], depth
(H,W) meters) numpy pairs; the adapters read the standard NYU/KITTI folder
layouts when present.
"""
from __future__ import annotations

import itertools
import os
from dataclasses import dataclass

import numpy as np


@dataclass
class AugmentConfig:
    """transforms.py defaults: rotate +-2.5 deg (degree), random crop,
    horizontal flip p=0.5, color jitter gamma/brightness/color."""

    crop_h: int = 416
    crop_w: int = 544
    rotate_deg: float = 2.5
    hflip_p: float = 0.5
    gamma_range: tuple = (0.9, 1.1)
    brightness_range: tuple = (0.9, 1.1)
    color_range: tuple = (0.9, 1.1)


def augment_sample(image, depth, rng: np.random.Generator,
                   cfg: AugmentConfig | None = None):
    """Random rotate -> crop -> flip -> photometric jitter, applied jointly
    to (image, depth) (transforms.py train path)."""
    cfg = cfg or AugmentConfig()
    H, W = depth.shape

    # rotate (nearest for depth, bilinear for image) via scipy
    angle = rng.uniform(-cfg.rotate_deg, cfg.rotate_deg)
    if abs(angle) > 1e-3:
        from scipy.ndimage import rotate as ndrotate

        image = ndrotate(image, angle, axes=(0, 1), reshape=False, order=1,
                         mode="nearest")
        depth = ndrotate(depth, angle, reshape=False, order=0,
                         mode="nearest")

    # random crop
    ch = min(cfg.crop_h, H)
    cw = min(cfg.crop_w, W)
    y0 = rng.integers(0, H - ch + 1)
    x0 = rng.integers(0, W - cw + 1)
    image = image[y0 : y0 + ch, x0 : x0 + cw]
    depth = depth[y0 : y0 + ch, x0 : x0 + cw]

    # horizontal flip
    if rng.random() < cfg.hflip_p:
        image = image[:, ::-1]
        depth = depth[:, ::-1]

    # photometric jitter (image only)
    image = np.clip(image, 1e-4, 1.0) ** rng.uniform(*cfg.gamma_range)
    image = image * rng.uniform(*cfg.brightness_range)
    image = image * rng.uniform(*cfg.color_range, size=(1, 1, 3))
    return np.clip(image, 0.0, 1.0).astype(np.float32), depth.astype(np.float32)


def batched(dataset, batch_size: int, rng: np.random.Generator,
            augment: AugmentConfig | None = None, repeat: bool = True):
    """Yield (image (B,H,W,3), depth (B,H,W)) batches with augmentation."""
    items = list(dataset)
    while True:
        order = rng.permutation(len(items))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            ims, ds = [], []
            for j in order[i : i + batch_size]:
                im, d = items[j]
                if augment is not None:
                    im, d = augment_sample(im, d, rng, augment)
                ims.append(im)
                ds.append(d)
            yield np.stack(ims), np.stack(ds)
        if not repeat:
            return


def round_robin(*loaders):
    """RepetitiveRoundRobinDataLoader (data_mono.py:181-238): alternate
    batches from several dataset loaders, repeating shorter ones."""
    iters = [iter(l) for l in loaders]
    for i in itertools.count():
        yield next(iters[i % len(iters)])


def load_nyu_folder(root: str, split_file: str | None = None,
                    max_items: int | None = None):
    """NYUv2 folder adapter (data_mono.py nyu paths): pairs of
    rgb_*.jpg/png + sync_depth_*.png (depth in millimeters / 1000)."""
    from PIL import Image

    pairs = []
    for dirpath, _dirs, files in os.walk(root):
        for f in sorted(files):
            if f.startswith("rgb_") and f.rsplit(".", 1)[-1] in ("jpg", "png"):
                stem = f.split("rgb_")[1].rsplit(".", 1)[0]
                dpath = os.path.join(dirpath, f"sync_depth_{stem}.png")
                if os.path.exists(dpath):
                    pairs.append((os.path.join(dirpath, f), dpath))
    if max_items:
        pairs = pairs[:max_items]
    for ipath, dpath in pairs:
        img = np.asarray(Image.open(ipath).convert("RGB"), np.float32) / 255.0
        depth = np.asarray(Image.open(dpath), np.float32) / 1000.0
        yield img, depth


def load_kitti_folder(root: str, max_items: int | None = None):
    """KITTI adapter: image_02/data/*.png + proj_depth/groundtruth
    (depth png / 256)."""
    from PIL import Image

    pairs = []
    for dirpath, _dirs, files in os.walk(root):
        if "image_02" not in dirpath:
            continue
        for f in sorted(files):
            if not f.endswith(".png"):
                continue
            d = dirpath.replace("image_02/data",
                                "proj_depth/groundtruth/image_02")
            dpath = os.path.join(d, f)
            if os.path.exists(dpath):
                pairs.append((os.path.join(dirpath, f), dpath))
    if max_items:
        pairs = pairs[:max_items]
    for ipath, dpath in pairs:
        img = np.asarray(Image.open(ipath).convert("RGB"), np.float32) / 255.0
        depth = np.asarray(Image.open(dpath), np.float32) / 256.0
        yield img, depth
