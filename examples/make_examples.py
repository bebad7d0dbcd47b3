"""Generate the checked-in procedural example inputs.

The reference ships ~25 real photo + prompt triples in ``examples/``
(e.g. Image008_waterfall.jpg, .txt, _negative.txt — app_mini.py:33-50).
Those photos cannot be redistributed here, so this script procedurally
synthesizes a deterministic "waterfall" scene with comparable structure
(sky gradient, rock walls, bright fall, textured pool) that exercises the
same pipeline paths: depth-varied content, strong edges for the canny
mask, saturated and dark regions for the inpainting masks.

Run ``python examples/make_examples.py`` to regenerate; outputs are
committed so tests never depend on this script at runtime.
"""
import os

import numpy as np
from PIL import Image

HERE = os.path.dirname(os.path.abspath(__file__))


def waterfall(size: int = 256) -> np.ndarray:
    rng = np.random.default_rng(20240817)
    H = W = size
    y, x = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W),
                       indexing="ij")
    img = np.zeros((H, W, 3), np.float32)

    # sky: vertical blue gradient
    sky = np.stack([0.45 + 0.1 * y, 0.65 + 0.15 * y, 0.9 - 0.1 * y], -1)
    img[:] = sky

    # rock walls left/right with noise texture
    wall = (x < 0.3 + 0.05 * np.sin(9 * y)) | (x > 0.7 + 0.05 * np.cos(7 * y))
    noise = rng.uniform(0.0, 0.15, size=(H, W))
    rock = np.stack([0.35 + noise, 0.28 + noise * 0.8, 0.22 + noise * 0.6],
                    -1)
    img[wall] = rock[wall]

    # the fall: bright vertical band with streaks
    band = (np.abs(x - 0.5) < 0.08 + 0.02 * np.sin(23 * y)) & (y > 0.18)
    streak = 0.85 + 0.15 * np.cos(60 * y + 8 * np.sin(40 * x))[..., None]
    img[band] = (np.array([0.92, 0.95, 1.0]) * streak)[band]

    # pool at the bottom with ripples
    pool = y > 0.8
    ripple = 0.05 * np.sin(40 * x + 15 * y)
    water = np.stack(
        [0.25 + ripple, 0.45 + ripple, 0.6 + ripple], -1
    )
    img[pool] = water[pool]

    # mist: blend near the fall base
    mist = np.exp(-((y - 0.8) ** 2) / 0.004) * np.exp(
        -((x - 0.5) ** 2) / 0.02
    )
    img = img * (1 - 0.5 * mist[..., None]) + 0.5 * mist[..., None]
    return np.clip(img, 0.0, 1.0)


def main():
    img = waterfall()
    Image.fromarray((img * 255).astype(np.uint8)).save(
        os.path.join(HERE, "waterfall.png")
    )
    with open(os.path.join(HERE, "waterfall.txt"), "w") as f:
        f.write(
            "A tall waterfall cascading over mossy rocks into a clear "
            "pool, mist rising, realistic and intricate details, highly "
            "detailed outdoor photo.\n"
        )
    with open(os.path.join(HERE, "waterfall_negative.txt"), "w") as f:
        f.write(
            "text, watermark, blurry, lowres, deformed, cartoon, "
            "oversaturated\n"
        )
    print("wrote", os.path.join(HERE, "waterfall.png"))


if __name__ == "__main__":
    main()
