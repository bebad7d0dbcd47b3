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




# ---------------------------------------------------------------------------
# Reference example prompt set (examples/*.txt, app_mini.py:190-236).  The
# prompt/negative-prompt TEXTS are the reference's example inputs verbatim
# (configuration data); the photos they pair with cannot be redistributed,
# so synth_scene() below generates a deterministic procedural stand-in image
# per stem with comparable structure (ground plane, sky gradient, blocky
# masses, texture noise) to exercise the same pipeline paths.
# ---------------------------------------------------------------------------

PROMPTS = {
    'Image002_modernvilla':
        'ultra-modern mega villa by the sea with swimming pool and green space with beautiful open space and tropical paradise green space and guest annex, bright and sunny weather',
    'Image002_modernvilla_negative':
        'trees, front objects, (worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale), (worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale)',
    'Image003_fantasy':
        'A vibrant, colorful floating community city, clouds above a beautiful, enchanted landscape filled with whimsical flora, enchanted forest landscape, Magical and dreamy woodland with vibrant green foliage and sparkling flowers, Landscape with twisted trees and vines, natural lighting and dark shadows, unique fantastical elements like floating islands and floating orbs, Highly detailed vegetation and foliage, deep contrast and color vibrancy, texture and intricate details in a floating element',
    'Image003_fantasy_negative':
        '(worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale), (worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale)',
    'Image005_fruitmarket':
        '4k, best quality, grocery store with big brick roads and wooden hard rooftop',
    'Image005_fruitmarket_negative':
        'photo frame, frame, boarder, simple color, (worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale), (worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale)',
    'Image008_waterfall':
        'A dense forest with hardwood trees on the stones. a lake is surrounded by wet stones and pebbles. realistic and intricate details, highly detailed outdoor photo.',
    'Image009_spacestation':
        'inside the space station, space control machines with many electric lines, 4k, best quality',
    'Image009_spacestation_negative':
        'astronaut, people, scientist, person, photo frame, frame, boarder, simple color, (worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale), (worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale)',
    'Image011_lego':
        '(Brick studs in a certain pattern:3), (best lego man face:1.4), best quality, lego city with lego shops, lego road with street lamp, cars and lego mans on the street, lego trees and lake at a park',
    'Image011_lego_negative':
        'shining effect, shining light, (worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale), (worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale)',
    'Image012_whitecat':
        'a cat sitting on the street, white house with white stairs, trees near the house, gray blocks on the street,',
    'Image012_whitecat_2nd':
        'A number of flower buckets, small bushes and many pebbles on the ground',
    'Image012_whitecat_negative':
        'shining effect, shining light, (worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale), (worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale)',
    'Image014_animestreet':
        'best quality, 4k, anime-style, anime, manga style, a long anime-style road with anime-blocks and little anime-grass, anime-houses and anime-tree on the side of the anime-style road, wide anime-style bright blue sky, shiny and beautiful day, bright scene',
    'Image014_animestreet_negative':
        'defocus, blurry, shadow, character, person, people, photo frame, frame, boarder, simple color, dark sky, dark scene, (worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale), (worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale)',
    'Image015_animelakehouse':
        'anime style, animation, best quality, a boat on lake, trees and rocks near the lake. a house and port in front of a house',
    'Image015_animelakehouse_negative':
        '(worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale), (worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale)',
    'Image018_animesummerhome':
        'Anime-style, Japanese-style anime house overlooking the anime sea with anime tatami mats, anime curtains blowing in the wind, anme clouds visible in the anime sky, anime livingroom with anime flowers',
    'Image018_animesummerhome_negative':
        'photo frame, frame, boarder, simple color, (worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale), (worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale)',
    'Image031_fruit':
        '4k, best quality, grocery store with block tiles, wooden hard rooftop, various fruits upon the wooden tables, artificial trees on the tables.',
    'Image031_fruit_negative':
        'photo frame, frame, boarder, simple color, (worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale), (worst quality:2), (low quality:2), (normal quality:2), lowres, bad anatomy, bad hands, normal quality, ((monochrome)), ((grayscale)',
    'cabin':
        "Magician's magical cabin alone in a serene forest",
    'christmas':
        'Cozy livingroom in christmas',
    'doge':
        'a cozy livingroom',
    'elf':
        'serene deep forest',
    'girl':
        'dark messy room, noir style, indoors, bottle, shoe soles, jacket, cup, window, blurry, black footwear, depth of field, box, couch, table, gun, chair, foreshortening',
    'image020':
        'High-resolution photography kitchen design, wooden floor, small windows opening onto the garden, Bauhaus furniture and decoration, high ceiling, beige blue salmon pastel palette, interior design magazine, cozy atmosphere; 8k, intricate detail, photorealistic, realistic light, wide angle, kinfolk photography, A+D architecture, Kitchen Sink, Basket of fruits and vegetables, a bottle of drinking water, walls painted magazine style photo, looking towards a sink under a window, with a door on the left of the sink with a 25 cm distance from the kitchen, the kitchen is an L shaped starting from the right corner, on the far right a fridge nest to it a stove, next the dishwasher then the sink, a smokey grey kitchen with modern touches, taupe walls, a taup ceiling with spotlights inside the ceiling with 90 cm distance, wooden parquet floor',
    'island':
        'Tiny island of wonder',
    'ruin':
        'Postapocalyptic city in desert',
}


def synth_scene(seed: int, size: int = 256) -> np.ndarray:
    """Deterministic procedural scene, distinct per seed: sky gradient,
    ground plane, 6-10 colored blocky masses with depth-ordered occlusion,
    and texture noise (strong edges for canny, varied depth for lifting)."""
    rng = np.random.default_rng(seed)
    H = W = size
    y, x = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W),
                       indexing="ij")
    sky_top = rng.uniform(0.3, 0.9, 3)
    sky_bot = rng.uniform(0.3, 0.9, 3)
    img = sky_top * (1 - y[..., None]) + sky_bot * y[..., None]

    horizon = rng.uniform(0.55, 0.75)
    ground = y > horizon
    g_col = rng.uniform(0.15, 0.6, 3)
    shade = (1.0 - 0.4 * (y - horizon))[..., None]
    img = np.where(ground[..., None], g_col * shade, img)

    for _ in range(rng.integers(6, 11)):
        cx, w = rng.uniform(0.05, 0.95), rng.uniform(0.08, 0.3)
        top = rng.uniform(0.2, horizon)
        col = rng.uniform(0.1, 0.95, 3)
        block = (np.abs(x - cx) < w / 2) & (y > top) & (y < horizon + 0.15)
        tex = 1.0 + 0.15 * np.sin(rng.uniform(10, 60) * y
                                  + rng.uniform(0, 6) * x)
        img = np.where(block[..., None], col * tex[..., None], img)

    img += rng.uniform(-0.03, 0.03, size=(H, W, 1))
    return np.clip(img, 0.0, 1.0)


def write_reference_examples():
    """One procedural .png per prompt stem + the reference prompt texts."""
    stems = sorted({k.replace("_negative", "") for k in PROMPTS})
    for i, stem in enumerate(stems):
        img = synth_scene(1000 + i)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(HERE, stem + ".png")
        )
        for key, suffix in ((stem, ".txt"), (stem + "_negative",
                                             "_negative.txt")):
            if key in PROMPTS:
                with open(os.path.join(HERE, stem + suffix), "w") as f:
                    f.write(PROMPTS[key] + "\n")
    print(f"wrote {len(stems)} procedural example triples")


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
    write_reference_examples()


if __name__ == "__main__":
    main()
