"""Input-corruption injectors (the paper's data-level fault injection).

Ports of reference src/data_utils.py:21-282: time-series noise (gaussian /
random drop / structured drop) and the 10 PIL visual corruptions, with the
same defaults and application order, plus the ``periodic`` injector rebuilt
to its intended semantics over synthesized patterns (the reference's own
copy is unrunnable — see :func:`periodic`).  Host-side numpy/PIL — these
run in the input pipeline, never on device.
"""

from __future__ import annotations

from typing import List

import numpy as np

# ---------------------------------------------------------------- timeseries


def add_timeseries_noise(tests, noise_level=0.3, gaussian_noise=True,
                         rand_drop=True, struct_drop=True,
                         rng: np.random.Generator | None = None):
    """(reference data_utils.py:21-38; mutates like the reference)"""
    rng = rng or np.random.default_rng()
    robust = tests
    if gaussian_noise:
        robust = white_noise(robust, noise_level, rng)
    if rand_drop:
        robust = random_drop(robust, noise_level, rng)
    if struct_drop:
        robust = structured_drop(robust, noise_level, rng)
    return robust


def white_noise(data, p, rng: np.random.Generator | None = None):
    """Zero-mean gaussian(std p) added per time step — note the reference
    adds ONE scalar draw per timestep (broadcast over features),
    data_utils.py:40-49; replicated."""
    rng = rng or np.random.default_rng()
    for i in range(len(data)):
        for t in range(len(data[i])):
            data[i][t] += rng.normal(0, p)
    return data


def random_drop(data, p, rng: np.random.Generator | None = None):
    """Drop each feature entry independently w.p. p (data_utils.py:51-76)."""
    rng = rng or np.random.default_rng()

    def helper(x, level):
        if level == 2:
            for i in range(len(x)):
                if rng.random() < p:
                    x[i] = 0
            return x
        for i in range(len(x)):
            x[i] = helper(x[i], level - 1)
        return x

    for i in range(len(data)):
        data[i] = helper(data[i], len(np.array(data).shape))
    return data


def structured_drop(data, p, rng: np.random.Generator | None = None):
    """Drop whole timesteps w.p. p (data_utils.py:78-88)."""
    rng = rng or np.random.default_rng()
    for i in range(len(data)):
        for t in range(len(data[i])):
            if rng.random() < p:
                data[i][t] = np.zeros(np.shape(data[i][t]))
    return data


# ------------------------------------------------------------------- visual


def add_visual_noise(tests, noise_level=0.3, gray=True, contrast=True,
                     inv=True, temp=True, color=True, s_and_p=True, gaus=True,
                     rot=True, flip=True, crop=True,
                     rng: np.random.Generator | None = None) -> List[np.ndarray]:
    """10 randomly-applied PIL corruptions in the reference's order
    (data_utils.py:90-135)."""
    from PIL import Image

    rng = rng or np.random.default_rng()
    noises = []
    if gray:
        noises.append(_grayscale)
    if contrast:
        noises.append(_low_contrast)
    if inv:
        noises.append(_inversion)
    if temp:
        noises.append(_wb)
    if color:
        noises.append(_colorize)
    if s_and_p:
        noises.append(_salt_and_pepper)
    if gaus:
        noises.append(_gaussian)
    if rot:
        noises.append(_rotate)
    if flip:
        noises.append(_horizontal_flip)
    if crop:
        noises.append(_random_crop)
    out = []
    for arr in tests:
        img = Image.fromarray(arr)
        mode = img.mode
        img = img.convert("RGB")
        for fn in noises:
            img = fn(img, noise_level, rng)
        img = img.convert(mode)
        out.append(np.array(img))
    return out


def _grayscale(img, p, rng):
    from PIL import ImageOps

    return ImageOps.grayscale(img) if rng.random() <= p else img


def _low_contrast(img, p, rng):
    from PIL import ImageEnhance

    return ImageEnhance.Contrast(img).enhance(0.5) if rng.random() <= p else img


def _inversion(img, p, rng):
    from PIL import ImageOps

    return ImageOps.invert(img) if rng.random() <= p else img


_KELVIN = {1000: (255, 56, 0), 1500: (255, 109, 0), 2000: (255, 137, 18),
           2500: (255, 161, 72), 3000: (255, 180, 107), 3500: (255, 196, 137),
           4000: (255, 209, 163), 4500: (255, 219, 186), 5000: (255, 228, 206),
           5500: (255, 236, 224), 6000: (255, 243, 239), 6500: (255, 249, 253),
           7000: (245, 243, 255), 7500: (235, 238, 255), 8000: (227, 233, 255),
           8500: (220, 229, 255), 9000: (214, 225, 255), 9500: (208, 222, 255),
           10000: (204, 219, 255)}


def _wb(img, p, rng):
    if rng.random() <= p and img.mode == "RGB":
        temps = list(_KELVIN.keys())
        r, g, b = _KELVIN[temps[rng.integers(0, len(temps))]]
        matrix = (r / 255.0, 0.0, 0.0, 0.0,
                  0.0, g / 255.0, 0.0, 0.0,
                  0.0, 0.0, b / 255.0, 0.0)
        return img.convert("RGB", matrix)
    return img


def _colorize(img, p, rng):
    from PIL import Image

    if rng.random() <= p and img.mode == "RGB":
        color = ["red", "blue", "green"][rng.integers(0, 3)]
        layer = Image.new("RGB", img.size, color)
        return Image.blend(img, layer, 0.3)
    return img


def _salt_and_pepper(img, p, rng):
    from PIL import Image, ImageOps

    if rng.random() <= p:
        img = ImageOps.grayscale(img)
        out = np.copy(np.array(img))
        nb = int(np.ceil(p * out.size * 0.5))
        coords = [rng.integers(0, i - 1, nb) for i in out.shape]
        out[coords[0], coords[1]] = 1
        coords = [rng.integers(0, i - 1, nb) for i in out.shape]
        out[coords[0], coords[1]] = 0
        return Image.fromarray(out)
    return img


def _gaussian(img, p, rng):
    from PIL import Image, ImageOps

    if rng.random() <= p:
        dim = np.array(img).shape
        gauss = rng.normal(0, p, (dim[0], dim[1]))
        return Image.fromarray(
            (np.array(ImageOps.grayscale(img)) + gauss).astype("uint8"))
    return img


def _rotate(img, p, rng):
    from PIL import Image

    if rng.random() <= p:
        angle = rng.random() * 40 - 20
        return img.rotate(angle, Image.BILINEAR)
    return img


def _horizontal_flip(img, p, rng):
    from PIL import Image

    return img.transpose(Image.FLIP_LEFT_RIGHT) if rng.random() <= p else img


def _random_crop(img, p, rng):
    if rng.random() <= p:
        dim = np.array(img).shape
        height, width = dim[0], dim[1]
        ch, cw = height / 5, width / 5
        ih = rng.random() * ch
        iw = rng.random() * cw
        return img.crop((iw, ih, width - cw + iw, height - ch + ih)).resize(
            (height, width))
    return img


def synth_periodic_patterns(size: int = 256) -> List[np.ndarray]:
    """Six deterministic sinusoidal-grating RGBA patterns — synthesized
    stand-ins for the reference's ``periodic_noise_{1..6}.png`` assets,
    which were never shipped with the repo (data_utils.py:271-282 opens
    them from the working directory).  "Periodic noise" in the imaging
    literature is sinusoidal interference; six gratings spanning low→high
    spatial frequency at varied orientations cover the same corruption
    family the filenames imply."""
    freqs = (4, 8, 12, 16, 24, 32)
    thetas = (0.0, 45.0, 90.0, 135.0, 30.0, 60.0)
    y, x = np.mgrid[0:size, 0:size] / float(size)
    out = []
    for f, deg in zip(freqs, thetas):
        t = np.deg2rad(deg)
        phase = 2.0 * np.pi * f * (x * np.cos(t) + y * np.sin(t))
        g = ((np.sin(phase) + 1.0) * 127.5).astype(np.uint8)
        out.append(np.stack([g, g, g, np.full_like(g, 255)], axis=-1))
    return out


def periodic(img, rng: np.random.Generator | None = None,
             patterns: List[np.ndarray] | None = None):
    """Expose the image to periodic pattern noise — the INTENDED semantics
    of reference data_utils.py:271-282, rebuilt (the reference's own copy is
    unrunnable: its PNG assets are missing and it calls rotate/random_crop
    with the wrong signatures — PARITY.md "periodic").

    For each of the six patterns: upsample to 2×(W, H), rotate by a uniform
    random angle in [0, 360) on a white ground, crop a random (W, H) window,
    and alpha-blend over the image at 0.3 in RGBA.  Returns the list of six
    corrupted variants (the reference returns one blend per pattern file)."""
    from PIL import Image

    rng = rng or np.random.default_rng()
    patterns = patterns if patterns is not None else synth_periodic_patterns()
    w, h = img.width, img.height
    base = img.convert("RGBA")
    out = []
    for arr in patterns:
        noise = Image.fromarray(arr).convert("RGBA").resize((w * 2, h * 2))
        noise = noise.rotate(rng.random() * 360.0, Image.BILINEAR,
                             fillcolor="white")
        ix = rng.random() * w  # random (w, h) window of the 2x canvas
        iy = rng.random() * h
        noise = noise.crop((ix, iy, ix + w, iy + h))
        out.append(Image.blend(base, noise, 0.3))
    return out


def compute_weights(example_topics: List[str], topic2idx: dict):
    """Class-balance weights for Enrico (data_utils.py:284-315); returns
    (per-class normalized inverse-frequency weights, per-example sampling
    weights)."""
    from collections import Counter

    counts = Counter(example_topics)
    per_example = np.array([1.0 / counts[t] for t in example_topics], np.float32)
    class_counts = Counter(topic2idx[t] for t in example_topics)
    raw = [class_counts[i] for i in range(len(topic2idx))]
    total = sum(raw)
    inv = [1.0 / (w / total) for w in raw]
    s = sum(inv)
    return [w / s for w in inv], per_example
