"""Generate a synthetic-haze h5 dataset for training-dynamics validation.

Clean images are procedural (smooth low-frequency fields + random soft
blobs — enough structure for SSIM/PSNR to be meaningful); haze follows the
atmospheric scattering model the reference's physical head implements
(dehaze1113.py Dehaze: J = (I - A)/t + A, so I = J*t + A*(1 - t)) with a
spatially varying transmission map and a random global airlight.

Output format matches the pipeline contract (SURVEY.md §2 #25,
generate_testsample.py:35-38): {i}.h5 with float 'gt' and 'haze' HWC [0,1].

Usage: python tools/make_synth_haze.py --out /tmp/synth_train --n 256 --size 64
"""

from __future__ import annotations

import argparse
import os

import h5py
import numpy as np


def _smooth_field(rng: np.random.Generator, size: int, cutoff: int) -> np.ndarray:
    """Low-pass-filtered noise in [0,1], (size,size)."""
    f = rng.standard_normal((cutoff, cutoff))
    # upsample by FFT zero-padding: smooth, periodic-free enough for this use
    big = np.zeros((size, size))
    big[:cutoff, :cutoff] = f
    out = np.real(np.fft.ifft2(np.fft.fft2(big)))
    out = (out - out.min()) / (out.max() - out.min() + 1e-9)
    return out


def make_clean(rng: np.random.Generator, size: int, rich: bool = False) -> np.ndarray:
    img = np.stack([_smooth_field(rng, size, rng.integers(3, 9)) for _ in range(3)], -1)
    yy, xx = np.mgrid[0:size, 0:size]
    if rich:
        # extra scene families so the set is not all soft blobs: oriented
        # sinusoidal texture, hard-edged rectangles, and a linear sky-like
        # gradient, each applied with per-image probability (r5 capstone set).
        if rng.uniform() < 0.5:  # stripes (high-frequency structure)
            theta = rng.uniform(0, np.pi)
            freq = rng.uniform(2, 12) * 2 * np.pi / size
            phase = rng.uniform(0, 2 * np.pi)
            stripes = 0.5 + 0.5 * np.sin(freq * (xx * np.cos(theta) + yy * np.sin(theta)) + phase)
            w = rng.uniform(0.15, 0.5)
            img = img * (1 - w) + stripes[..., None] * rng.uniform(0.3, 1.0, 3) * w
        for _ in range(rng.integers(0, 4)):  # hard-edged rectangles (sharp gradients)
            y0, x0 = int(rng.integers(0, size)), int(rng.integers(0, size))
            h, w_ = int(rng.integers(size // 16, size // 3)), int(rng.integers(size // 16, size // 3))
            img[y0 : y0 + h, x0 : x0 + w_] = (
                img[y0 : y0 + h, x0 : x0 + w_] * 0.3 + rng.uniform(0, 1, 3) * 0.7
            )
        if rng.uniform() < 0.5:  # vertical gradient (sky/ground)
            g = (yy / (size - 1))[..., None]
            top, bot = rng.uniform(0, 1, 3), rng.uniform(0, 1, 3)
            grad = top * (1 - g) + bot * g
            w = rng.uniform(0.2, 0.5)
            img = img * (1 - w) + grad * w
    # a few soft blobs for sharp-ish structure
    for _ in range(rng.integers(2, 6)):
        cy, cx = rng.uniform(0, size, 2)
        r = rng.uniform(size * 0.05, size * 0.25)
        mask = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r))
        color = rng.uniform(0, 1, 3)
        img = img * (1 - mask[..., None]) + color * mask[..., None]
    return np.clip(img, 0, 1).astype(np.float32)


def add_haze(rng: np.random.Generator, clean: np.ndarray, rich: bool = False) -> np.ndarray:
    size = clean.shape[0]
    if rich:
        # wider severity range and a slightly coloured airlight (real haze is
        # rarely perfectly grey) — transmission down to 0.1 (dense haze)
        t = _smooth_field(rng, size, rng.integers(2, 6)) * rng.uniform(0.5, 0.85) + 0.1
        base = rng.uniform(0.7, 1.0)
        airlight = np.clip(base + rng.uniform(-0.06, 0.06, 3), 0, 1)
    else:
        # transmission: smooth field mapped into [0.2, 0.9]
        t = _smooth_field(rng, size, rng.integers(2, 5)) * 0.7 + 0.2
        airlight = rng.uniform(0.7, 1.0)
    hazy = clean * t[..., None] + airlight * (1.0 - t[..., None])
    return np.clip(hazy, 0, 1).astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--rich", action="store_true",
                   help="richer scene families (stripes/rectangles/gradients) "
                        "+ coloured airlight and denser haze; default stays "
                        "byte-identical to the r2-r4 artifact recipes")
    opt = p.parse_args(argv)

    os.makedirs(opt.out, exist_ok=True)
    rng = np.random.default_rng(opt.seed)
    for i in range(opt.n):
        gt = make_clean(rng, opt.size, rich=opt.rich)
        haze = add_haze(rng, gt, rich=opt.rich)
        with h5py.File(os.path.join(opt.out, f"{i}.h5"), "w") as f:
            f.create_dataset("gt", data=gt)
            f.create_dataset("haze", data=haze)
    print(f"wrote {opt.n} pairs at {opt.size}x{opt.size} to {opt.out}")


if __name__ == "__main__":
    main()
