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


def make_clean(rng: np.random.Generator, size: int) -> np.ndarray:
    img = np.stack([_smooth_field(rng, size, rng.integers(3, 9)) for _ in range(3)], -1)
    # a few soft blobs for sharp-ish structure
    yy, xx = np.mgrid[0:size, 0:size]
    for _ in range(rng.integers(2, 6)):
        cy, cx = rng.uniform(0, size, 2)
        r = rng.uniform(size * 0.05, size * 0.25)
        mask = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r))
        color = rng.uniform(0, 1, 3)
        img = img * (1 - mask[..., None]) + color * mask[..., None]
    return np.clip(img, 0, 1).astype(np.float32)


def add_haze(rng: np.random.Generator, clean: np.ndarray) -> np.ndarray:
    size = clean.shape[0]
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
    opt = p.parse_args(argv)

    os.makedirs(opt.out, exist_ok=True)
    rng = np.random.default_rng(opt.seed)
    for i in range(opt.n):
        gt = make_clean(rng, opt.size)
        haze = add_haze(rng, gt)
        with h5py.File(os.path.join(opt.out, f"{i}.h5"), "w") as f:
            f.create_dataset("gt", data=gt)
            f.create_dataset("haze", data=haze)
    print(f"wrote {opt.n} pairs at {opt.size}x{opt.size} to {opt.out}")


if __name__ == "__main__":
    main()
