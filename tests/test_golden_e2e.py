"""BASELINE config-1 analog, fully self-generated: the same checkpoint run
through the torch oracle and through the demo CLI pipeline (h5 → forward →
normalised PNG), compared with the exact PSNRSSIM protocol. North-star:
PSNR within 0.1 dB / SSIM within 0.001 — here the two framework outputs
must be nearly identical (PSNR > 50 dB)."""

import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.dirname(__file__))

h5py = pytest.importorskip("h5py")
torch = pytest.importorskip("torch")
from PIL import Image  # noqa: E402


def test_golden_pipeline(tmp_path, np_rng):
    from torch_oracle import FDGANOracle

    from fdgan_tpu.cli.demo import main as demo_main
    from fdgan_tpu.cli.psnrssim import main as metric_main
    from fdgan_tpu.cli._common import save_image_normalized

    # dataset
    ds = tmp_path / "ds"
    ds.mkdir()
    hazes = []
    for i in range(2):
        gt = np_rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
        haze = np.clip(gt * 0.7 + 0.3, 0, 1).astype(np.float32)
        hazes.append(haze)
        with h5py.File(ds / f"{i}.h5", "w") as f:
            f.create_dataset("gt", data=gt)
            f.create_dataset("haze", data=haze)

    # one checkpoint, reference .pth format with DataParallel prefixes
    torch.manual_seed(0)
    oracle = FDGANOracle()
    oracle.train()
    pth = str(tmp_path / "netG_epoch_test.pth")
    torch.save({f"module.{k}": v for k, v in oracle.state_dict().items()}, pth)

    # reference-side pipeline: torch forward → normalize=True PNGs
    ref_dir = tmp_path / "ref_out"
    ref_dir.mkdir()
    with torch.no_grad():
        for i, haze in enumerate(hazes):
            y = oracle(torch.from_numpy(haze.transpose(2, 0, 1)[None])).numpy()[0].transpose(1, 2, 0)
            save_image_normalized(y, str(ref_dir / f"{i}.png"))

    # our pipeline: demo CLI end to end
    out_dir = str(tmp_path / "jax_out")
    demo_main(["--valDataroot", str(ds), "--netG", pth, "--imageSize", "32", "--outDir", out_dir])

    psnr_v, ssim_v = metric_main(["--gt_dir", str(ref_dir), "--result_dir", out_dir])
    assert psnr_v > 50, f"cross-framework pipeline PSNR too low: {psnr_v}"
    assert ssim_v > 0.999, f"cross-framework pipeline SSIM too low: {ssim_v}"
