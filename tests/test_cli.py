"""End-to-end CLI tests: generate_testsample → demo → psnrssim — the
reference's full manual workflow (README.md:30-51) as an automated golden
path, on tiny images."""

import os
import sys

import numpy as np
import pytest

import jax

h5py = pytest.importorskip("h5py")
PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture(scope="module")
def image_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    gt_dir, haze_dir = root / "gt", root / "haze"
    gt_dir.mkdir()
    haze_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        gt = (rng.uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8)
        haze = np.clip(gt.astype(int) + 40, 0, 255).astype(np.uint8)
        Image.fromarray(gt).save(gt_dir / f"{i}.png")
        Image.fromarray(haze).save(haze_dir / f"{i}.png")
    return str(gt_dir), str(haze_dir)


def test_generate_testsample_cli(image_dirs, tmp_path):
    from fdgan_tpu.cli.generate_testsample import main

    gt_dir, haze_dir = image_dirs
    out = str(tmp_path / "ds")
    main(["--gt_dir", gt_dir, "--haze_dir", haze_dir, "--out_dir", out])
    files = sorted(os.listdir(out))
    assert files == ["0.h5", "1.h5"]
    with h5py.File(os.path.join(out, "0.h5")) as f:
        assert f["gt"].shape == (32, 32, 3)
        assert f["gt"].dtype == np.float32
        assert float(f["haze"][:].max()) <= 1.0


def test_demo_cli_end_to_end(image_dirs, tmp_path):
    """generate dataset → save random-init checkpoint → demo inference."""
    from fdgan_tpu.cli.demo import main as demo_main
    from fdgan_tpu.cli.generate_testsample import main as gen_main
    from fdgan_tpu.io.checkpoint import save_checkpoint
    from fdgan_tpu.models import fdgan

    gt_dir, haze_dir = image_dirs
    ds = str(tmp_path / "ds")
    gen_main(["--gt_dir", gt_dir, "--haze_dir", haze_dir, "--out_dir", ds])

    ckpt = str(tmp_path / "netG.msgpack")
    save_checkpoint(ckpt, fdgan.init(jax.random.PRNGKey(0)))

    out = str(tmp_path / "result")
    demo_main(["--valDataroot", ds, "--netG", ckpt, "--imageSize", "32", "--outDir", out])
    pngs = sorted(os.listdir(out))
    assert pngs == ["0.png", "1.png"]
    img = np.asarray(Image.open(os.path.join(out, "0.png")))
    assert img.shape == (32, 32, 3)


def test_psnrssim_cli(image_dirs, tmp_path, capsys):
    from fdgan_tpu.cli.psnrssim import main

    gt_dir, haze_dir = image_dirs
    # near-identical pair: gt + tiny noise (identical dirs give infinite PSNR
    # in the reference protocol too — 10·log10(1/0))
    near_dir = tmp_path / "near"
    near_dir.mkdir()
    rng = np.random.default_rng(1)
    for name in sorted(os.listdir(gt_dir)):
        img = np.asarray(Image.open(os.path.join(gt_dir, name))).astype(int)
        noisy = np.clip(img + rng.integers(-2, 3, img.shape), 0, 255).astype(np.uint8)
        Image.fromarray(noisy).save(near_dir / name)

    psnr_v, ssim_v = main(["--gt_dir", gt_dir, "--result_dir", str(near_dir)])
    out = capsys.readouterr().out
    assert "psnr" in out
    assert psnr_v > 40
    assert ssim_v > 0.98

    psnr2, ssim2 = main(["--gt_dir", gt_dir, "--result_dir", haze_dir])
    assert psnr2 < psnr_v
    assert ssim2 < ssim_v


def test_demo_torch_pth_checkpoint(image_dirs, tmp_path):
    """demo accepts the reference .pth format with module. prefixes."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.dirname(__file__))
    from torch_oracle import FDGANOracle

    from fdgan_tpu.cli.demo import main as demo_main
    from fdgan_tpu.cli.generate_testsample import main as gen_main

    gt_dir, haze_dir = image_dirs
    ds = str(tmp_path / "ds")
    gen_main(["--gt_dir", gt_dir, "--haze_dir", haze_dir, "--out_dir", ds])

    torch.manual_seed(0)
    oracle = FDGANOracle()
    state = {f"module.{k}": v for k, v in oracle.state_dict().items()}
    pth = str(tmp_path / "netG_epoch_test.pth")
    torch.save(state, pth)

    out = str(tmp_path / "result_pth")
    demo_main(["--valDataroot", ds, "--netG", pth, "--imageSize", "32", "--outDir", out])
    assert sorted(os.listdir(out)) == ["0.png", "1.png"]


def test_serve_cli_folder(image_dirs, tmp_path):
    """cli.serve dehazes a raw-image folder (no h5 repack) via the engine."""
    from fdgan_tpu.cli.serve import main as serve_main

    _, haze_dir = image_dirs
    out = str(tmp_path / "served")
    serve_main(
        ["--inDir", haze_dir, "--outDir", out, "--precision", "fp32",
         "--bucket", "32", "--maxBatch", "2"]
    )
    outs = sorted(os.listdir(out))
    assert outs == ["0.png", "1.png"]
    img = np.asarray(Image.open(os.path.join(out, "0.png")))
    assert img.shape == (32, 32, 3)


def test_serve_cli_from_artifact(image_dirs, tmp_path):
    """Deployment chain with zero model code at serving time:
    convert → batch-polymorphic .shlo artifact → serve --artifact."""
    from fdgan_tpu.cli.convert import main as convert_main
    from fdgan_tpu.cli.serve import main as serve_main
    from fdgan_tpu.io.checkpoint import save_checkpoint
    from fdgan_tpu.models import fdgan

    ckpt = str(tmp_path / "netG.msgpack")
    save_checkpoint(ckpt, fdgan.init(jax.random.PRNGKey(0)))
    art = str(tmp_path / "netG_32.shlo")
    convert_main(
        ["--src", ckpt, "--dst", art, "--imageSize", "32", "--batch", "poly",
         "--platforms", "cpu,tpu"]
    )
    assert os.path.getsize(art) > 1_000_000

    _, haze_dir = image_dirs
    out = str(tmp_path / "served_art")
    serve_main(["--inDir", haze_dir, "--outDir", out, "--artifact", art])
    outs = sorted(os.listdir(out))
    assert outs == ["0.png", "1.png"]
    img = np.asarray(Image.open(os.path.join(out, "0.png")))
    assert img.shape == (32, 32, 3)


def test_serve_http_flag_validation(tmp_path):
    """--http excludes --artifact, and the folder mode still requires
    --inDir (fast: both exits fire before any model work)."""
    import pytest as _pytest

    from fdgan_tpu.cli import serve as serve_cli

    with _pytest.raises(SystemExit, match="artifact"):
        serve_cli.main(["--http", "8080", "--artifact", "x.shlo"])
    with _pytest.raises(SystemExit, match="inDir"):
        serve_cli.main([])
