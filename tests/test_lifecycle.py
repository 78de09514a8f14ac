"""Full user lifecycle in one test: train → best-checkpoint selection →
AOT export → serve from the artifact — every CLI a reference user would
touch, chained on the same weights (reference flow: train (unpublished) →
netG_epoch_*.pth → demo.py:78-151; here the serving artifact additionally
needs no model code at load time)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

h5py = pytest.importorskip("h5py")
from PIL import Image  # noqa: E402


def test_train_export_serve_lifecycle(tmp_path, np_rng):
    from fdgan_tpu.cli.convert import main as convert_main
    from fdgan_tpu.cli.serve import main as serve_main
    from fdgan_tpu.cli.train import main as train_main

    # 1. tiny paired dataset
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

    # 2. train one epoch, tracking the best-val generator
    exp = str(tmp_path / "exp")
    train_main([
        "--dataroot", str(ds), "--valDataroot", str(ds),
        "--batchSize", "1", "--imageSize", "32", "--epochs", "1",
        "--exp", exp, "--poolSize", "0", "--logEvery", "1",
        "--evalIter", "1", "--keepBest",
    ])
    best = os.path.join(exp, "netG_best.msgpack")
    assert os.path.exists(best)

    # 3. AOT-export the best generator (fp32 keeps live/artifact parity
    # tight; weights baked, no model code needed at load)
    art = str(tmp_path / "netG_32.shlo")
    convert_main([
        "--src", best, "--dst", art, "--imageSize", "32", "--batch", "1",
        "--precision", "fp32", "--bnMode", "batch", "--platforms", "cpu",
    ])
    assert os.path.exists(art)

    # 4. serve a folder of raw PNGs from the artifact…
    in_dir = tmp_path / "hazy"
    in_dir.mkdir()
    for i, hz in enumerate(hazes):
        Image.fromarray((hz * 255).round().astype(np.uint8)).save(
            in_dir / f"{i}.png"
        )
    out_art = tmp_path / "out_artifact"
    serve_main([
        "--inDir", str(in_dir), "--outDir", str(out_art),
        "--artifact", art, "--maxBatch", "1",
    ])
    # …and the same folder through the live-jit path on the same weights
    out_live = tmp_path / "out_live"
    serve_main([
        "--inDir", str(in_dir), "--outDir", str(out_live),
        "--netG", best, "--precision", "fp32", "--bn_mode", "batch",
        "--maxBatch", "1", "--bucket", "32",
    ])

    outs_a = sorted(os.listdir(out_art))
    outs_l = sorted(os.listdir(out_live))
    assert len(outs_a) == 2 and outs_a == outs_l
    for name in outs_a:
        a = np.asarray(Image.open(out_art / name), dtype=np.float32)
        l = np.asarray(Image.open(out_live / name), dtype=np.float32)
        assert a.shape == (32, 32, 3)
        # fp32 artifact matches the live forward to ~1e-7; through the
        # 8-bit PNG quantiser that is at most an off-by-one level
        assert np.mean(np.abs(a - l)) < 1.0
        assert np.max(np.abs(a - l)) <= 1.0
