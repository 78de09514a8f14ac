"""Golden-parity runner: the reference's FDGAN (torch oracle) vs fdgan_tpu on
identical inputs, compared with the exact PSNRSSIM.py protocol.

With --netG pointing at a real reference checkpoint (netG_epoch_real.pth /
netG_epoch_synthetic.pth) this is the BASELINE north-star check (PSNR within
0.1 dB, SSIM within 0.001). Without one, random oracle weights are used —
still a full-graph numerical parity check through the importer.

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/parity_check.py \
        [--netG ckpt.pth] [--size 256] [--batch 1] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--netG", default="", help="reference .pth (random oracle weights if empty)")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true", help="force JAX CPU")
    opt = p.parse_args()

    import jax

    if opt.cpu:
        jax.config.update("jax_platforms", "cpu")
    # fp32 parity on TPU requires true fp32 conv accumulation — the default
    # routes fp32 convs through bf16 passes (~1e-2 error, ~58 dB "parity")
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp
    import torch

    from torch_oracle import FDGANOracle

    from fdgan_tpu.io.torch_import import convert_state_dict, load_torch_state_dict
    from fdgan_tpu.models import fdgan, fdgan_fast
    from fdgan_tpu.ops.metrics import compare_ssim, psnr

    torch.manual_seed(opt.seed)
    oracle = FDGANOracle()
    if opt.netG:
        state = load_torch_state_dict(opt.netG)
        oracle.load_state_dict({k: torch.from_numpy(v) for k, v in state.items()})
    else:
        state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    oracle.train()  # reference inference mode (README.md:38)

    params = convert_state_dict(state, fdgan.init(jax.random.PRNGKey(0)))

    rng = np.random.default_rng(opt.seed)
    x = rng.uniform(0, 1, (opt.batch, opt.size, opt.size, 3)).astype(np.float32)

    with torch.no_grad():
        ref = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    for name, fn in (("fdgan", fdgan.apply), ("fdgan_fast", fdgan_fast.apply)):
        got = np.asarray(jax.jit(lambda p, v: fn(p, v))(params, jnp.asarray(x)))
        # [-1,1] → [0,1] for the metric protocol
        a = np.clip((ref + 1) / 2, 0, 1)
        b = np.clip((got + 1) / 2, 0, 1)
        psnrs = [psnr(a[i], b[i]) for i in range(opt.batch)]
        ssims = [
            np.mean(
                [
                    compare_ssim(
                        (a[i, :, :, c] * 255).astype(np.uint8),
                        (b[i, :, :, c] * 255).astype(np.uint8),
                        gaussian_weights=True,
                        use_sample_covariance=False,
                    )
                    for c in range(3)
                ]
            )
            for i in range(opt.batch)
        ]
        max_abs = float(np.abs(ref - got).max())
        print(
            f"{name:12s} torch-vs-jax: PSNR {np.mean(psnrs):8.2f} dB   "
            f"SSIM {np.mean(ssims):.4f}   max|Δ| {max_abs:.2e}"
        )
        assert np.mean(psnrs) > 60, "parity broken"
    print("parity OK (threshold: PSNR > 60 dB between frameworks)")


if __name__ == "__main__":
    main()
