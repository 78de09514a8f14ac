"""Inference CLI — drop-in for the reference's ``demo.py`` (same flags,
demo.py:28-51; same output protocol: per-image latency print + normalised
PNGs under ./result_AAAI20/image/, demo.py:131-151).

TPU-native upgrades behind extra flags:
  --precision bf16      bf16 compute (fp32 BN statistics)
  --tile N --halo H     halo-tiled high-res inference (NTIRE ≥1600px)
  --profile_dir DIR     jax.profiler trace
  --bn_mode running     conventional eval-mode BN (reference default is
                        train-mode batch stats, README.md:38)
"""

from __future__ import annotations

import argparse
import os
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    # reference flags (demo.py:28-51). The train-loop ones (lrD/lrG/beta1/
    # netD/display/evalIter/...) are accepted-but-ignored at inference,
    # exactly as the reference's demo.py ignores them — kept so existing
    # invocation scripts are drop-in compatible.
    p.add_argument("--dataset", default="pix2pix")
    p.add_argument("--valDataroot", default="", help="path to val dataset")
    p.add_argument("--mode", default="B2A")
    p.add_argument("--valBatchSize", type=int, default=1)
    p.add_argument("--batchSize", type=int, default=1)
    p.add_argument("--originalSize", type=int, default=1024)
    p.add_argument("--imageSize", type=int, default=1024)
    p.add_argument("--inputChannelSize", type=int, default=3)
    p.add_argument("--outputChannelSize", type=int, default=3)
    p.add_argument("--lrD", type=float, default=0.0002)
    p.add_argument("--lrG", type=float, default=0.0002)
    p.add_argument("--netG", default="", help="path to netG (.pth or .msgpack)")
    p.add_argument("--beta1", type=float, default=0.5)
    p.add_argument("--netD", default="")
    p.add_argument("--workers", type=int, default=1)
    p.add_argument("--display", type=int, default=5)
    p.add_argument("--evalIter", type=int, default=500)
    # TPU-native extensions
    p.add_argument("--outDir", default="./result_AAAI20/image/")
    p.add_argument("--precision", choices=["fp32", "bf16"], default="fp32")
    p.add_argument("--bn_mode", choices=["batch", "running"], default="batch")
    p.add_argument("--tile", type=int, default=0, help="tile size for halo-tiled inference (0 = off)")
    p.add_argument("--halo", type=int, default=128)
    p.add_argument("--profile_dir", default="")
    return p


def main(argv=None):
    opt = build_parser().parse_args(argv)
    print(opt)

    import jax
    import jax.numpy as jnp
    import numpy as np

    if opt.precision == "fp32":
        # XLA TPU computes fp32 convs through bf16 passes by default
        # (measured 2e-2 absolute error on the Laplacian); checkpoint-parity
        # inference needs true fp32 accumulation
        jax.config.update("jax_default_matmul_precision", "highest")

    from fdgan_tpu.cli._common import (
        enable_compile_cache,
        load_generator_params,
        maybe_profile,
        save_image_normalized,
    )
    from fdgan_tpu.data import get_loader
    from fdgan_tpu.models import fdgan, fdgan_fast

    enable_compile_cache()

    loader = get_loader(
        opt.dataset,
        opt.valDataroot,
        opt.imageSize,
        opt.imageSize,
        batch_size=opt.valBatchSize,
        workers=opt.workers,
        split="Train",
        shuffle=False,
        seed=None,
    )

    params = load_generator_params(opt.netG)
    compute_dtype = jnp.bfloat16 if opt.precision == "bf16" else jnp.float32
    if opt.precision == "bf16":
        from fdgan_tpu.nn.tree import cast_tree

        params = cast_tree(params, jnp.bfloat16)

    @jax.jit
    def fwd(p, x):
        return fdgan_fast.apply(p, x.astype(compute_dtype), bn_mode=opt.bn_mode).astype(jnp.float32)

    if opt.tile:
        from fdgan_tpu.dist.tiling import tiled_apply

        base = fwd
        run = lambda p, x: tiled_apply(lambda t: base(p, t), x, tile=opt.tile, halo=opt.halo)
    else:
        run = fwd

    os.makedirs(opt.outDir, exist_ok=True)
    index = -1
    with maybe_profile(opt.profile_dir or None):
        for batch in loader:
            haze = batch[0]  # pix2pix 2-tuple / pix2pix_val 4-tuple
            x = jnp.asarray(haze)
            # FDGAN needs H, W divisible by 8 (three ÷2 stages); real NTIRE
            # images are arbitrary — reflect-pad up, crop the output back
            h0, w0 = x.shape[1], x.shape[2]
            ph = (-h0) % 8
            pw = (-w0) % 8
            if ph or pw:
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
            start = time.time()
            x_hat = run(params, x)
            x_hat.block_until_ready()
            print(time.time() - start)  # per-image latency (demo.py:131-135)
            x_hat = np.asarray(x_hat)[:, :h0, :w0]
            for i in range(x_hat.shape[0]):
                index += 1
                print(index)
                save_image_normalized(x_hat[i], os.path.join(opt.outDir, f"{index}.png"))


if __name__ == "__main__":
    main()
