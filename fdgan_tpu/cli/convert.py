"""Checkpoint-format converter CLI: reference torch `.pth` ↔ native msgpack.

    python -m fdgan_tpu.cli.convert --src netG_epoch_real.pth --dst netG.msgpack
    python -m fdgan_tpu.cli.convert --src netG.msgpack --dst netG.pth [--prefix module.]
    python -m fdgan_tpu.cli.convert --src netG.msgpack --dst netG_512.shlo \
        --imageSize 512 --batch 8 [--platforms tpu,cpu]

Import preserves the reference's dead parameters (SURVEY.md §2.2); export
writes OIHW conv layouts with optional DataParallel `module.` prefixes so the
original PyTorch tooling can consume checkpoints trained here. A `.shlo`
destination AOT-exports the forward as a self-contained StableHLO artifact
(weights baked in; see io/export.py) for PJRT serving without Python model
code.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument(
        "--model",
        default="fdgan",
        choices=[
            "fdgan", "vgg16",          # flagship + perceptual
            "dense", "dense2",         # DCPDN transmission generators
            "unetg", "unetg2",         # dehaze22 U-Nets (G, airlight G2)
            "dehaze",                  # atmospheric-scattering composite
            "nlayer", "patchd", "begand",  # discriminators
        ],
        help="model family the checkpoint belongs to (template + "
             "ConvTranspose layout map; io/torch_import.model_registry)",
    )
    p.add_argument("--prefix", default="module.", help="key prefix for .pth export")
    p.add_argument("--imageSize", type=int, default=512, help=".shlo export shape")
    p.add_argument(
        "--batch",
        default="1",
        help=".shlo export batch: an int, or 'poly' for a batch-polymorphic artifact",
    )
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--bnMode", default="batch", choices=["batch", "running"])
    p.add_argument(
        "--ioDtype",
        default="float32",
        choices=["float32", "uint8"],
        help=".shlo I/O contract: uint8 bakes the byte interface into the "
        "artifact (uint8 [0,255] in, x/255 fused; uint8 out, on-device "
        "quantise) — 4x smaller transfers for constrained-link serving",
    )
    p.add_argument(
        "--platforms",
        default="tpu,cpu",
        help="comma list of target platforms baked into the .shlo (export "
        "lowers without needing the devices; default tpu,cpu runs anywhere)",
    )
    opt = p.parse_args(argv)

    import jax

    # pure data transformation — never worth a TPU round-trip (and the axon
    # tunnel makes device init minutes-slow)
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    import jax.numpy as jnp

    from fdgan_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from fdgan_tpu.io.torch_import import (
        convert_checkpoint,
        convert_vgg16,
        export_state_dict,
        model_registry,
    )

    factory, transposed, duplicated = model_registry()[opt.model]

    def template():
        return factory(jax.random.PRNGKey(0), jnp.float32)

    src_is_torch = opt.src.endswith((".pth", ".pt"))
    dst_is_torch = opt.dst.endswith((".pth", ".pt"))

    if opt.dst.endswith((".shlo", ".stablehlo")):
        if opt.model != "fdgan":
            raise SystemExit("StableHLO export supports --model fdgan only")
        from fdgan_tpu.io.export import export_forward, save_exported

        params = (
            convert_checkpoint(opt.src, opt.model)
            if src_is_torch
            else load_checkpoint(opt.src, template())
        )
        exported = export_forward(
            params,
            image_size=opt.imageSize,
            batch=opt.batch if opt.batch == "poly" else int(opt.batch),
            precision=opt.precision,
            bn_mode=opt.bnMode,
            platforms=[s.strip() for s in opt.platforms.split(",") if s.strip()]
            or None,
            io=opt.ioDtype,
        )
        n = save_exported(opt.dst, exported)
        print(
            f"exported {opt.src} -> {opt.dst} ({n/1e6:.1f} MB StableHLO, "
            f"{opt.batch}x{opt.imageSize}^2 {opt.precision} bn={opt.bnMode} "
            f"io={opt.ioDtype}, platforms={list(exported.platforms)})"
        )
        return

    if src_is_torch and not dst_is_torch:
        params = (
            convert_vgg16(opt.src)  # accepts torchvision features.* naming too
            if opt.model == "vgg16"
            else convert_checkpoint(opt.src, opt.model)
        )
        save_checkpoint(opt.dst, params)
        print(f"imported {opt.src} -> {opt.dst}")
    elif not src_is_torch and dst_is_torch:
        import torch

        params = load_checkpoint(opt.src, template())
        state = export_state_dict(
            params, prefix=opt.prefix, transposed=transposed, duplicated=duplicated
        )
        torch.save({k: torch.from_numpy(v) for k, v in state.items()}, opt.dst)
        print(f"exported {opt.src} -> {opt.dst} ({len(state)} tensors)")
    else:
        raise SystemExit("exactly one of --src/--dst must be a .pth/.pt file")


if __name__ == "__main__":
    main()
