"""Dehaze a directory of raw images through the serving engine.

The reference has no direct-image entry point — ``demo.py`` requires the
h5 repacking step (``generate_testsample.py``) first. This CLI closes that
gap for production use: it streams arbitrary-size PNG/JPG inputs through
``fdgan_tpu.serve.InferenceEngine`` (shape buckets + batch ladder + pipelined
dispatch) and writes dehazed PNGs with the same normalize=True protocol as
the reference's output path (demo.py:151).

    python -m fdgan_tpu.cli.serve --inDir hazy/ --outDir dehazed/ \
        --netG ckpt.pth --precision bf16 [--tile 1024 --halo 128]
"""

from __future__ import annotations

import argparse
import os
import time

EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--inDir", default="", help="directory of hazy images "
                   "(required unless --http is given)")
    p.add_argument("--outDir", default="./result_serve/")
    p.add_argument("--netG", default="", help="generator checkpoint (.pth or .msgpack)")
    p.add_argument(
        "--artifact",
        default="",
        help="serve from an AOT-exported .shlo artifact (weights baked in; "
        "no model code or --netG needed; engine flags are ignored)",
    )
    p.add_argument("--precision", choices=["fp32", "bf16"], default="bf16")
    p.add_argument("--bn_mode", choices=["batch", "running"], default="running")
    p.add_argument("--bucket", type=int, default=64)
    p.add_argument("--maxBatch", type=int, default=8)
    p.add_argument("--batchSizes", default="",
                   help="explicit comma-separated batch ladder (e.g. 1,2,4,8);"
                        " overrides --maxBatch; each rung must divide by "
                        "--dataShards")
    p.add_argument("--depth", type=int, default=4, help="in-flight batches")
    p.add_argument("--maxWait", type=float, default=0.0,
                   help="flush a partially-filled batch once its oldest image "
                        "has waited this many seconds (0 = wait for a full "
                        "batch); deadlines fire even if the input goes idle — "
                        "but the bound holds only while the consumer keeps "
                        "iterating the stream (results are pulled, not pushed; "
                        "this CLI iterates continuously so the bound holds)")
    p.add_argument("--tile", type=int, default=0, help="halo-tile images above this size")
    p.add_argument("--halo", type=int, default=128)
    p.add_argument("--http", type=int, default=0, metavar="PORT",
                   help="serve an HTTP API instead of a folder pass: "
                        "POST /dehaze (image in, dehazed PNG out), GET "
                        "/healthz, GET /stats, POST /reload (zero-downtime "
                        "weight hot-swap — re-reads --netG or a JSON "
                        "{'path': ...}). Concurrent requests are "
                        "batched together through the engine (--maxWait "
                        "bounds the latency a lone request pays; defaults "
                        "to 0.05 s in this mode). --inDir is not needed")
    p.add_argument("--httpHost", default="127.0.0.1",
                   help="bind address for --http (default loopback)")
    p.add_argument("--warmup", default="",
                   help="comma-separated HxW input shapes (e.g. "
                        "'384x512,720x1280') to pre-compile — every batch "
                        "ladder rung per shape — before serving starts. A "
                        "cold compile is minutes on a remote-compile link; "
                        "without warmup it lands on the first matching "
                        "request. --http defaults to warming the bucket "
                        "shape's full ladder even without this flag")
    p.add_argument("--noWarmup", action="store_true",
                   help="skip the default --http startup warmup (requests "
                        "then pay the cold compiles, including the "
                        "documented mid-run top-of-ladder one)")
    p.add_argument("--autoWarm", action="store_true",
                   help="when a NEW shape bucket compiles its first rung on "
                        "the request path, warm its remaining batch-ladder "
                        "rungs on a background thread (covers shapes not "
                        "known at --warmup time; live traffic keeps flowing "
                        "during the background compiles). Default ON for "
                        "--http — the startup warmup only covers the bucket "
                        "shape, and real photos bucket larger")
    p.add_argument("--noAutoWarm", action="store_true",
                   help="disable the --http default auto-warm")
    p.add_argument("--outputDtype", choices=["float32", "uint8"],
                   default="float32",
                   help="uint8 quantises results on device (round((y+1)*"
                        "127.5)): a 4x smaller device->host fetch — the "
                        "serving ceiling on constrained links — at a <=1/255 "
                        "per-pixel cost before the PNG write (which needs "
                        "uint8 anyway). float32 keeps the full-precision "
                        "output path")
    p.add_argument("--inputDtype", choices=["float32", "uint8"],
                   default="float32",
                   help="uint8 stages inputs on device as raw bytes (the "
                        "x/255 normalisation fuses into the forward): a 4x "
                        "smaller host->device upload, bit-identical results "
                        "for 8-bit sources (all PNG/JPEG inputs are). "
                        "float32 uploads normalised floats")
    p.add_argument("--dataShards", type=int, default=0,
                   help="shard batches over this many devices (mesh 'data' "
                        "axis; 0 = no mesh, single device)")
    p.add_argument("--spatialShards", type=int, default=1,
                   help="with --dataShards: also shard the image H axis over "
                        "this many devices (latency lever for large images)")
    return p


def main(argv=None):
    opt = build_parser().parse_args(argv)

    from fdgan_tpu.cli._common import (
        enable_compile_cache,
        load_generator_params,
        save_image_normalized,
    )
    from fdgan_tpu.serve import InferenceEngine
    from fdgan_tpu.utils.images import load_rgb_image

    enable_compile_cache()

    if opt.http:
        if opt.artifact:
            raise SystemExit(
                "--http serves the live engine; AOT artifacts have no "
                "streaming path (drop --artifact or --http)"
            )
    else:
        if not opt.inDir:
            raise SystemExit("--inDir is required (or pass --http PORT)")
        names = sorted(
            f for f in os.listdir(opt.inDir) if f.lower().endswith(EXTS)
        )
        if not names:
            raise SystemExit(f"no images ({'/'.join(EXTS)}) in {opt.inDir}")
        os.makedirs(opt.outDir, exist_ok=True)

        # stem.png unless two inputs share a stem (a.jpg + a.png) — then keep
        # the full name so nothing is silently overwritten
        stems = [os.path.splitext(n)[0] for n in names]
        out_names = [
            (s if stems.count(s) == 1 else n) + ".png"
            for s, n in zip(stems, names)
        ]

    if opt.artifact:
        from fdgan_tpu.io.export import ArtifactRunner

        runner = ArtifactRunner(opt.artifact)
        bdesc = runner.batch if runner.batch is not None else "poly"
        print(
            f"serving from artifact {opt.artifact} "
            f"({bdesc}x{runner.height}x{runner.width})"
        )
        imgs = [
            load_rgb_image(os.path.join(opt.inDir, n)) / 255.0 for n in names
        ]
        t0 = time.time()
        results = runner(imgs, group=opt.maxBatch)
        for name, out_name, out in zip(names, out_names, results):
            save_image_normalized(out, os.path.join(opt.outDir, out_name))
            print(name)
        dt = time.time() - t0
        print(f"{len(names)} images in {dt:.2f}s ({len(names)/dt:.2f} img/s)")
        return

    if opt.netG:
        params = load_generator_params(opt.netG)
    else:
        import jax

        from fdgan_tpu.models import fdgan

        print("warning: no --netG given; using random-init weights (smoke mode)")
        params = fdgan.init(jax.random.PRNGKey(0))

    if opt.batchSizes:
        try:
            rungs = [int(b) for b in opt.batchSizes.split(",") if b.strip()]
        except ValueError:
            raise SystemExit(f"--batchSizes must be comma-separated ints, got {opt.batchSizes!r}")
        if not rungs or any(b < 1 for b in rungs):
            raise SystemExit(f"--batchSizes rungs must be >= 1, got {opt.batchSizes!r}")
        ladder = tuple(sorted(set(rungs)))
    else:
        ladder = tuple(sorted({b for b in (1, 2, 4, 8, 16) if b < opt.maxBatch}
                              | {max(1, opt.maxBatch)}))
    mesh = None
    n_data = opt.dataShards or (1 if opt.spatialShards > 1 else 0)
    if n_data:
        import jax

        from fdgan_tpu.dist.mesh import make_mesh

        n = n_data * opt.spatialShards
        if len(jax.devices()) < n:
            raise SystemExit(
                f"mesh {n_data}x{opt.spatialShards} needs {n} devices, "
                f"have {len(jax.devices())}"
            )
        mesh = make_mesh(
            n_data=n_data, n_spatial=opt.spatialShards, devices=jax.devices()[:n]
        )
        if not opt.batchSizes:
            ladder = tuple(b * n_data for b in ladder)
    engine = InferenceEngine(
        params,
        precision=opt.precision,
        bn_mode=opt.bn_mode,
        bucket=opt.bucket,
        batch_sizes=ladder,
        tile=opt.tile,
        halo=opt.halo,
        mesh=mesh,
        spatial=opt.spatialShards > 1,
        output=opt.outputDtype,
        input=opt.inputDtype,
        auto_warm=(opt.autoWarm or bool(opt.http)) and not opt.noAutoWarm,
    )

    if opt.warmup:
        try:
            shapes = [
                tuple(int(d) for d in s.lower().split("x"))
                for s in opt.warmup.split(",") if s.strip()
            ]
            if any(len(s) != 2 for s in shapes):
                raise ValueError
        except ValueError:
            raise SystemExit(
                f"--warmup must look like '384x512,720x1280', got {opt.warmup!r}"
            )
    elif opt.http and not opt.noWarmup:
        # default-warm the full ladder at the bucket shape BEFORE binding
        # the port: an unwarmed server reachable on the network hits the
        # documented mid-run top-of-ladder compile (minutes over a
        # remote-compile link) the first time concurrency climbs a rung.
        # Pass --warmup with the real expected shapes for full coverage,
        # or --noWarmup to skip.
        shapes = [(opt.bucket, opt.bucket)]
    else:
        shapes = []
    if shapes:
        t0 = time.time()
        engine.warmup(shapes)
        print(
            f"warmed {len(shapes)} shape(s) x {len(engine.batch_sizes)} "
            f"ladder rungs in {time.time() - t0:.1f}s "
            f"({engine.stats['compiles']} compiles)"
        )

    if opt.http:
        from fdgan_tpu.serve_http import make_server, serve_forever

        server = make_server(
            engine,
            host=opt.httpHost,
            port=opt.http,
            max_wait=opt.maxWait if opt.maxWait > 0 else 0.05,
            depth=opt.depth,
            # POST /reload: zero-downtime hot-swap to a new checkpoint
            # (defaults to re-reading --netG — the keepBest promotion path)
            weight_loader=load_generator_params,
            weights_path=opt.netG,
        )
        serve_forever(server)
        return

    def load_all():
        for name in names:
            img = load_rgb_image(os.path.join(opt.inDir, name))  # fp32 [0,255]
            # uint8 engines take the decoder's bytes directly (exact — the
            # values are integral); float engines take [0,1]
            yield img.astype("uint8") if opt.inputDtype == "uint8" else img / 255.0

    t0 = time.time()
    results = engine.stream(load_all(), depth=opt.depth, max_wait=opt.maxWait)
    for name, out_name, out in zip(names, out_names, results):
        save_image_normalized(out, os.path.join(opt.outDir, out_name))
        print(name)
    dt = time.time() - t0
    print(
        f"{len(names)} images in {dt:.2f}s ({len(names)/dt:.2f} img/s); "
        f"compiled programs: {engine.stats['compiles']}, "
        f"padding overhead: {engine.stats['padded_frac']:.1%}"
    )


if __name__ == "__main__":
    main()
