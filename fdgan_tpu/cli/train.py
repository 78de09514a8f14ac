"""Training CLI — the reconstructed FD-GAN adversarial loop (SURVEY.md §3.4;
the reference never published its train script). Flag names follow the
reference's conventions (demo.py:28-51) plus loss-weight flags for the
unpublished weights (SURVEY.md §7.3 hard part #4).

Runs data-parallel over all visible devices via a jax.sharding Mesh; bf16
compute optional; per-epoch native checkpoints with resume.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="pix2pix")
    p.add_argument("--dataroot", default="", help="path to train dataset")
    p.add_argument("--valDataroot", default="")
    p.add_argument("--batchSize", type=int, default=8)
    p.add_argument("--originalSize", type=int, default=286)
    p.add_argument("--imageSize", type=int, default=256)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lrD", type=float, default=0.0002)
    p.add_argument("--lrG", type=float, default=0.0002)
    p.add_argument("--beta1", type=float, default=0.5)
    p.add_argument("--annealStart", type=int, default=0,
                   help="optimizer step at which linear LR decay begins "
                        "(0 = decay off — the reference's default of never "
                        "calling adjust_learning_rate)")
    p.add_argument("--annealEvery", type=int, default=400,
                   help="decay reaches 0 this many steps after --annealStart "
                        "(linear, init_lr/annealEvery per step — "
                        "misc.py:164-172)")
    p.add_argument("--netG", default="", help="resume generator checkpoint")
    p.add_argument("--netD", default="", help="resume discriminator checkpoint")
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--exp", default="./checkpoints_fdgan")
    p.add_argument("--display", type=int, default=5,
                   help="accepted for reference-flag compatibility (the "
                        "reference's visdom display cadence); logging here "
                        "is JSONL via --logEvery")
    p.add_argument("--evalIter", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    # loss weights (unpublished in the reference — exposed as flags)
    p.add_argument("--lambdaAdv", type=float, default=1.0)
    p.add_argument("--lambdaPixel", type=float, default=100.0)
    p.add_argument("--pixelNorm", choices=["l1", "mse"], default="l1")
    p.add_argument("--lambdaPerceptual", type=float, default=1.0)
    p.add_argument("--lambdaSSIM", type=float, default=1.0)
    p.add_argument("--lambdaCX", type=float, default=0.0)
    p.add_argument("--vggWeights", default="", help=".pth VGG16 weights (perceptual loss off if empty)")
    # TPU-native knobs
    p.add_argument("--precision", choices=["fp32", "bf16"], default="fp32")
    p.add_argument("--poolSize", type=int, default=50)
    p.add_argument("--logEvery", type=int, default=10)
    p.add_argument("--debugNans", action="store_true", help="enable jax_debug_nans NaN screen")
    p.add_argument("--accumSteps", type=int, default=1,
                   help="accumulate G grads over this many microbatches "
                        "(activation-memory lever for high-res; batchSize "
                        "must divide by it; not combined with --poolSize)")
    p.add_argument("--rematStages", action="store_true",
                   help="also checkpoint whole encoder stages (max-memory "
                        "remat: fits 1536² microbatches; ~13%% slower)")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the G forward (recompute activations in "
                        "backward — trades FLOPs for memory at high res)")
    p.add_argument("--impl", choices=["xla", "pallas"], default="xla",
                   help="generator forward implementation (pallas = fused dense-layer kernels)")
    p.add_argument("--clipGrad", type=float, default=0.0,
                   help="global-norm gradient clip (0 = off); stabilises bf16 GAN training")
    p.add_argument("--dcganInit", action="store_true",
                   help="re-draw conv/BN weights with the reference's DCGAN "
                        "init (misc.py:16-22: conv~N(0,.02), BN scale~N(1,.02), "
                        "bias 0) before training — D fully, G except the "
                        "pretrained densenet121 encoder; deterministic per "
                        "--seed")
    p.add_argument("--labelSmooth", type=float, default=1.0,
                   help="real label for the D loss (< 1 = one-sided label "
                        "smoothing; prevents D saturating on real samples)")
    p.add_argument("--keepBest", action="store_true",
                   help="track the generator at the best val PSNR (device "
                        "references only — no extra tunnel traffic) and save "
                        "it as netG_best.msgpack at exit, loadable via "
                        "--netG / cli.demo. The 12800-step decay artifact "
                        "(artifacts/README.md) shows the best model sits "
                        "mid-schedule, not at the end. Note: the snapshot "
                        "(~160 MB of G params) stays in HBM, replicated "
                        "per-chip under --spatialShards — next to a tight "
                        "high-res activation budget, prefer per-epoch "
                        "checkpoints + post-hoc selection")
    p.add_argument("--ckptEvery", type=int, default=1,
                   help="save a checkpoint every N epochs (a final one is "
                        "always written). On this platform a save fetches "
                        "the full G+D+opt state over a ~4 MB/s tunnel, so "
                        "small-epoch runs should raise this. Device-resident "
                        "runs overlap that fetch with the next training "
                        "chunk (io/checkpoint.AsyncCheckpointer) unless "
                        "--noAsyncCkpt")
    p.add_argument("--noAsyncCkpt", action="store_true",
                   help="block training during checkpoint saves instead of "
                        "writing them from a background thread (device-"
                        "resident path only; the on-device snapshot an async "
                        "save takes briefly doubles the state's HBM footprint)")
    p.add_argument("--deviceSteps", type=int, default=0,
                   help="device-resident training: upload the WHOLE dataset "
                        "to HBM once and run this many train steps per "
                        "dispatch inside one lax.scan — removes the "
                        "per-step host dispatch floor (~70 ms) and the "
                        "per-batch upload (~4 MB/s) of this platform's "
                        "tunnel; needs a dataset that fits in HBM. With "
                        "--poolSize > 0 the ImagePool rides along as a "
                        "device-resident replay buffer in the scan carry")
    p.add_argument("--spatialShards", type=int, default=1,
                   help="shard the image H axis across this many devices "
                        "(mesh 'spatial' axis; GSPMD inserts the conv halo "
                        "exchanges) — the memory lever for >1536² training; "
                        "composes with --rematStages/--accumSteps")
    return p


def main(argv=None):
    opt = build_parser().parse_args(argv)
    print(opt)
    if opt.poolSize > 0 and opt.accumSteps > 1:
        raise SystemExit(
            "--accumSteps > 1 requires --poolSize 0 (the ImagePool G/D split "
            "does not accumulate; it would silently ignore the flag)"
        )

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fdgan_tpu.cli._common import enable_compile_cache

    if os.environ.get("FDGAN_TPU_PLATFORM"):
        # the axon plugin's sitecustomize overrides JAX_PLATFORMS; this is
        # the config-level override that actually wins (multi-process CPU
        # tests and debugging)
        jax.config.update("jax_platforms", os.environ["FDGAN_TPU_PLATFORM"])
    enable_compile_cache()
    if opt.debugNans:
        jax.config.update("jax_debug_nans", True)
    if opt.precision == "fp32":
        # true fp32 conv accumulation (XLA TPU defaults to bf16 passes)
        jax.config.update("jax_default_matmul_precision", "highest")

    from fdgan_tpu.data import get_loader
    from fdgan_tpu.dist.mesh import (
        make_mesh,
        maybe_init_distributed,
        shard_batch,
        shard_params,
    )
    from fdgan_tpu.io.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
    from fdgan_tpu.losses.composite import LossWeights

    # multi-process entry (FDGAN_TPU_DIST=1 + coordinates env, e.g. a v5e
    # pod slice across hosts, or the 2-process CPU parity test) — must run
    # before anything touches a backend
    maybe_init_distributed()
    nprocs = jax.process_count()
    pid = jax.process_index()
    is_main = pid == 0
    if nprocs > 1:
        if opt.deviceSteps > 0:
            raise SystemExit(
                "--deviceSteps stages the dataset on locally-addressable "
                "devices and is single-process for now; drop it under "
                "FDGAN_TPU_DIST"
            )
        if opt.batchSize % nprocs:
            raise SystemExit(
                f"--batchSize {opt.batchSize} (global) must divide by the "
                f"{nprocs} processes"
            )
        if opt.spatialShards > 1:
            # the loader feeds each process DIFFERENT full-H images; an
            # H-sharded global array would stack them as bands of one
            # frankensteined (nprocs*H)-tall image with no error. SP across
            # processes is exercised at the library level (tests/mp_worker.py
            # slices true H-bands); the data path here is DP-only.
            raise SystemExit(
                "--spatialShards > 1 is single-process only: the h5 loader "
                "shards IMAGES per process, not image bands"
            )
        print(f"multi-process: {nprocs} processes x "
              f"{len(jax.local_devices())} local devices = "
              f"{len(jax.devices())} global; this is process {pid}")
    from fdgan_tpu.train.loop import create_train_state, make_train_step
    from fdgan_tpu.train.meters import AverageMeter, MetricLogger, create_exp_dir

    create_exp_dir(opt.exp)
    rng = jax.random.PRNGKey(opt.seed)

    local_batch = opt.batchSize // nprocs  # == batchSize single-process
    loader = get_loader(
        opt.dataset,
        opt.dataroot,
        opt.originalSize,
        opt.imageSize,
        batch_size=local_batch,
        workers=opt.workers,
        split="train",
        shuffle=True,
        seed=opt.seed,  # same seed everywhere: shards stay step-aligned
        shard=(pid, nprocs),
    )

    state, tx_g, tx_d = create_train_state(
        rng,
        lr_g=opt.lrG,
        lr_d=opt.lrD,
        beta1=opt.beta1,
        decay_every=opt.annealEvery if opt.annealStart else 0,
        decay_start=opt.annealStart,
        clip_grad=opt.clipGrad,
    )
    if opt.dcganInit:
        # the reference applies weights_init right after construction
        # (SURVEY §3.4; misc.py:16-22) — D fully, G only on the fresh
        # decoder/refinement layers (the densenet121 encoder is pretrained,
        # dehaze1113.py:707-728). Runs before any resume, so a loaded
        # checkpoint below still wins.
        from fdgan_tpu.nn.init import DENSENET_PRETRAINED_KEYS, dcgan_init

        init_rng = jax.random.fold_in(rng, 0x0DC6A)
        state.g_params = dcgan_init(
            init_rng, state.g_params, skip=DENSENET_PRETRAINED_KEYS
        )
        state.d_params = dcgan_init(jax.random.fold_in(init_rng, 1), state.d_params)

    # resume: native checkpoint dir or reference .pth
    if opt.netG:
        from fdgan_tpu.cli._common import load_generator_params

        state.g_params = load_generator_params(opt.netG)
    if opt.netD:
        # discriminator params-only msgpack (the reference never shipped D
        # checkpoints, so there is no .pth layout to import; demo.py:47
        # documents the flag as "to continue training")
        from fdgan_tpu.io.checkpoint import load_checkpoint as _load_params

        state.d_params = _load_params(opt.netD, state.d_params)
    ckpt = latest_checkpoint(opt.exp)
    if ckpt:
        state = load_checkpoint(ckpt, state)
        print(f"resumed from {ckpt} at step {int(state.step)}")

    vgg_params = None
    if opt.vggWeights:
        from fdgan_tpu.io.torch_import import convert_vgg16

        vgg_params = convert_vgg16(opt.vggWeights)
    elif opt.lambdaPerceptual > 0:
        print(
            "WARNING: --lambdaPerceptual > 0 but no --vggWeights given; the "
            "perceptual loss is OFF. Supply a VGG16 .pth in either the "
            "reference's Vgg16 format or stock torchvision format "
            "(io.torch_import.convert_vgg16 accepts both)."
        )

    weights = LossWeights(
        adv=opt.lambdaAdv,
        pixel=opt.lambdaPixel,
        pixel_norm=opt.pixelNorm,
        perceptual=opt.lambdaPerceptual,
        ssim=opt.lambdaSSIM,
        contextual=opt.lambdaCX,
    )
    compute_dtype = jnp.bfloat16 if opt.precision == "bf16" else jnp.float32
    remat = "stages" if opt.rematStages else opt.remat
    use_pool = opt.poolSize > 0
    if use_pool:
        from fdgan_tpu.train.loop import make_gd_steps
        from fdgan_tpu.train.pool import ImagePool

        g_step, d_step = make_gd_steps(
            tx_g, tx_d, weights, vgg_params, compute_dtype,
            impl=opt.impl, remat=remat, real_label=opt.labelSmooth,
        )
        pool = ImagePool(opt.poolSize, seed=opt.seed)
    else:
        train_step = make_train_step(
            tx_g, tx_d, weights, vgg_params, compute_dtype,
            impl=opt.impl, remat=remat, accum_steps=opt.accumSteps,
            real_label=opt.labelSmooth,
        )

    # data × spatial mesh: DP over the largest device count that divides the
    # batch, optional SP sharding of the image H axis (--spatialShards) —
    # GSPMD inserts the conv halo exchanges (parity: tests/test_dist.py)
    n_dev = len(jax.devices())
    n_sp = opt.spatialShards
    if n_sp < 1 or n_dev % n_sp:
        raise SystemExit(
            f"--spatialShards {n_sp} must divide the device count {n_dev}"
        )
    n_data = n_dev // n_sp
    if nprocs > 1:
        # no truncated-mesh fallback across processes: a device subset that
        # excludes some of one process's devices can't be fed by
        # make_array_from_process_local_data (each process contributes a
        # fixed local_batch); demand an exactly divisible global batch
        if opt.batchSize % n_data:
            raise SystemExit(
                f"multi-process: --batchSize {opt.batchSize} (global) must "
                f"divide by the {n_data} global data shards"
            )
    else:
        while opt.batchSize % n_data:
            n_data -= 1
    mesh = make_mesh(n_data=n_data, n_spatial=n_sp, devices=jax.devices()[: n_data * n_sp])
    if n_data * n_sp < n_dev:
        print(f"note: batchSize {opt.batchSize} not divisible by {n_dev // n_sp} "
              f"data shards; using mesh {n_data}x{n_sp}")
    if n_sp > 1:
        if opt.imageSize % n_sp:
            raise SystemExit(
                f"--spatialShards {n_sp} must divide --imageSize "
                f"{opt.imageSize} (H-sharded device_put rejects uneven "
                f"shardings)"
            )
        if (opt.imageSize // 8) % n_sp:
            print(f"note: imageSize/8 = {opt.imageSize // 8} not divisible by "
                  f"{n_sp} spatial shards — the deepest stage pads/reshards")
        print(f"spatial sharding: H axis over {n_sp} devices (mesh {n_data}x{n_sp})")
    state.g_params = shard_params(state.g_params, mesh)
    state.d_params = shard_params(state.d_params, mesh)

    if is_main:
        logger = MetricLogger(os.path.join(opt.exp, "train_log.jsonl"), opt.logEvery)
    else:
        # non-main processes run the same collective program but write
        # nothing (a shared exp dir would otherwise interleave JSONL lines)
        class _NullLogger:
            def log(self, *a, **k):
                pass

            def close(self):
                pass

        logger = _NullLogger()
    meter = AverageMeter()
    step_rng = jax.random.PRNGKey(opt.seed + 1)

    val_loader = None
    if opt.valDataroot:
        val_loader = get_loader(
            opt.dataset, opt.valDataroot, opt.imageSize, opt.imageSize,
            batch_size=1, workers=1, split="val", shuffle=False,
        )

    from fdgan_tpu.models import fdgan_fast

    eval_fwd = jax.jit(lambda p, v: fdgan_fast.apply(p, v))

    def evaluate(g_params):
        """PSNR/SSIM on the val set with the current generator (evalIter hook,
        reference flag demo.py:50)."""
        from fdgan_tpu.ops.metrics import psnr
        from fdgan_tpu.ops.ssim import ssim as ssim_fn

        fwd = eval_fwd
        psnrs, ssims = [], []
        for haze, gt_v in val_loader:
            x_hat = fwd(g_params, jnp.asarray(haze))
            x01 = np.asarray((x_hat + 1.0) * 0.5)
            psnrs.append(psnr(np.clip(x01, 0, 1), np.asarray(gt_v)))
            ssims.append(float(ssim_fn(jnp.clip((x_hat + 1) * 0.5, 0, 1), jnp.asarray(gt_v))))
        return float(np.mean(psnrs)), float(np.mean(ssims))

    evaluate_fn = evaluate
    if val_loader is not None:
        # device-resident eval for ANY uniform-shape val set (streaming
        # path included — VERDICT r3 weak #4): stage the val set once,
        # fetch two scalars per eval instead of every generated image
        # (the host loop pays the ~4 MB/s tunnel per image here;
        # train/loop.make_device_eval). Ragged shapes keep the host loop.
        try:
            vh = np.stack([np.asarray(h) for h, _ in val_loader])
            vg = np.stack([np.asarray(g) for _, g in val_loader])
        except ValueError:  # ragged val shapes — keep the host loop
            vh = vg = None
        if vh is not None and vh.nbytes + vg.nbytes > 2e9:
            # mirror the --deviceSteps staging guard: a big val set must
            # stream through the host loop, not permanently crowd training
            # state out of HBM (ADVICE r4)
            print(
                f"val set is {(vh.nbytes + vg.nbytes)/1e9:.1f} GB stacked — "
                "using the streaming host eval loop instead of staging it"
            )
            vh = vg = None
        if vh is not None and nprocs == 1:
            from fdgan_tpu.train.loop import make_device_eval

            dev_eval = make_device_eval(vh, vg)
            evaluate_fn = lambda p: tuple(float(x) for x in dev_eval(p))
    if nprocs > 1 and val_loader is not None:
        # multi-process: the generator params are GLOBAL (replicated)
        # arrays — a local, non-collective eval jit can't take them.
        # They're fully replicated, so fetch once per eval and run the
        # host-loop eval on local devices (main process only).
        _host_eval = evaluate

        def evaluate_fn(g_params):
            return _host_eval(jax.device_get(g_params))

    # --keepBest: snapshot the generator at the best val PSNR seen so far.
    # The train step donates its state, so a held reference would be a
    # deleted buffer one dispatch later — take a device-side copy instead
    # (ONE jitted dispatch for the whole tree; nothing crosses the host
    # link until the single save at exit).
    if opt.keepBest and (not opt.valDataroot or not opt.evalIter):
        raise SystemExit(
            "--keepBest needs --valDataroot and a nonzero --evalIter "
            "(best-model selection is by val PSNR)"
        )
    best = {"psnr": float("-inf"), "params": None, "step": 0}
    best_path = os.path.join(opt.exp, "netG_best.msgpack")
    if opt.keepBest and os.path.exists(best_path + ".json"):
        # resuming into an exp dir that already holds a best: seed the bar
        # from the sidecar so a worse continuation can't clobber it
        with open(best_path + ".json") as f:
            prev = json.load(f)
        best.update(psnr=prev["psnr"], step=prev["step"])
        print(f"existing best kept as the bar: {prev['psnr']:.2f} dB @ {prev['step']}")
    if nprocs > 1:
        # a local jit can't copy global arrays; they're replicated, so a
        # host fetch is the snapshot (slower, but correct and rare)
        copy_tree = jax.device_get
    else:
        copy_tree = jax.jit(lambda t: jax.tree.map(lambda x: x.copy(), t))

    def track_best(psnr, g_params, step):
        if opt.keepBest and psnr > best["psnr"]:
            best.update(psnr=psnr, params=copy_tree(g_params), step=step)

    def save_best():
        if best["params"] is None or best.get("saved") or not is_main:
            return
        best["saved"] = True
        save_checkpoint(best_path, best["params"])
        with open(best_path + ".json", "w") as f:
            json.dump({"psnr": best["psnr"], "step": best["step"]}, f)
        print(
            f"best generator (val PSNR {best['psnr']:.2f} @ step "
            f"{best['step']}) -> {best_path}"
        )

    def _save_best_at_exit():
        # a killed/crashed run (tunnel wedge, compile-helper 500, ^C —
        # all documented realities here) must not lose the tracked best
        try:
            save_best()
        except Exception as e:  # device unreachable / exp dir gone
            print(f"keepBest: could not save at exit: {e}")

    if opt.keepBest:
        import atexit

        atexit.register(_save_best_at_exit)

    if val_loader is not None and opt.evalIter and is_main:
        # step-0 baseline so the logged val trend is self-contained
        v_psnr, v_ssim = evaluate_fn(state.g_params)
        logger.log(int(state.step), {"val_psnr": v_psnr, "val_ssim": v_ssim})
        track_best(v_psnr, state.g_params, int(state.step))

    if opt.deviceSteps > 0:
        # device-resident loop: dataset lives in HBM, deviceSteps train
        # steps per dispatch (train/loop.py::make_device_loop). The host
        # only ships a shuffled index vector out and per-step scalar
        # metrics back. With --poolSize > 0 the ImagePool is carried
        # through the scan as a device-resident replay buffer
        # (make_device_pool_loop) — the D-stabiliser the reference trains
        # with, kept on device.
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from fdgan_tpu.train.loop import make_device_loop, make_device_pool_loop
        from fdgan_tpu.train.pool import device_pool_init

        batches = [
            (np.asarray(h), np.asarray(g))
            for h, g in loader
            if h.shape[0] == opt.batchSize
        ]
        if not batches:
            raise SystemExit("no full batches to stage for --deviceSteps")
        haze_np = np.stack([h for h, _ in batches])
        gt_np = np.stack([g for _, g in batches])
        if compute_dtype == jnp.bfloat16:
            # the train step casts both inputs to bf16 anyway (identical
            # round-to-nearest on host or device), so stage pre-cast:
            # half the HBM footprint and half the one-time staging upload
            import ml_dtypes

            haze_np = haze_np.astype(ml_dtypes.bfloat16)
            gt_np = gt_np.astype(ml_dtypes.bfloat16)
        nbytes = haze_np.nbytes + gt_np.nbytes
        if nbytes > 6e9:
            raise SystemExit(
                f"--deviceSteps dataset is {nbytes/1e9:.1f} GB stacked — too "
                "large to stage in HBM next to the model; use the streaming "
                "path (omit --deviceSteps)"
            )
        spec = P(None, "data", "spatial") if n_sp > 1 else P(None, "data")
        sharding = NamedSharding(mesh, spec)
        print(
            f"staging {len(batches)} batches ({nbytes/1e6:.0f} MB) on device; "
            f"{opt.deviceSteps} steps/dispatch"
        )
        haze_all = jax.device_put(jnp.asarray(haze_np), sharding)
        gt_all = jax.device_put(jnp.asarray(gt_np), sharding)
        del haze_np, gt_np, batches

        K = opt.deviceSteps
        nb = haze_all.shape[0]
        if use_pool:
            pool_buf, n_filled = device_pool_init(
                opt.poolSize, haze_all.shape[1:], compute_dtype
            )
            # pool axis replicated, batches keep the mesh layout
            pool_buf = jax.device_put(pool_buf, sharding)
            run_pool = make_device_pool_loop(g_step, d_step, K)
        else:
            run = make_device_loop(train_step, K)
        total = opt.epochs * nb
        n_chunks = (total + K - 1) // K
        host_rng = np.random.default_rng(opt.seed + 2)
        # concatenated per-epoch shuffles, padded to a whole chunk (the
        # pad walks into one extra epoch's shuffle — a few surplus steps)
        seq = np.concatenate(
            [host_rng.permutation(nb) for _ in range(opt.epochs + K // nb + 1)]
        ).astype(np.int32)
        data_rng = jax.random.PRNGKey(opt.seed + 3)
        if opt.noAsyncCkpt:
            ckpt_saver = None
        else:
            from fdgan_tpu.io.checkpoint import AsyncCheckpointer

            ckpt_saver = AsyncCheckpointer()
        last_saved_step = -1
        for c in range(n_chunks):
            before = int(state.step)
            t_chunk = time.time()
            idx = jnp.asarray(seq[c * K : (c + 1) * K])
            if use_pool:
                state, pool_buf, n_filled, ms = run_pool(
                    state, pool_buf, n_filled, haze_all, gt_all, idx,
                    jnp.asarray(before, jnp.int32), data_rng,
                )
            else:
                state, ms = run(
                    state, haze_all, gt_all, idx,
                    jnp.asarray(before, jnp.int32), data_rng,
                )
            ms = {k: np.asarray(v) for k, v in ms.items()}
            # wall covers the scan dispatch + metric fetch only (eval /
            # checkpoint I/O below is tunnel-bound and reported separately)
            wall = time.time() - t_chunk
            for j in range(K):
                s = before + j + 1
                if s % opt.logEvery == 0:
                    entry = {k: float(v[j]) for k, v in ms.items()}
                    entry["imgs_per_sec"] = K * opt.batchSize / wall
                    logger.log(s, entry)
            meter.update(float(ms["g_total"].mean()))
            after = before + K
            if val_loader is not None and opt.evalIter and (
                after // opt.evalIter > before // opt.evalIter
            ):
                v_psnr, v_ssim = evaluate_fn(state.g_params)
                logger.log(after, {"val_psnr": v_psnr, "val_ssim": v_ssim})
                track_best(v_psnr, state.g_params, after)
            if after // nb > before // nb:  # crossed >=1 epoch boundary
                # a save fetches the whole state over the tunnel — honor
                # --ckptEvery (counted in epochs; final save always happens)
                if (after // nb) % max(opt.ckptEvery, 1) == 0:
                    t_save = time.time()
                    if ckpt_saver is not None:
                        # snapshot on device now; fetch + write overlap the
                        # next chunk's scan instead of stalling for it
                        ckpt_saver.save(opt.exp, state, step=after)
                        print(f"ckpt step {after}: snapshot queued in "
                              f"{time.time() - t_save:.1f}s (background write)")
                    else:
                        save_checkpoint(opt.exp, state, step=after)
                        print(f"ckpt step {after}: saved in "
                              f"{time.time() - t_save:.1f}s (blocking)")
                    last_saved_step = after
                print(
                    f"epoch {min(after // nb, opt.epochs) - 1} done "
                    f"({K * opt.batchSize / wall:.1f} img/s device-resident); "
                    f"avg g_loss {meter.avg:.4f}"
                )
        if ckpt_saver is not None:
            ckpt_saver.wait()  # surface any writer error before the final save
        if last_saved_step != int(state.step):
            # (an epoch-boundary save of this exact step already landed —
            # don't pay the ~200 MB tunnel fetch twice for the same state)
            save_checkpoint(opt.exp, state, step=int(state.step))
        save_best()
        if opt.keepBest:
            import atexit

            atexit.unregister(_save_best_at_exit)
        logger.close()
        return

    t_log = time.time()
    for epoch in range(opt.epochs):
        t_epoch = time.time()
        for haze, gt in loader:
            if nprocs > 1:
                if haze.shape[0] != local_batch:
                    continue  # ragged LOCAL batch (same skip on every process
                    # — shards are equal-length and share the shuffle seed)
            elif haze.shape[0] % n_data or haze.shape[0] % opt.accumSteps:
                continue  # ragged final batch (DP shards / accum microbatches)
            batch = shard_batch((haze, gt), mesh, spatial=n_sp > 1)
            step_rng, sub = jax.random.split(step_rng)
            if use_pool:
                state, metrics, x_hat = g_step(state, batch[0], batch[1])
                fake_src = jax.lax.stop_gradient(x_hat)
                if nprocs > 1:
                    # each process pools its LOCAL shard of the fakes (the
                    # global array spans non-addressable devices); per-
                    # process history is the sharded-pool equivalent
                    fake_src = np.concatenate(
                        [np.asarray(s.data) for s in fake_src.addressable_shards]
                    )
                fake = pool.query(fake_src)  # tanh range, remapped inside d loss
                # the pool round-trips through the host — re-shard the fake
                # batch so the D step keeps the mesh layout (matters for SP)
                fake = shard_batch(fake, mesh, spatial=n_sp > 1)
                state, d_metrics = d_step(state, fake, batch[1])
                metrics = {**metrics, **d_metrics}
            else:
                state, metrics = train_step(state, batch[0], batch[1], sub)
            step = int(state.step)
            if step % opt.logEvery == 0:
                m = {k: float(v) for k, v in metrics.items()}
                # global batch rows = local rows x processes
                m["imgs_per_sec"] = haze.shape[0] * nprocs * opt.logEvery / max(time.time() - t_log, 1e-9)
                t_log = time.time()
                logger.log(step, m)
                meter.update(m.get("g_total", 0.0))
            if (val_loader is not None and opt.evalIter
                    and step % opt.evalIter == 0 and is_main):
                v_psnr, v_ssim = evaluate_fn(state.g_params)
                logger.log(step, {"val_psnr": v_psnr, "val_ssim": v_ssim})
                track_best(v_psnr, state.g_params, step)
        if is_main and ((epoch + 1) % max(opt.ckptEvery, 1) == 0 or epoch == opt.epochs - 1):
            save_checkpoint(opt.exp, state, step=int(state.step))
        if is_main:
            print(f"epoch {epoch} done in {time.time() - t_epoch:.1f}s; avg g_loss {meter.avg:.4f}")
    save_best()
    if opt.keepBest:
        import atexit

        atexit.unregister(_save_best_at_exit)
    logger.close()


if __name__ == "__main__":
    main()
