"""Training-step throughput on the live chip (BASELINE config 4: full
adversarial training — G + fusion-D + SSIM; perceptual off without VGG
weights).

Timing methodology (r3 revision): `--iters` steps run ON DEVICE inside one
`lax.scan` (the state is the carry), so the whole measurement is a single
dispatch + one scalar fetch. The earlier one-dispatch-per-step loop was
**tunnel-dispatch-rate-bound**: a bare 4@256² forward read 71.7 ms/step
that way vs ~149/8 ≈ 19 ms of actual device compute — every historical
per-step train number measured through individual dispatches overstates
step time by up to ~70 ms on this platform.

--accum / --remat exercise the high-res memory levers (gradient
accumulation over microbatches, rematerialised G forward).

Ablation flags decompose the step for the roofline story: --advW/--ssimW 0
gate those loss graphs out entirely (losses/composite.py gates on weight>0),
--gOnly/--dOnly time the split G/D updates in isolation, --fwdOnly times the
bare generator forward at the same shape (the bench.py comparator)."""

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fdgan_tpu.losses.composite import LossWeights
from fdgan_tpu.train.loop import create_train_state, make_train_step


def _unjitted(fn):
    """The scan below inlines the step; use the unjitted body when the
    builder returned a jitted wrapper (avoids nested-jit donation noise)."""
    return getattr(fn, "__wrapped__", fn)


def _time_scan(state, body, iters, label, batch):
    """Run `iters` steps on-device in one lax.scan dispatch; report the
    best of 3 measurements. `body(carry, i) -> (carry, scalar)`."""

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(1,))
    def multi(st, n):
        st, outs = jax.lax.scan(body, st, jnp.arange(n))
        return st, outs[-1]

    state, out = multi(state, iters)  # compile + warm
    float(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, out = multi(state, iters)
        float(out)  # the only host sync
        best = min(best, time.perf_counter() - t0)
    print(
        f"{label}: {best / iters * 1000:.1f} ms/step → "
        f"{batch * iters / best:.2f} img/s (last loss {float(out):.3f})"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--height", type=int, default=0,
                    help="override H (e.g. an H-slab standing in for one "
                         "shard of a spatially-sharded step: 2048² 2-way "
                         "≈ 1024x2048 per shard)")
    ap.add_argument("--width", type=int, default=0, help="override W")
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--stages", action="store_true",
                    help="stage-level remat (remat='stages'): max memory, ~13% slower")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--advW", type=float, default=1.0)
    ap.add_argument("--ssimW", type=float, default=1.0)
    ap.add_argument("--pixelW", type=float, default=100.0)
    ap.add_argument("--gOnly", action="store_true", help="time the split G step alone")
    ap.add_argument("--dOnly", action="store_true", help="time the split D step alone")
    ap.add_argument("--fwdOnly", action="store_true",
                    help="time the bare generator forward (no grads/update)")
    args = ap.parse_args()

    remat = "stages" if args.stages else args.remat
    weights = LossWeights(
        adv=args.advW, pixel=args.pixelW, ssim=args.ssimW, perceptual=0.0
    )
    state, tx_g, tx_d = create_train_state(jax.random.PRNGKey(0))

    H = args.height or args.size
    W = args.width or args.size
    haze = jax.random.uniform(jax.random.PRNGKey(1), (args.batch, H, W, 3))
    gt = jax.random.uniform(jax.random.PRNGKey(2), (args.batch, H, W, 3))
    rng = jax.random.PRNGKey(3)
    desc = (
        f"{args.batch}@{H}x{W} bf16 accum={args.accum} remat={remat} "
        f"adv={args.advW} ssim={args.ssimW} pixel={args.pixelW}"
    )

    if args.fwdOnly:
        from fdgan_tpu.models import fdgan_fast
        from fdgan_tpu.nn.tree import cast_tree

        p16 = cast_tree(state.g_params, jnp.bfloat16)

        @partial(jax.jit, static_argnums=(2,))
        def loop(p, x, n):
            def body(i, carry):
                y = fdgan_fast.apply(p, (x + carry * jnp.asarray(1e-6, x.dtype)).astype(jnp.bfloat16))
                return jnp.max(jnp.abs(y)).astype(x.dtype)

            return jax.lax.fori_loop(0, n, body, jnp.zeros((), x.dtype))

        float(loop(p16, haze, args.iters))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(p16, haze, args.iters))
            best = min(best, time.perf_counter() - t0)
        print(f"G forward only {desc}: {best / args.iters * 1000:.1f} ms/step → "
              f"{args.batch * args.iters / best:.2f} img/s")
        return

    if args.gOnly or args.dOnly:
        from fdgan_tpu.train.loop import make_gd_steps

        g_step, d_step = make_gd_steps(
            tx_g, tx_d, weights, compute_dtype=jnp.bfloat16, remat=remat
        )
        if args.gOnly:
            g_body = _unjitted(g_step)

            def body(st, i):
                st, metrics, _x_hat = g_body(st, haze, gt)
                return st, metrics["g_total"]

            _time_scan(state, body, args.iters, f"G step only {desc}", args.batch)
        else:
            fake = jax.random.uniform(
                jax.random.PRNGKey(4), (args.batch, H, W, 3), minval=-1.0
            )
            d_body = _unjitted(d_step)

            def body(st, i):
                st, metrics = d_body(st, fake, gt)
                return st, metrics["d_total"]

            _time_scan(state, body, args.iters, f"D step only {desc}", args.batch)
        return

    step = make_train_step(
        tx_g, tx_d, weights, compute_dtype=jnp.bfloat16,
        accum_steps=args.accum, remat=remat,
    )
    step_body = _unjitted(step)

    def body(st, i):
        st, metrics = step_body(st, haze, gt, jax.random.fold_in(rng, i))
        return st, metrics["g_total"]

    _time_scan(state, body, args.iters, f"train step {desc}", args.batch)


if __name__ == "__main__":
    main()
