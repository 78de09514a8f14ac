"""Throughput of an AOT-exported StableHLO artifact vs the live jit.

Answers the deployment question: does serving from the self-contained
artifact (io/export.py — no model code, weights baked as constants) cost
anything over the live ``fdgan_fast`` jit?  ``Exported.call`` is traceable,
so the artifact drops into the same on-device ``lax.fori_loop`` timing
harness as bench.py (the only sound methodology on this tunnel-attached
platform — see CLAUDE.md).

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_export.py \
        [--batch 8 --size 512 --iters 20]
"""

from __future__ import annotations

import argparse
import os
import time
from functools import partial


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--iters", type=int, default=20)
    opt = p.parse_args(argv)

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fdgan_tpu.io.export import export_forward
    from fdgan_tpu.models import fdgan, fdgan_fast
    from fdgan_tpu.nn.tree import cast_tree

    params = fdgan.init(jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    exported = export_forward(
        params, image_size=opt.size, batch=opt.batch, precision="bf16"
    )
    print(f"export (lowering only): {time.perf_counter() - t0:.1f}s, "
          f"{len(exported.serialize())/1e6:.1f} MB serialized")

    # the artifact's contract is fp32 in/out; the live comparator uses the
    # same boundary so both loops carry identical casts
    p16 = cast_tree(params, jnp.bfloat16)

    def live_fwd(x):
        y = fdgan_fast.apply(p16, x.astype(jnp.bfloat16), bn_mode="batch")
        return y.astype(jnp.float32)

    def timed(fwd, x, iters):
        @partial(jax.jit, static_argnums=(1,))
        def loop(x, n):
            def body(i, carry):
                y = fwd(x + carry * jnp.asarray(1e-6, x.dtype))
                return jnp.max(jnp.abs(y)).astype(x.dtype)

            return jax.lax.fori_loop(0, n, body, jnp.zeros((), x.dtype))

        float(loop(x, iters))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(x, iters))
            best = min(best, time.perf_counter() - t0)
        return opt.batch * iters / best

    x = jax.random.uniform(
        jax.random.PRNGKey(1), (opt.batch, opt.size, opt.size, 3), jnp.float32
    )
    art = timed(exported.call, x, opt.iters)
    live = timed(live_fwd, x, opt.iters)
    print(
        f"artifact: {art:.1f} img/s   live jit: {live:.1f} img/s   "
        f"ratio {art / live:.3f}  ({opt.batch}x{opt.size}^2 bf16)"
    )


if __name__ == "__main__":
    main()
