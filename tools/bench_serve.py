"""Serving-engine throughput at production shapes (512², bf16, batch 8).

Methodology caveat (CLAUDE.md): this platform's per-dispatch latency is
~100-140 ms and `block_until_ready` does not block, so a streamed pipeline
measurement here is a LOWER bound — each per-batch result fetch is a
device→host sync. The engine's dispatch-ahead (`depth`) overlaps staging
with compute; the bench reports img/s over a long stream, end to end
(staging + pad + upload + compute + fetch), which is the number a serving
user actually gets.
"""
import argparse
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from fdgan_tpu.models import fdgan
from fdgan_tpu.serve import InferenceEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--nimg", type=int, default=96)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--bn_mode", default="running")
    args = ap.parse_args()

    params = fdgan.init(jax.random.PRNGKey(0))
    eng = InferenceEngine(
        params,
        precision="bf16",
        bn_mode=args.bn_mode,
        bucket=64,
        batch_sizes=(args.batch,),
    )
    rng = np.random.default_rng(0)
    imgs = [rng.uniform(size=(args.size, args.size, 3)).astype(np.float32)
            for _ in range(args.nimg)]

    eng.warmup([(args.size, args.size)], batch=args.batch)
    t0 = time.perf_counter()
    n = sum(1 for _ in eng.stream(iter(imgs), depth=args.depth))
    dt = time.perf_counter() - t0
    assert n == args.nimg
    print(f"serve stream: {n} imgs @{args.size}² batch {args.batch} depth {args.depth} "
          f"({args.bn_mode} BN): {n/dt:.1f} img/s end-to-end ({dt:.2f}s)")
    print("stats:", eng.stats)


if __name__ == "__main__":
    main()
