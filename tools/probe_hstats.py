"""Probe: h-stats via moment matmuls (the last untried single-chip idea,
CLAUDE.md round-3 list / VERDICT r2 item 6).

Hypothesis: the per-channel BN batch statistics of a conv output h
(mean, E[h²] over B·H·W) could ride the MXU instead of the VPU — a single
Gram-style matmul  [h | 1]ᵀ [h | 1]  yields column sums (→ mean) and
diagonal second moments (→ E[h²]) in one read of h at matmul bandwidth,
possibly beating the two fused VPU reductions `_batch_stats` runs today
(which also read h once, at ~437 GB/s).

Variants at the block-1 norm2 shape (h = conv1 output, 8×256×256×128 bf16):
  A  current `_batch_stats` one-pass reductions (baseline)
  B  moments via two dots: ones@h and diag-free sum(h*h) … einsum
  C  single Gram (h'ᵀ h' with an appended ones column), fp32 accumulate
  D  conv1 + A fused end-to-end (what the model actually runs)
  E  conv1 + C end-to-end (can XLA overlap the Gram with the conv?)

Verdict criterion: E beats D by >3 % or it's a documented dead end.
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from fdgan_tpu.nn.layers import CONV_DIMS, _batch_stats

B, H, W, CIN, C = 8, 256, 256, 160, 128
M = B * H * W

k = jax.random.PRNGKey
u = lambda s, sh, dt=jnp.bfloat16: jax.random.uniform(k(s), sh, dt)


def timed(fn, args, label, nbytes=0, iters=20):
    @jax.jit
    def loop(*a):
        def body(i, c):
            outs = fn(a[0] + c * jnp.asarray(1e-6, a[0].dtype), *a[1:])
            acc = jnp.zeros((), jnp.float32)
            for o in jax.tree.leaves(outs):
                acc += jnp.max(jnp.abs(o)).astype(jnp.float32)
            return acc.astype(jnp.bfloat16)

        return lax.fori_loop(0, iters, body, jnp.zeros((), jnp.bfloat16))

    float(loop(*args))  # compile
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / iters
    bw = f"{nbytes / dt / 1e9:5.0f} GB/s" if nbytes else ""
    print(f"{label:46s} {dt * 1000:7.2f} ms  {bw}")
    return dt


def stats_reduce(h):
    return _batch_stats(h, (0, 1, 2))


def stats_two_dots(h):
    hf = h.reshape(M, C)
    s1 = jnp.sum(hf, axis=0, dtype=jnp.float32)
    s2 = jnp.einsum("mc,mc->c", hf, hf, preferred_element_type=jnp.float32)
    mean = s1 / M
    var = jnp.maximum(s2 / M - jnp.square(mean), 0.0)
    return mean, var


def stats_gram(h):
    hf = h.reshape(M, C)
    ones = jnp.ones((M, 1), h.dtype)
    ha = jnp.concatenate([hf, ones], axis=1)  # (M, C+1)
    gram = lax.dot_general(
        ha, ha, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (C+1, C+1)
    s1 = gram[C, :C]
    s2 = jnp.diagonal(gram)[:C]
    mean = s1 / M
    var = jnp.maximum(s2 / M - jnp.square(mean), 0.0)
    return mean, var


def conv1(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(0, 0), (0, 0)], dimension_numbers=CONV_DIMS
    )


def main():
    h = u(1, (B, H, W, C))
    x = u(2, (B, H, W, CIN))
    w = u(3, (1, 1, CIN, C))
    nb = M * C * 2  # one bf16 read of h

    # numeric agreement first
    ma, va = jax.jit(stats_reduce)(h)
    for name, fn in (("two_dots", stats_two_dots), ("gram", stats_gram)):
        m2, v2 = jax.jit(fn)(h)
        dm = float(jnp.max(jnp.abs(m2 - ma)))
        dv = float(jnp.max(jnp.abs(v2 - va)))
        print(f"{name}: max|Δmean| {dm:.2e}  max|Δvar| {dv:.2e}")

    timed(stats_reduce, (h,), "A  _batch_stats reductions", nb)
    timed(stats_two_dots, (h,), "B  two dots (sum + self-einsum)", nb)
    timed(stats_gram, (h,), "C  single Gram [h|1]ᵀ[h|1]", nb)
    dt_d = timed(
        lambda x, w: (lambda hh: (hh, *stats_reduce(hh)))(conv1(x, w)),
        (x, w),
        "D  conv1 + A (current model path)",
    )
    dt_e = timed(
        lambda x, w: (lambda hh: (hh, *stats_gram(hh)))(conv1(x, w)),
        (x, w),
        "E  conv1 + C (moment matmul)",
    )
    print(f"\nverdict: E/D = {dt_e / dt_d:.3f} ({'WIN — wire it' if dt_e < 0.97 * dt_d else 'dead end'})")


if __name__ == "__main__":
    main()
