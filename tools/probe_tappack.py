"""Attack the conv3x3 128->32 MXU-starvation floor (N=32 fills 1/4 of the
systolic array; measured 22.9 TF/s in probe_convs.py).

Candidates, all at block1 shapes (8x512x512x128 -> 32):

  a) lax.conv baseline
  b) tap-packed matmul: one (BHW,128)@(128,288) matmul (N=288 — all 9 taps'
     contributions at once, full MXU), then 9 shift-adds of 32-ch slices.
     True FLOPs, extra HBM traffic for the 288-ch intermediate.
  c) dy-grouped: 3 matmuls (128->96, one per kernel row, N=96) + 3 vertical
     shifts + in-register W shifts.
  d) W2-composed widening: conv of 4 layers' worth... (skipped — sequential
     dependency makes it impossible; kept here as a note)
  e) pair-packed taps N=64..160 sweep to find the XLA sweet spot
"""
import time
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from fdgan_tpu.nn.layers import CONV_DIMS

B, H, W, C, F = 8, 512, 512, 128, 32


def timed(fn, args, label, flops=0, nbytes=0, iters=10):
    @jax.jit
    def loop(*a):
        def body(i, c):
            y = fn(a[0] + c * jnp.asarray(1e-6, a[0].dtype), *a[1:])
            return jnp.max(jnp.abs(y)).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.bfloat16))
    float(loop(*args))
    t0 = time.perf_counter(); float(loop(*args)); dt = (time.perf_counter() - t0) / iters
    print(f"{label:44s} {dt*1000:7.2f} ms  {flops/dt/1e12:6.1f} TF/s  {nbytes/dt/1e9:5.0f} GB/s", flush=True)


k = jax.random.PRNGKey
u = lambda s, sh, dt=jnp.bfloat16: jax.random.uniform(k(s), sh, dt)

x = u(1, (B, H, W, C))
w = u(2, (3, 3, C, F))
fl = 2 * B * H * W * 9 * C * F
nb = B * H * W * (C + F) * 2

# (a) baseline
timed(lambda x, w: lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                            dimension_numbers=CONV_DIMS),
      (x, w), "a) lax.conv 128->32", fl, nb)

# (b) tap-packed: one N=288 matmul then shift-add
def tappack(x, w):
    wp = w.reshape(9 * C, F).reshape(3, 3, C, F).transpose(2, 0, 1, 3).reshape(C, 9 * F)
    contrib = jnp.einsum("bhwc,cn->bhwn", x, wp, preferred_element_type=jnp.float32)
    contrib = contrib.reshape(B, H, W, 3, 3, F)
    # out[y,x] = sum_{dy,dx} contrib[y-(dy-1), x-(dx-1), dy, dx]
    cp = jnp.pad(contrib, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))
    acc = jnp.zeros((B, H, W, F), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            seg = lax.dynamic_slice(cp, (0, 2 - dy, 2 - dx, 0, 0, 0),
                                    (B, H, W, 1, 1, F))[:, :, :, 0, 0]
            acc = acc + seg
    return acc.astype(x.dtype)
timed(tappack, (x, w), "b) tap-pack N=288 + shift-add", fl, nb + B*H*W*9*F*4*2)

# (c) dy-grouped: 3 matmuls N=96, vertical shifts
def dygroup(x, w):
    acc = jnp.zeros((B, H, W, F), jnp.float32)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    for dy in range(3):
        wg = w[dy].transpose(1, 0, 2).reshape(C, 3 * F)  # (C, 96)
        seg = lax.dynamic_slice(xp, (0, dy, 0, 0), (B, H, W, C))
        c3 = jnp.einsum("bhwc,cn->bhwn", seg, wg, preferred_element_type=jnp.float32)
        c3 = c3.reshape(B, H, W, 3, F)
        c3p = jnp.pad(c3, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))
        for dx in range(3):
            acc = acc + lax.dynamic_slice(
                c3p, (0, 0, 2 - dx, 0, 0), (B, H, W, 1, F))[:, :, :, 0]
    return acc.astype(x.dtype)
timed(dygroup, (x, w), "c) dy-group 3x N=96 + shifts", fl, nb + B*H*W*9*F*4*2)

# (e) how does pure matmul rate scale with N at this M/K? (K=128, M=BHW)
for n in (32, 64, 96, 128, 256, 288):
    wN = u(3, (C, n))
    timed(lambda x, wN=wN: jnp.einsum("bhwc,cn->bhwn", x, wN,
                                      preferred_element_type=jnp.float32).astype(x.dtype),
          (x,), f"e) matmul K=128 N={n}", 2 * B * H * W * C * n,
          B * H * W * (C + 2 * n) * 2)
