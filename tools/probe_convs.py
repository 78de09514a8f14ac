"""Where does XLA conv time go? Individual ops at block1 shapes (8x512x512)."""
import time
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from fdgan_tpu.nn.layers import CONV_DIMS

B, H, W = 8, 512, 512

def timed(fn, args, label, flops=0, nbytes=0, iters=10):
    @jax.jit
    def loop(*a):
        def body(i, c):
            y = fn(a[0] + c * jnp.asarray(1e-6, a[0].dtype), *a[1:])
            return jnp.max(jnp.abs(y)).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.bfloat16))
    float(loop(*args))
    t0 = time.perf_counter(); float(loop(*args)); dt = (time.perf_counter()-t0)/iters
    print(f"{label:42s} {dt*1000:7.2f} ms  {flops/dt/1e12:6.1f} TF/s  {nbytes/dt/1e9:5.0f} GB/s")

k = jax.random.PRNGKey
u = lambda s, sh, dt=jnp.bfloat16: jax.random.uniform(k(s), sh, dt)

# conv3x3 128->32 (dense conv2)
x = u(1, (B, H, W, 128)); w = u(2, (3, 3, 128, 32))
fl = 2 * B*H*W * 9*128*32; nb = B*H*W*(128+32)*2
timed(lambda x, w: lax.conv_general_dilated(x, w, (1,1), [(1,1),(1,1)], dimension_numbers=CONV_DIMS), (x, w), "conv3x3 128->32 @512", fl, nb)

# conv3x3 as 9 shifted dots
def conv9(x, w):
    xp = jnp.pad(x, ((0,0),(1,1),(1,1),(0,0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            seg = lax.dynamic_slice(xp, (0,dy,dx,0), (B,H,W,128))
            r = jnp.einsum('bhwc,co->bhwo', seg, w[dy,dx], preferred_element_type=jnp.float32)
            acc = r if acc is None else acc + r
    return acc.astype(jnp.bfloat16)
timed(conv9, (x, w), "conv3x3 as 9 dots", fl, nb)

# conv1x1 160->128 (dense conv1)
x1 = u(3, (B, H, W, 160)); w1 = u(4, (1, 1, 160, 128))
fl1 = 2*B*H*W*160*128; nb1 = B*H*W*(160+128)*2
timed(lambda x, w: lax.conv_general_dilated(x, w, (1,1), [(0,0),(0,0)], dimension_numbers=CONV_DIMS), (x1, w1), "conv1x1 160->128 @512", fl1, nb1)

# BN batch-stats + relu on (8,512,512,256)
x2 = u(5, (B, H, W, 256))
def bnr(x):
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=(0,1,2)); v = jnp.var(xf, axis=(0,1,2))
    return jnp.maximum((x - m.astype(x.dtype)) * jax.lax.rsqrt(v + 1e-5).astype(x.dtype), 0)
timed(bnr, (x2,), "batch BN+relu 256ch @512", 0, B*H*W*256*2*3)

# concat 224 + 32
xa = u(6, (B, H, W, 224)); xb = u(7, (B, H, W, 32))
timed(lambda a, b: jnp.concatenate([a, b], -1), (xa, xb), "concat 224+32 @512", 0, B*H*W*256*2*2)

# conv3x3 3->64 stem (conv_refin1)
x3 = u(8, (B, H, W, 3)); w3 = u(9, (3, 3, 3, 64))
timed(lambda x, w: lax.conv_general_dilated(x, w, (1,1), [(1,1),(1,1)], dimension_numbers=CONV_DIMS), (x3, w3), "conv3x3 3->64 @512", 2*B*H*W*9*3*64, B*H*W*(3+64)*2)
