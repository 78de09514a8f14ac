"""Opt-in TPU validation: the Pallas kernels compiled for the real chip must
match the XLA paths (tests force CPU+interpret; this runs compiled)."""
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
# exact fp32 conv accumulation so the XLA reference path is itself correct
# (default bf16 passes give 2e-2 error on the Laplacian; pallas is exact)
jax.config.update("jax_default_matmul_precision", "highest")

from fdgan_tpu.ops.filters import frequency_fuse
from fdgan_tpu.ops.pallas_filters import frequency_fuse_pallas
from fdgan_tpu.models import densenet
from fdgan_tpu.models.blocks import BNCtx
from fdgan_tpu.ops.pallas_dense import dense_block_fused

x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3), jnp.float32)
ref = np.asarray(jax.jit(frequency_fuse)(x))
got = np.asarray(jax.jit(frequency_fuse_pallas)(x))
err = np.abs(ref - got).max()
print(f"frequency_fuse pallas-vs-xla max err: {err:.2e}")
assert err < 1e-3

params = densenet.dense_block_init(jax.random.PRNGKey(1), 64, 3)
xb = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 64), jnp.float32)
ref = np.asarray(jax.jit(lambda p, v: densenet.dense_block_apply(p, v, BNCtx("batch")))(params, xb))
got = np.asarray(jax.jit(lambda p, v: dense_block_fused(p, v, mode="batch"))(params, xb))
err = np.abs(ref - got).max()
print(f"dense_block_fused pallas-vs-xla max err: {err:.2e}")
assert err < 5e-3
print("TPU pallas kernels OK")

# H-slab tiling path (gated automatically above 512² plane area): validate
# the NTIRE-scale sizes against the HIGHEST-precision XLA reference
for h, w in [(1024, 1024), (1600, 1600)]:
    xl = jax.random.uniform(jax.random.PRNGKey(3), (1, h, w, 3), jnp.float32)
    ref = np.asarray(jax.jit(frequency_fuse)(xl))
    got = np.asarray(jax.jit(frequency_fuse_pallas)(xl))
    err = np.abs(ref - got).max()
    print(f"frequency_fuse slab {h}x{w} max err: {err:.2e}")
    assert err < 1e-3
print("TPU pallas slab tiling OK")
