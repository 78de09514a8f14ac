"""CycleGAN-style image replay buffer (reference `misc.ImagePool`,
misc.py:140-161): 50-slot history; with p=0.5 a query swaps the incoming
fake batch with a random stored one.

Two implementations:

* ``ImagePool`` — host-side, exactly like the reference (the buffer holds
  device arrays between steps; the swap decision is a host RNG draw).
  Keeping it out of the jitted step avoids dynamic-shape churn in XLA.
* ``device_pool_init`` / ``device_pool_query`` — a pure, statically-shaped
  equivalent for the device-resident training loop (``--deviceSteps``),
  where the host never sees the fakes: the buffer is a
  ``(pool_size, b, H, W, C)`` array carried through ``lax.scan`` and the
  swap decision comes from the traced JAX RNG.  Same semantics
  (fill-then-p=0.5-swap, batch-granular like ``ImagePool.query``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class ImagePool:
    def __init__(self, pool_size: int = 50, seed: Optional[int] = None):
        self.pool_size = pool_size
        self.num_imgs = 0
        self.images = []
        self._rng = np.random.default_rng(seed)

    def query(self, image):
        if self.pool_size == 0:
            return image
        if self.num_imgs < self.pool_size:
            self.images.append(image)
            self.num_imgs += 1
            return image
        if self._rng.uniform(0, 1) > 0.5:
            idx = int(self._rng.integers(self.pool_size))
            tmp = self.images[idx]
            self.images[idx] = image
            return tmp
        return image


def device_pool_init(pool_size: int, batch_shape, dtype):
    """Allocate the scan-carried pool state: a zeroed
    ``(pool_size, *batch_shape)`` buffer plus the fill counter."""
    import jax.numpy as jnp

    buf = jnp.zeros((pool_size,) + tuple(batch_shape), dtype)
    return buf, jnp.zeros((), jnp.int32)


def device_pool_query(buf, n_filled, image, rng) -> Tuple:
    """Pure ImagePool.query (misc.py:146-161) for traced code.

    fill phase (n < pool_size): store ``image`` at slot ``n``, return it;
    full: with p=0.5 swap with a uniformly random slot (return the slot's
    previous content), else pass ``image`` through untouched.

    Returns ``(buf', n_filled', out)``; all shapes static, safe inside
    ``lax.scan``/``jit``. ``image`` must already be stop_gradient'ed by the
    caller (the D step must not backprop into G through the buffer).
    """
    import jax
    import jax.numpy as jnp

    pool_size = buf.shape[0]
    u_rng, i_rng = jax.random.split(rng)
    not_full = n_filled < pool_size
    swap = jax.random.uniform(u_rng) > 0.5
    rand_slot = jax.random.randint(i_rng, (), 0, pool_size)
    slot = jnp.where(not_full, n_filled, rand_slot)
    # read BEFORE write: the swapped-out batch is the slot's old content
    old = jax.lax.dynamic_index_in_dim(buf, slot, 0, keepdims=False)
    do_store = jnp.logical_or(not_full, swap)
    stored = jnp.where(do_store, image.astype(buf.dtype), old)
    buf = jax.lax.dynamic_update_index_in_dim(buf, stored, slot, 0)
    out = jnp.where(jnp.logical_and(jnp.logical_not(not_full), swap),
                    old.astype(image.dtype), image)
    n_filled = jnp.minimum(n_filled + not_full.astype(jnp.int32), pool_size)
    return buf, n_filled, out
