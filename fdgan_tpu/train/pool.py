"""CycleGAN-style image replay buffer (reference `misc.ImagePool`,
misc.py:140-161): 50-slot history; with p=0.5 a query swaps the incoming
fake batch with a random stored one.

Host-side by design — the buffer holds device arrays between steps and the
swap decision is a host RNG draw, exactly like the reference. Keeping it out
of the jitted step avoids dynamic-shape churn in XLA.
"""

from __future__ import annotations

from typing import Optional

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
