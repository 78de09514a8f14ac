"""Shared CLI utilities: image save (torchvision-free), checkpoint loading
from either .pth (reference) or .msgpack (native), profiling context."""

from __future__ import annotations

import contextlib
import os
from typing import Optional

import numpy as np


def save_image_normalized(arr_hwc: np.ndarray, path: str) -> None:
    """`vutils.save_image(..., normalize=True, scale_each=False)` semantics
    (demo.py:151): min/max-normalise the tensor to [0,1], then write 8-bit."""
    from PIL import Image

    from fdgan_tpu.utils.images import normalize_to_uint8

    Image.fromarray(normalize_to_uint8(arr_hwc)).save(path)


def load_generator_params(path: str, dtype=None):
    """Load FDGAN params from a reference .pth or a native .msgpack."""
    import jax
    import jax.numpy as jnp

    from fdgan_tpu.models import fdgan

    dtype = dtype or jnp.float32
    if path.endswith(".pth") or path.endswith(".pt"):
        from fdgan_tpu.io.torch_import import convert_fdgan_checkpoint

        return convert_fdgan_checkpoint(path, dtype=dtype)
    from fdgan_tpu.io.checkpoint import load_checkpoint

    template = fdgan.init(jax.random.PRNGKey(0), dtype)
    return load_checkpoint(path, template)


def enable_compile_cache(path: str = "/tmp/jax_cache") -> None:
    """Persistent XLA compile cache for the CLIs (bench/tools already do
    this). First TPU compiles over the axon tunnel take minutes; the cache
    makes every later CLI invocation start hot. Respects an explicit
    JAX_COMPILATION_CACHE_DIR."""
    import jax

    target = os.environ.get("JAX_COMPILATION_CACHE_DIR", path)
    try:
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knob — cache is an optimisation only


@contextlib.contextmanager
def maybe_profile(profile_dir: Optional[str]):
    """jax.profiler trace wrapper — the upgrade over the reference's bare
    wall-clock prints (demo.py:131-135)."""
    if not profile_dir:
        yield
        return
    import jax

    os.makedirs(profile_dir, exist_ok=True)
    with jax.profiler.trace(profile_dir):
        yield
