"""Weight-initialisation utilities.

``dcgan_init`` mirrors the reference's ``misc.weights_init`` (misc.py:16-22):
conv kernels ~ N(0, 0.02); BN scale ~ N(1, 0.02), BN bias = 0.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import jax
import jax.numpy as jnp


def init_rng_stream(rng: jax.Array) -> Iterator[jax.Array]:
    """Infinite stream of independent RNG keys (fold_in by counter)."""
    i = 0
    while True:
        yield jax.random.fold_in(rng, i)
        i += 1


def _is_conv(d: dict) -> bool:
    return "kernel" in d


def _is_bn(d: dict) -> bool:
    return "scale" in d and "mean" in d


def _path_key(rng: jax.Array, path: tuple) -> jax.Array:
    # stable across processes: crc32 of the joined path, NOT Python hash()
    # (which is salted per process via PYTHONHASHSEED — same-seed runs would
    # otherwise produce different inits)
    return jax.random.fold_in(rng, zlib.crc32("/".join(path).encode()) & 0x7FFFFFFF)


# FDGAN generator subtrees copied from pretrained torchvision densenet121
# (dehaze1113.py:707-728) — the DCGAN init must NOT clobber these; the
# reference's weights_init targets the fresh decoder/refinement layers and
# the discriminators only.
DENSENET_PRETRAINED_KEYS = (
    "conv0",
    "dense_block1", "trans_block1",
    "dense_block2", "trans_block2",
    "dense_block3", "trans_block3",
    "dense_block31", "dense_norm31",
)


def dcgan_init(rng: jax.Array, params: dict, skip: tuple = ()) -> dict:
    """Re-draw every conv kernel from N(0, 0.02) and every BN scale from
    N(1, 0.02) with zero bias, preserving running stats — the DCGAN init the
    reference applies before training (misc.py:16-22). Deterministic for a
    given seed (path-keyed via crc32). Top-level keys in ``skip`` are left
    untouched (pass ``DENSENET_PRETRAINED_KEYS`` for the FDGAN generator)."""

    def rebuild(tree, path):
        if len(path) == 1 and path[0] in skip:
            return tree
        if isinstance(tree, dict):
            if _is_conv(tree):
                k = _path_key(rng, path)
                new = dict(tree)
                new["kernel"] = 0.02 * jax.random.normal(k, tree["kernel"].shape, tree["kernel"].dtype)
                if "bias" in tree:
                    new["bias"] = jnp.zeros_like(tree["bias"])
                return new
            if _is_bn(tree):
                k = _path_key(rng, path)
                new = dict(tree)
                new["scale"] = 1.0 + 0.02 * jax.random.normal(k, tree["scale"].shape, tree["scale"].dtype)
                new["bias"] = jnp.zeros_like(tree["bias"])
                return new
            return {k: rebuild(v, path + (k,)) for k, v in tree.items()}
        return tree

    return rebuild(params, ())


def he_init(rng: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    return jax.random.normal(rng, shape, dtype) * jnp.sqrt(2.0 / fan_in)
