"""Parameter-pytree utilities (plain nested dicts)."""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import jax
import jax.numpy as jnp


def tree_paths(tree: Any, prefix: str = "") -> Iterator[Tuple[str, Any]]:
    """Yield ('a.b.c', leaf) pairs in sorted key order."""
    if isinstance(tree, dict):
        for k in sorted(tree.keys()):
            yield from tree_paths(tree[k], f"{prefix}{k}." if prefix or True else k)
    else:
        yield prefix[:-1], tree


def tree_get(tree: dict, path: str) -> Any:
    node = tree
    for part in path.split("."):
        node = node[part]
    return node


def tree_set(tree: dict, path: str, value: Any) -> None:
    parts = path.split(".")
    node = tree
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value


def tree_size(tree: Any) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))


def cast_tree(tree: Any, dtype) -> Any:
    """Cast floating leaves to dtype (ints untouched)."""
    def cast(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree.map(cast, tree)
