"""Native checkpointing: params + optimizer state + step, msgpack-serialised.

Replaces the reference's `torch.save(state_dict)` per-epoch scheme (the two
shipped checkpoints are different iterations of one run, reference
README.md:38; resume flags `--netG/--netD` at demo.py:45-47). Structure-aware
(flax.serialization) so a checkpoint restores into an identically-shaped
pytree; files are written atomically.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Optional

import jax
from flax import serialization


def save_checkpoint(path: str, tree: Any, step: Optional[int] = None) -> str:
    """Serialise a pytree to `path` (or `path/ckpt_{step}.msgpack` if step
    given and path is a directory)."""
    if step is not None and (os.path.isdir(path) or not path.endswith(".msgpack")):
        os.makedirs(path, exist_ok=True)
        path = os.path.join(path, f"ckpt_{step}.msgpack")
    # flatten to leaves so any registered pytree (e.g. TrainState) serialises
    leaves = [jax.device_get(x) for x in jax.tree.leaves(tree)]
    data = serialization.msgpack_serialize({str(i): leaf for i, leaf in enumerate(leaves)})
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore into a template pytree of the right structure."""
    with open(path, "rb") as f:
        flat = serialization.msgpack_restore(f.read())
    leaves = [flat[str(i)] for i in range(len(flat))]
    treedef = jax.tree.structure(target)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, target expects {treedef.num_leaves}"
        )
    return jax.tree.unflatten(treedef, leaves)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    paths = glob.glob(os.path.join(ckpt_dir, "ckpt_*.msgpack"))
    if not paths:
        return None

    def step_of(p):
        m = re.search(r"ckpt_(\d+)\.msgpack$", p)
        return int(m.group(1)) if m else -1

    return max(paths, key=step_of)
