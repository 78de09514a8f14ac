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


class AsyncCheckpointer:
    """Overlap checkpoint I/O with training instead of blocking on it.

    On this platform a save's device→host fetch rides the ~4 MB/s tunnel
    (tens of seconds for a full train state), and the blocking
    ``save_checkpoint`` stalls the train loop for all of it. This wrapper

    1. takes an **on-device snapshot** first (a jitted buffer copy —
       microseconds of device time), which makes the save safe against the
       live state being donated into the next ``lax.scan`` dispatch
       (``make_device_loop`` donates its carry), then
    2. fetches + serialises the snapshot on a background thread while the
       device runs the next chunk.

    One save is in flight at a time: a new ``save()`` first joins the
    previous writer (whose ``os.replace`` is atomic, so a crash mid-write
    never corrupts an existing checkpoint). Call ``wait()`` before process
    exit — and before reading back the file — to guarantee the write
    landed; writer exceptions re-raise there.
    """

    def __init__(self):
        import threading

        self._threading = threading
        self._thread: Optional[threading.Thread] = None
        self._err: list = []
        self._copy = jax.jit(lambda t: jax.tree.map(lambda x: x.copy(), t))

    def save(self, path: str, tree: Any, step: Optional[int] = None) -> None:
        self.wait()
        snap = self._copy(tree)  # async device-side copy; survives donation

        def _write():
            try:
                save_checkpoint(path, snap, step)
            except BaseException as e:  # surfaced on the next wait()/save()
                self._err.append(e)

        self._thread = self._threading.Thread(
            target=_write, name="ckpt-writer", daemon=True
        )
        self._thread.start()

    def wait(self, timeout: Optional[float] = None) -> bool:
        """Join the in-flight writer. Returns True when no write remains in
        flight. On a timed-out join the thread handle is KEPT (dropping it
        would let the next ``save()`` start a second concurrent writer — the
        slower, older ``os.replace`` could then win and leave a stale
        checkpoint on disk); the caller can ``wait()`` again."""
        if self._thread is not None:
            self._thread.join(timeout)
            if self._thread.is_alive():  # join timed out — still in flight
                return False
            self._thread = None
        if self._err:
            raise self._err.pop(0)
        return True


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore into a template pytree of the right structure.

    Validates every leaf's shape AND dtype against the template — a
    same-leaf-count checkpoint from a different model family must fail
    here with the offending parameter named, not later as a cryptic
    broadcast error inside jit."""
    with open(path, "rb") as f:
        flat = serialization.msgpack_restore(f.read())
    leaves = [flat[str(i)] for i in range(len(flat))]
    paths_and_tleaves, treedef = jax.tree_util.tree_flatten_with_path(target)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, target expects {treedef.num_leaves}"
        )
    for (keypath, tleaf), leaf in zip(paths_and_tleaves, leaves):
        tshape, lshape = getattr(tleaf, "shape", None), getattr(leaf, "shape", None)
        if tshape is not None and lshape is not None and tuple(tshape) != tuple(lshape):
            raise ValueError(
                f"checkpoint leaf {jax.tree_util.keystr(keypath)} has shape "
                f"{tuple(lshape)}, target expects {tuple(tshape)} — wrong "
                f"model family or config for this checkpoint?"
            )
        tdt, ldt = getattr(tleaf, "dtype", None), getattr(leaf, "dtype", None)
        if tdt is not None and ldt is not None and tdt != ldt:
            raise ValueError(
                f"checkpoint leaf {jax.tree_util.keystr(keypath)} has dtype "
                f"{ldt}, target expects {tdt}"
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
