"""Torch `.pth` → fdgan_tpu pytree converter.

The reference ships DataParallel checkpoints whose keys carry a `module.`
prefix that `demo.py:78-86` strips before loading; this converter does the
same, then maps every torch tensor into the NHWC/HWIO layout:

* Conv2d weight (O, I, kh, kw)          → kernel (kh, kw, I, O)
* ConvTranspose2d weight (I, O, kh, kw) → kernel (kh, kw, I, O)
* BatchNorm weight/bias/running_mean/running_var → scale/bias/mean/var
* `num_batches_tracked` → dropped (no semantic content)

The two conv layouts are auto-disambiguated against the target tree's
expected kernel shape, so no per-model list of transposed-conv paths is
needed (in this model family transposed 1×1 convs never have equal in/out
channels). Dead reference parameters (SURVEY.md §2.2) land in the tree like
any other weight, keeping conversion lossless in both directions.

Requires torch (CPU build is sufficient) only inside `load_torch_state_dict`.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

_LEAF_MAP = {
    "weight": None,  # resolved by tensor rank: 4D conv kernel / 1D bn scale
    "bias": "bias",
    "running_mean": "mean",
    "running_var": "var",
}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth state dict to numpy, stripping DataParallel prefixes."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        out[k] = v.detach().cpu().numpy()
    return out


def _tree_lookup(tree: dict, parts):
    node = tree
    for p in parts:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def _tree_assign(tree: dict, parts, value):
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_state_dict(
    state: Mapping[str, np.ndarray],
    target: dict,
    strict: bool = True,
    dtype=jnp.float32,
) -> dict:
    """Map a flat torch state dict onto a copy of `target` (a template pytree
    from the matching `init()`), verifying shapes leaf by leaf."""
    import copy

    out = copy.deepcopy(target)
    missing = []
    for key, value in state.items():
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if leaf not in _LEAF_MAP:
            if strict:
                raise KeyError(f"unrecognised torch leaf {key!r}")
            continue
        parent_parts = parts[:-1]
        parent = _tree_lookup(out, parent_parts)
        if parent is None:
            # torch 0.3-era Sequentials allow dotted module names; a key like
            # 'main.layer2.layer2.conv.weight' duplicates a segment — collapse it
            dedup = [p for i, p in enumerate(parent_parts) if i == 0 or p != parent_parts[i - 1]]
            parent = _tree_lookup(out, dedup)
            parent_parts = dedup
        if parent is None:
            missing.append(key)
            continue

        arr = np.asarray(value)
        if leaf == "weight":
            if arr.ndim == 4:
                expected = parent["kernel"].shape
                cand = arr.transpose(2, 3, 1, 0)  # OIHW → HWIO
                if cand.shape != tuple(expected):
                    cand = arr.transpose(2, 3, 0, 1)  # ConvTranspose IOHW → HWIO
                if cand.shape != tuple(expected):
                    raise ValueError(
                        f"{key}: torch shape {arr.shape} fits neither conv nor "
                        f"transposed-conv layout for target {tuple(expected)}"
                    )
                parent["kernel"] = jnp.asarray(cand, dtype)
            elif arr.ndim == 1:
                if "scale" not in parent or parent["scale"].shape != arr.shape:
                    raise ValueError(f"{key}: 1-D weight does not match a BN scale")
                parent["scale"] = jnp.asarray(arr, dtype)
            else:
                raise ValueError(f"{key}: unsupported weight rank {arr.ndim}")
        else:
            slot = _LEAF_MAP[leaf]
            if slot not in parent:
                missing.append(key)
                continue
            if parent[slot].shape != arr.shape:
                raise ValueError(
                    f"{key}: shape {arr.shape} != target {parent[slot].shape}"
                )
            parent[slot] = jnp.asarray(arr, dtype)
    if missing and strict:
        raise KeyError(f"{len(missing)} torch keys had no home in the target tree: {missing[:8]}")
    return out


def convert_fdgan_checkpoint(path: str, rng=None, dtype=jnp.float32) -> dict:
    """netG_epoch_{real,synthetic}.pth → FDGAN param tree."""
    import jax

    from fdgan_tpu.models import fdgan

    target = fdgan.init(rng if rng is not None else jax.random.PRNGKey(0), dtype)
    return convert_state_dict(load_torch_state_dict(path), target, dtype=dtype)


# torchvision vgg16's Sequential indices of the 13 convs, in _CFG order
_TORCHVISION_VGG16_CONVS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def convert_vgg16(path: str, rng=None, dtype=jnp.float32) -> dict:
    """A torch-saved VGG16 state dict → vgg pytree.

    Accepts BOTH naming schemes, so the perceptual loss has a practical
    weight-bootstrap story offline (SURVEY §7.3 #3 — the reference's
    `init_vgg16` Lua-t7 download, myutils/utils.py:84-94, has no offline
    analog):

    * the reference's ``Vgg16`` attribute names (``conv1_1.weight`` …), the
      format its own converter writes;
    * torchvision's ``vgg16(weights=...)`` layout (``features.0.weight`` …)
      — any stock torchvision VGG16 checkpoint converts directly;
      classifier weights are ignored.
    """
    import jax

    from fdgan_tpu.models import vgg16

    state = load_torch_state_dict(path)
    if any(k.startswith("features.") for k in state):
        idx_to_name = {
            str(i): cfg[0] for i, cfg in zip(_TORCHVISION_VGG16_CONVS, vgg16._CFG)
        }
        remapped = {}
        for k, v in state.items():
            parts = k.split(".")
            if parts[0] == "features" and parts[1] in idx_to_name and len(parts) == 3:
                remapped[f"{idx_to_name[parts[1]]}.{parts[2]}"] = v
            # classifier.* / avgpool.* carry no features — dropped
        state = remapped
    target = vgg16.init(rng if rng is not None else jax.random.PRNGKey(0), dtype)
    return convert_state_dict(state, target, dtype=dtype)


def export_state_dict(
    params: dict, prefix: str = "", transposed: frozenset = frozenset()
) -> Dict[str, np.ndarray]:
    """Inverse direction: fdgan_tpu pytree → flat torch-layout state dict.
    Regular convs go back to OIHW; modules whose dotted path (relative to the
    tree root, without `prefix`) is in `transposed` are ConvTranspose2d in
    torch and go back to IOHW. Lets reference tooling consume checkpoints
    trained here."""
    flat: Dict[str, np.ndarray] = {}

    def walk(node, path, rel):
        if isinstance(node, dict):
            if "kernel" in node:
                k = np.asarray(node["kernel"])
                if rel.rstrip(".") in transposed:
                    flat[path + "weight"] = k.transpose(2, 3, 0, 1)  # HWIO → IOHW
                else:
                    flat[path + "weight"] = k.transpose(3, 2, 0, 1)  # HWIO → OIHW
                if "bias" in node:
                    flat[path + "bias"] = np.asarray(node["bias"])
            elif "scale" in node:
                flat[path + "weight"] = np.asarray(node["scale"])
                flat[path + "bias"] = np.asarray(node["bias"])
                flat[path + "running_mean"] = np.asarray(node["mean"])
                flat[path + "running_var"] = np.asarray(node["var"])
            else:
                for k, v in node.items():
                    walk(v, f"{path}{k}.", f"{rel}{k}.")

    walk(params, prefix, "")
    return flat


# ConvTranspose2d modules of the FDGAN generator (TransitionBlockdy conv1s,
# dehaze1113.py:343-428)
FDGAN_TRANSPOSED = frozenset(
    {"trans_block4.conv1", "trans_block5.conv1", "trans_block6.conv1"}
)
