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
    transposed: frozenset = frozenset(),
) -> dict:
    """Map a flat torch state dict onto a copy of `target` (a template pytree
    from the matching `init()`), verifying shapes leaf by leaf.

    ``transposed`` lists module paths (tree-relative, e.g. ``dlayer8.tconv``)
    that are ConvTranspose2d in torch and therefore stored IOHW. Shape-based
    auto-disambiguation cannot tell the layouts apart when in/out channels
    are equal (the U-Net G's 512→512 ``dlayer8`` is one) — listed modules
    are force-read as IOHW; see the per-model ``*_TRANSPOSED`` sets below."""
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
                if ".".join(parent_parts) in transposed:
                    cand = arr.transpose(2, 3, 0, 1)  # ConvTranspose IOHW → HWIO
                else:
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
    return convert_state_dict(
        load_torch_state_dict(path), target, dtype=dtype, transposed=FDGAN_TRANSPOSED
    )


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
    params: dict,
    prefix: str = "",
    transposed: frozenset = frozenset(),
    duplicated: frozenset = frozenset(),
) -> Dict[str, np.ndarray]:
    """Inverse direction: fdgan_tpu pytree → flat torch-layout state dict.
    Regular convs go back to OIHW; modules whose dotted path (relative to the
    tree root, without `prefix`) is in `transposed` are ConvTranspose2d in
    torch and go back to IOHW. Lets reference tooling consume checkpoints
    trained here.

    ``duplicated`` lists tree paths built by the reference's blockUNet-style
    dotted ``add_module`` names (dehaze22.py:35-60: a Sequential attr
    ``layer2`` holds modules named ``layer2.conv`` …), whose state keys
    double the segment: tree ``dlayer8.tconv`` → torch
    ``dlayer8.dlayer8.tconv.weight``. Import direction undoes this via the
    consecutive-segment dedup in `convert_state_dict`."""
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
    if duplicated:
        dup = {tuple(p.split(".")) for p in duplicated}
        redone = {}
        for key, v in flat.items():
            rel = key[len(prefix):] if prefix and key.startswith(prefix) else key
            parts = rel.split(".")
            for d in dup:
                if len(parts) > len(d) and tuple(parts[: len(d)]) == d:
                    parts = list(d) + [d[-1]] + parts[len(d):]
                    break
            redone[prefix + ".".join(parts)] = v
        flat = redone
    return flat


# ConvTranspose2d modules of the FDGAN generator (TransitionBlockdy conv1s,
# dehaze1113.py:343-428)
FDGAN_TRANSPOSED = frozenset(
    {"trans_block4.conv1", "trans_block5.conv1", "trans_block6.conv1"}
)

# blockUNet(transposed=True) decoder of G/G2 (dehaze22.py:245-289) — note
# dlayer8/7/6/5 are 512→512-class shapes where layout auto-disambiguation
# is impossible (equal in/out channels)
UNET_TRANSPOSED = frozenset(
    {f"dlayer{i}.tconv" for i in range(2, 9)} | {"dlayer1.tconv"}
)

# TransitionBlock ConvTranspose 1×1s of the Dense/Dense2 decoder
# (dehaze1113.py:447-477 / :588-618)
DENSE_G_TRANSPOSED = frozenset({f"trans_block{i}.conv1" for i in range(4, 9)})

# dehaze physical model: union of its submodels' sets under their attribute
# prefixes (dehaze22.py:665-667)
DEHAZE_TRANSPOSED = frozenset(
    {f"tran_est.{p}" for p in UNET_TRANSPOSED}
    | {f"atp_est.{p}" for p in UNET_TRANSPOSED}
    | {f"tran_dense.{p}" for p in DENSE_G_TRANSPOSED}
)

# Modules the reference builds with blockUNet's dotted add_module names —
# their torch state keys double the segment (``dlayer8.dlayer8.tconv``);
# see `export_state_dict(duplicated=...)` / the import-side dedup.
UNET_DUPLICATED = frozenset(
    {f"layer{i}" for i in range(1, 9)} | {f"dlayer{i}" for i in range(1, 9)}
)
DEHAZE_DUPLICATED = frozenset(
    {f"tran_est.{p}" for p in UNET_DUPLICATED}
    | {f"atp_est.{p}" for p in UNET_DUPLICATED}
)
PATCHD_DUPLICATED = frozenset({"main.layer2", "main.layer3"})  # dehaze1113.py:201-207


def model_registry() -> dict:
    """Model-name → ``(template_factory, transposed_set, duplicated_set)``
    for every checkpointable model family (SURVEY §2.2-2.3).
    ``template_factory(rng, dtype)`` returns the init pytree
    `convert_state_dict` maps onto; ``transposed`` feeds both conversion
    directions (import layout forcing, export IOHW); ``duplicated`` rebuilds
    the reference's dotted blockUNet key naming on export."""
    from fdgan_tpu.models import dcpdn, discriminators, fdgan, vgg16

    none = frozenset()
    return {
        "fdgan": (lambda r, d: fdgan.init(r, d), FDGAN_TRANSPOSED, none),
        "vgg16": (lambda r, d: vgg16.init(r, d), none, none),
        # dehaze1113.Dense (no pyramid head) / Dense2 ≡ dehaze22.Dense
        "dense": (lambda r, d: dcpdn.dense_g_init(r, pyramid=False, dtype=d), DENSE_G_TRANSPOSED, none),
        "dense2": (lambda r, d: dcpdn.dense_g_init(r, pyramid=True, dtype=d), DENSE_G_TRANSPOSED, none),
        "unetg": (lambda r, d: dcpdn.unet_g_init(r, dtype=d), UNET_TRANSPOSED, UNET_DUPLICATED),
        "unetg2": (lambda r, d: dcpdn.unet_g2_init(r, dtype=d), UNET_TRANSPOSED, UNET_DUPLICATED),
        "dehaze": (lambda r, d: dcpdn.dehaze_physical_init(r, dtype=d), DEHAZE_TRANSPOSED, DEHAZE_DUPLICATED),
        "nlayer": (lambda r, d: discriminators.nlayer_init(r, dtype=d), none, none),
        "patchd": (lambda r, d: discriminators.patch_d_init(r, dtype=d), none, PATCHD_DUPLICATED),
        "begand": (lambda r, d: discriminators.began_d_init(r, dtype=d), none, none),
    }


def convert_checkpoint(path: str, model: str = "fdgan", rng=None, dtype=jnp.float32) -> dict:
    """`.pth` → param pytree for any registered model family."""
    import jax

    reg = model_registry()
    if model not in reg:
        raise KeyError(f"unknown model {model!r}; choose from {sorted(reg)}")
    factory, transposed, _dup = reg[model]
    target = factory(rng if rng is not None else jax.random.PRNGKey(0), dtype)
    return convert_state_dict(
        load_torch_state_dict(path), target, dtype=dtype, transposed=transposed
    )
