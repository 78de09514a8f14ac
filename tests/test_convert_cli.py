"""convert CLI round trip: .pth → msgpack → .pth preserves every tensor,
and the demo pad-to-÷8 path handles arbitrary image sizes."""

import os
import sys

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
sys.path.insert(0, os.path.dirname(__file__))


def test_convert_roundtrip(tmp_path):
    from torch_oracle import FDGANOracle

    from fdgan_tpu.cli.convert import main

    torch.manual_seed(0)
    oracle = FDGANOracle()
    pth1 = str(tmp_path / "a.pth")
    torch.save({f"module.{k}": v for k, v in oracle.state_dict().items()}, pth1)

    mp = str(tmp_path / "a.msgpack")
    main(["--src", pth1, "--dst", mp])
    pth2 = str(tmp_path / "b.pth")
    main(["--src", mp, "--dst", pth2])

    s1 = {k: v.numpy() for k, v in torch.load(pth1, weights_only=True).items()}
    s2 = {k: v.numpy() for k, v in torch.load(pth2, weights_only=True).items()}
    # num_batches_tracked is intentionally dropped (no semantic content)
    keys1 = {k for k in s1 if not k.endswith("num_batches_tracked")}
    assert keys1 == set(s2.keys())
    for k in keys1:
        np.testing.assert_allclose(s1[k], s2[k], atol=1e-6, err_msg=k)


def test_convert_roundtrip_unetg2(tmp_path):
    """DCPDN-family CLI round trip (--model unetg2) with the reference's
    REAL key naming: doubled blockUNet segments and ConvTranspose IOHW
    layouts (incl. the equal-in/out dlayer8 that shape inference can't
    disambiguate)."""
    from torch_oracle import UNetG2Oracle, reference_key_names

    from fdgan_tpu.cli.convert import main

    torch.manual_seed(4)
    oracle = UNetG2Oracle()  # nf=8 — the reference's airlight G2 size
    state = reference_key_names(dict(oracle.state_dict()))
    pth1 = str(tmp_path / "g2.pth")
    torch.save({f"module.{k}": v for k, v in state.items()}, pth1)

    mp = str(tmp_path / "g2.msgpack")
    main(["--src", pth1, "--dst", mp, "--model", "unetg2"])
    pth2 = str(tmp_path / "g2b.pth")
    main(["--src", mp, "--dst", pth2, "--model", "unetg2"])

    s1 = {k: v.numpy() for k, v in torch.load(pth1, weights_only=True).items()}
    s2 = {k: v.numpy() for k, v in torch.load(pth2, weights_only=True).items()}
    keys1 = {k for k in s1 if not k.endswith("num_batches_tracked")}
    assert keys1 == set(s2.keys())
    assert "module.dlayer8.dlayer8.tconv.weight" in keys1  # doubled naming held
    for k in keys1:
        np.testing.assert_allclose(s1[k], s2[k], atol=1e-6, err_msg=k)


def test_patchd_export_import_roundtrip():
    """patch_d pytree → torch state dict (main.-nested, doubled layer2/3)
    → back: identical leaves, reference key shapes."""
    import jax.numpy as jnp

    from fdgan_tpu.io.torch_import import (
        convert_state_dict,
        export_state_dict,
        model_registry,
    )

    factory, transposed, duplicated = model_registry()["patchd"]
    params = factory(jax.random.PRNGKey(5), jnp.float32)
    state = export_state_dict(params, transposed=transposed, duplicated=duplicated)
    assert "main.layer2.layer2.conv.weight" in state  # blockUNet1 doubling
    assert "main.layer1.conv.weight" in state  # direct add_module — no doubling
    back = convert_state_dict(
        state, factory(jax.random.PRNGKey(6), jnp.float32), transposed=transposed
    )
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_demo_arbitrary_size(tmp_path, np_rng):
    """Image sizes not divisible by 8 run through the demo CLI unchanged."""
    h5py = pytest.importorskip("h5py")
    from PIL import Image

    from fdgan_tpu.cli.demo import main as demo_main
    from fdgan_tpu.io.checkpoint import save_checkpoint
    from fdgan_tpu.models import fdgan

    ds = tmp_path / "ds"
    ds.mkdir()
    gt = np_rng.uniform(0, 1, (30, 37, 3)).astype(np.float32)  # not ÷8
    with h5py.File(ds / "0.h5", "w") as f:
        f.create_dataset("gt", data=gt)
        f.create_dataset("haze", data=np.clip(gt + 0.2, 0, 1))

    ckpt = str(tmp_path / "g.msgpack")
    save_checkpoint(ckpt, fdgan.init(jax.random.PRNGKey(0)))
    out = str(tmp_path / "out")
    demo_main(["--valDataroot", str(ds), "--netG", ckpt, "--outDir", out])
    img = np.asarray(Image.open(os.path.join(out, "0.png")))
    assert img.shape == (30, 37, 3)
