"""AOT StableHLO export (io/export.py): the serialized artifact, loaded
back with no reference to the model-building code path, must reproduce the
live fdgan_fast forward exactly. TPU-native deployment analog of the
reference's .pth-into-rebuilt-Module flow (/root/reference/demo.py:83-107).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fdgan_tpu.io.export import (
    ArtifactRunner,
    export_forward,
    export_native_bundle,
    load_exported,
    save_exported,
)
from fdgan_tpu.models import fdgan, fdgan_fast
from fdgan_tpu.nn.tree import cast_tree


@pytest.fixture(scope="module")
def params():
    return fdgan.init(jax.random.PRNGKey(0))


@pytest.mark.parametrize(
    "precision,atol",
    [
        # fp32 pins HIGHEST matmul precision inside the artifact — tight.
        ("fp32", 1e-4),
        # bf16: baking weights as constants lets XLA fold/reorder bf16 ops
        # differently than the live jit (measured max |Δ| 1.8e-3 on outputs
        # of magnitude ~0.05) — assert at bf16-reassociation tolerance.
        ("bf16", 5e-3),
    ],
)
def test_export_roundtrip_matches_forward(params, tmp_path, precision, atol):
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)
    ex = export_forward(
        params, image_size=64, batch=1, precision=precision, bn_mode="batch"
    )
    path = str(tmp_path / f"netG_64_{precision}.shlo")
    n = save_exported(path, ex)
    assert n > 1_000_000, "weights should be baked into the artifact"

    loaded = load_exported(path)
    y = np.asarray(loaded.call(x))

    if precision == "bf16":
        p = cast_tree(params, jnp.bfloat16)
        ref = fdgan_fast.apply(p, x.astype(jnp.bfloat16), bn_mode="batch")
    else:
        with jax.default_matmul_precision("highest"):
            ref = fdgan_fast.apply(params, x, bn_mode="batch")
    ref = np.asarray(ref.astype(jnp.float32))
    assert y.shape == ref.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(y, ref, atol=atol, rtol=0)


def test_export_unbaked_signature_and_reserialize(params):
    ex = export_forward(
        params,
        image_size=64,
        batch=2,
        precision="bf16",
        bn_mode="running",
        bake_params=False,
    )
    # last input aval is the image batch; the rest are the param leaves
    assert ex.in_avals[-1].shape == (2, 64, 64, 3)
    assert len(ex.in_avals) > 1

    from jax import export as jexport

    again = jexport.deserialize(bytearray(ex.serialize()))
    assert again.in_avals == ex.in_avals


def test_export_validates_options(params):
    with pytest.raises(ValueError):
        export_forward(params, image_size=64, precision="fp16")
    with pytest.raises(ValueError):
        export_forward(params, image_size=64, bn_mode="train")
    with pytest.raises(ValueError):
        export_forward(params, image_size=64, batch="dynamic")


def test_artifact_runner_ragged_sizes(params, tmp_path):
    """ArtifactRunner pads ragged inputs to the artifact's static HxW,
    cycles real images into unused batch slots, and crops back. running-BN
    makes each image's result independent of its batchmates, so every
    output must equal the live forward of that image alone."""
    ex = export_forward(
        params, image_size=64, batch=2, precision="bf16", bn_mode="running"
    )
    path = str(tmp_path / "netG_64_b2.shlo")
    save_exported(path, ex)
    runner = ArtifactRunner(path)
    assert (runner.batch, runner.height, runner.width) == (2, 64, 64)

    rng = np.random.default_rng(0)
    sizes = [(64, 64), (48, 56), (64, 40)]  # 2 full + 1 cycled slot
    imgs = [rng.random((h, w, 3), dtype=np.float32) for h, w in sizes]
    outs = runner(imgs)

    p16 = cast_tree(params, jnp.bfloat16)
    for im, out in zip(imgs, outs):
        assert out.shape == im.shape
        padded = ArtifactRunner._pad_hw(im, 64, 64)[None]
        ref = np.asarray(
            fdgan_fast.apply(
                cast_tree(p16, jnp.bfloat16),
                jnp.asarray(padded, jnp.bfloat16),
                bn_mode="running",
            ).astype(jnp.float32)
        )[0, : im.shape[0], : im.shape[1]]
        np.testing.assert_allclose(out, ref, atol=5e-3, rtol=0)

    big = rng.random((80, 64, 3), dtype=np.float32)
    with pytest.raises(ValueError):
        runner([big])


def test_export_batch_polymorphic(params):
    """batch='poly' exports ONE artifact whose leading dim is symbolic; a
    call at a batch size never named at export time must match the live
    forward (incl. the batch-stats BN reduction over the symbolic dim)."""
    ex = export_forward(
        params, image_size=64, batch="poly", precision="bf16", bn_mode="batch"
    )
    assert ex.in_avals[0].shape[1:] == (64, 64, 3)
    assert not isinstance(ex.in_avals[0].shape[0], int)  # symbolic dim

    x = jax.random.uniform(jax.random.PRNGKey(2), (3, 64, 64, 3), jnp.float32)
    y = np.asarray(ex.call(x))
    p16 = cast_tree(params, jnp.bfloat16)
    ref = np.asarray(
        fdgan_fast.apply(p16, x.astype(jnp.bfloat16), bn_mode="batch").astype(
            jnp.float32
        )
    )
    assert y.shape == ref.shape == (3, 64, 64, 3)
    np.testing.assert_allclose(y, ref, atol=5e-3, rtol=0)


def test_export_uint8_io(params, tmp_path):
    """io='uint8' bakes the byte interface: the artifact's input aval is
    uint8, the output is the on-device quantisation of the float export's
    result, and ArtifactRunner adapts its ingress to the aval."""
    ex_u8 = export_forward(
        params, image_size=64, batch=1, precision="fp32", bn_mode="running",
        io="uint8",
    )
    assert ex_u8.in_avals[0].dtype == np.uint8
    path = str(tmp_path / "netG_64_u8.shlo")
    save_exported(path, ex_u8)

    src = (
        np.abs(np.sin(np.arange(64 * 64 * 3, dtype=np.float32))).reshape(
            64, 64, 3
        ) * 255
    ).astype(np.uint8)

    runner = ArtifactRunner(path)
    assert runner.input == "uint8"
    # uint8 ingress passes through; float ingress quantises to the same grid
    got = runner([src])[0]
    assert got.dtype == np.uint8 and got.shape == (64, 64, 3)
    got_f = runner([src.astype(np.float32) / 255.0])[0]
    np.testing.assert_array_equal(got, got_f)

    # equals host-side quantisation of the float-I/O artifact (same graph,
    # rounding may differ by the last ulp at quantisation boundaries)
    ex_f = export_forward(
        params, image_size=64, batch=1, precision="fp32", bn_mode="running"
    )
    y = np.asarray(ex_f.call(src.astype(np.float32)[None] / 255.0))[0]
    want = np.clip(np.round((y + 1.0) * 127.5), 0, 255).astype(np.uint8)
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.99


def test_export_validates_io(params):
    with pytest.raises(ValueError, match="io"):
        export_forward(params, image_size=64, io="int8")


def test_export_native_bundle_contract(params, tmp_path):
    """export_native_bundle writes the four-file contract native/pjrt_runner
    consumes: raw StableHLO bytecode identical to the .shlo's module, a
    parseable CompileOptions proto, and a .sig whose two lines match the
    exported avals. (The C binary itself is exercised on-chip by
    tools/check_native.py — no CPU PJRT plugin .so ships in this image.)"""
    base = str(tmp_path / "nb")
    paths = export_native_bundle(
        params, base, image_size=32, batch=1, precision="fp32",
        bn_mode="running", io="uint8", platform="cpu",
    )
    assert set(paths) == {"mlirbc", "copts", "sig", "shlo"}

    ex = load_exported(paths["shlo"])
    with open(paths["mlirbc"], "rb") as f:
        assert f.read() == ex.mlir_module_serialized

    sig_lines = open(paths["sig"]).read().splitlines()
    assert sig_lines == ["u8 1 32 32 3", "u8 1 32 32 3"]
    assert ex.in_avals[0].shape == (1, 32, 32, 3)
    assert ex.in_avals[0].dtype == np.uint8

    from jax._src.lib import xla_client

    opts = xla_client.CompileOptions.ParseFromString(
        open(paths["copts"], "rb").read()
    )
    assert opts.num_replicas == 1 and opts.num_partitions == 1

    # float I/O variant flips the .sig dtype tokens
    paths_f = export_native_bundle(
        params, str(tmp_path / "nbf"), image_size=32, batch=1,
        precision="fp32", bn_mode="running", io="float32", platform="cpu",
    )
    assert open(paths_f["sig"]).read().splitlines() == [
        "f32 1 32 32 3", "f32 1 32 32 3"
    ]

    # the C runner allocates static buffers — polymorphic batch must refuse
    with pytest.raises(ValueError, match="fixed batch"):
        export_native_bundle(
            params, base, image_size=32, batch="poly", platform="cpu"
        )
