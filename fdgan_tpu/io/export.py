"""AOT export: the FDGAN forward as a serialized StableHLO artifact.

The reference deploys by rebuilding the nn.Module graph in Python and
loading a ``.pth`` into it (``/root/reference/demo.py:83-107``) — serving
always drags the full model-building code along. The TPU-native analog is
ahead-of-time export: ``jax.export`` lowers the jitted forward ONCE into a
version-stamped, self-contained StableHLO payload (weights baked in as
constants by default). The resulting bytes need no fdgan_tpu / model code
to run — any PJRT runtime for the target platform (including a C++ serving
binary, or a newer JAX via ``jax.export.deserialize``) can compile and call
them. This is the deployment companion to ``fdgan_tpu.serve``: buckets pick
shapes at runtime; export freezes one (shape, precision, BN-mode) program
into an artifact.

Determinism note: the artifact pins the exact op sequence, so fp32 parity
exports embed HIGHEST matmul precision (the same TPU bf16-conv-pass fix as
cli/demo — see PERFORMANCE.md).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jexport

from fdgan_tpu.models import fdgan_fast
from fdgan_tpu.nn.tree import cast_tree


def export_forward(
    params: dict,
    *,
    image_size: int,
    batch: Union[int, str] = 1,
    precision: str = "bf16",
    bn_mode: str = "batch",
    bake_params: bool = True,
    platforms: Optional[Sequence[str]] = None,
    io: str = "float32",
) -> jexport.Exported:
    """Lower the FDGAN forward to a (serializable) ``jax.export.Exported``.

    The exported callable takes an fp32 NHWC batch ``(batch, image_size,
    image_size, 3)`` and returns the fp32 dehazed batch — the same contract
    as ``serve.InferenceEngine``. With ``bake_params=True`` (default) the
    weights are folded into the artifact as constants and the signature is
    ``f(x)``; with ``False`` the signature is ``f(params, x)`` so one
    artifact serves many checkpoints.

    ``platforms`` lowers for specific backends (e.g. ``("tpu", "cpu")``)
    regardless of the local default — export only lowers, it never needs
    the target device.

    ``batch="poly"`` exports a batch-polymorphic artifact (symbolic leading
    dim): one payload serves every batch size, replacing the runtime batch
    ladder of ``serve.InferenceEngine`` for fixed-resolution deployments.
    Spatial dims stay static — convs/upsamples tile best under XLA with
    known H and W, and the engine's shape buckets own that axis.

    ``io="uint8"`` bakes the byte interface into the artifact: the input
    aval becomes uint8 [0, 255] (``x/255`` fused into the program, exact
    for 8-bit sources) and the output is quantised on device to uint8
    ``round((y+1)*127.5)`` — the same contract as
    ``serve.InferenceEngine(input='uint8', output='uint8')``, for
    deployments where host↔device transfer is the serving ceiling.
    """
    if precision not in ("bf16", "fp32"):
        raise ValueError(f"precision must be bf16|fp32, got {precision!r}")
    if bn_mode not in ("batch", "running"):
        raise ValueError(f"bn_mode must be batch|running, got {bn_mode!r}")
    if io not in ("float32", "uint8"):
        raise ValueError(f"io must be float32|uint8, got {io!r}")

    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    use_params = cast_tree(params, dtype) if precision == "bf16" else params

    def forward(p, x):
        if io == "uint8":
            # same fp32 x/255 the host would do — bit-identical staging
            x = x.astype(jnp.float32) / 255.0
        if precision == "fp32":
            with jax.default_matmul_precision("highest"):
                y = fdgan_fast.apply(p, x.astype(dtype), bn_mode=bn_mode)
        else:
            y = fdgan_fast.apply(p, x.astype(dtype), bn_mode=bn_mode)
        if io == "uint8":
            y32 = y.astype(jnp.float32)
            return jnp.clip(jnp.round((y32 + 1.0) * 127.5), 0.0, 255.0).astype(
                jnp.uint8
            )
        return y.astype(jnp.float32)

    if isinstance(batch, str):
        if batch != "poly":
            raise ValueError(f"batch must be an int or 'poly', got {batch!r}")
        (bdim,) = jexport.symbolic_shape("b")
    else:
        bdim = int(batch)
    in_dtype = jnp.uint8 if io == "uint8" else jnp.float32
    x_spec = jax.ShapeDtypeStruct((bdim, image_size, image_size, 3), in_dtype)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}

    if bake_params:
        fn = jax.jit(lambda x: forward(use_params, x))
        return jexport.export(fn, **kwargs)(x_spec)

    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), use_params
    )
    return jexport.export(jax.jit(forward), **kwargs)(p_spec, x_spec)


def save_exported(path: str, exported: jexport.Exported) -> int:
    """Serialize to ``path``; returns the byte size."""
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_exported(path: str) -> jexport.Exported:
    """Deserialize an artifact; run it with ``loaded.call(x)`` (or
    ``loaded.call(params, x)`` for ``bake_params=False`` exports)."""
    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))


def export_native_bundle(
    params: dict,
    out_base: str,
    *,
    image_size: int,
    batch: int = 1,
    precision: str = "bf16",
    bn_mode: str = "batch",
    io: str = "uint8",
    platform: str = "tpu",
) -> dict:
    """Export everything a NON-PYTHON PJRT consumer needs to serve FDGAN.

    The C runtime contract (consumed by ``native/pjrt_runner.c``) is four
    sibling files at ``out_base.*``:

    - ``.mlirbc``  — the raw StableHLO portable bytecode of the lowered
      forward (exactly what JAX itself hands ``PJRT_Client_Compile`` with
      format ``"mlir"``; weights baked in as constants).
    - ``.copts``   — a serialized ``xla.CompileOptionsProto`` (defaults:
      1 replica / 1 partition) for the same compile call.
    - ``.sig``     — two machine-trivial text lines ``<dtype> <dims...>``
      (input, then output) so the C side needs no MLIR or JSON parser.
    - ``.shlo``    — the full ``jax.export`` artifact, so Python tooling
      (``ArtifactRunner``/``tools/check_native.py``) can cross-check the
      native runtime's bytes against the same program.

    Single-platform on purpose: multi-platform exports prepend a
    platform-index argument to ``main``, which would change the C ABI.
    """
    if batch == "poly" or not isinstance(batch, int):
        raise ValueError("native bundles need a fixed batch (the C runner "
                         "allocates static buffers)")
    exported = export_forward(
        params,
        image_size=image_size,
        batch=batch,
        precision=precision,
        bn_mode=bn_mode,
        platforms=[platform],
        io=io,
    )
    paths = {k: f"{out_base}.{k}" for k in ("mlirbc", "copts", "sig", "shlo")}
    with open(paths["mlirbc"], "wb") as f:
        f.write(exported.mlir_module_serialized)
    from jax._src.lib import xla_client

    with open(paths["copts"], "wb") as f:
        f.write(xla_client.CompileOptions().SerializeAsString())

    def _sig_line(aval) -> str:
        name = {"uint8": "u8", "float32": "f32"}[str(aval.dtype)]
        return " ".join([name] + [str(int(d)) for d in aval.shape])

    with open(paths["sig"], "w") as f:
        f.write(_sig_line(exported.in_avals[0]) + "\n")
        f.write(_sig_line(exported.out_avals[0]) + "\n")
    save_exported(paths["shlo"], exported)
    return paths


class ArtifactRunner:
    """Serve images through a deserialized artifact — no model code needed.

    This is the consumer side of the deployment contract: everything
    required for inference is the ``.shlo`` payload (weights baked in).
    Mirrors ``serve.InferenceEngine``'s input handling on a single fixed
    program: arbitrary ``h ≤ H, w ≤ W`` inputs are reflect-padded
    bottom/right up to the artifact's static spatial shape and the outputs
    cropped back; groups are padded up to a fixed export batch by cycling
    real images (the same batch-BN-safe slot filling as the engine), while
    batch-polymorphic artifacts (``batch='poly'``) run each group exactly.
    """

    def __init__(self, artifact: Union[str, jexport.Exported]):
        self.exported = (
            load_exported(artifact) if isinstance(artifact, str) else artifact
        )
        if len(self.exported.in_avals) != 1:
            raise ValueError(
                "ArtifactRunner serves baked artifacts (signature f(x)); this "
                f"one takes {len(self.exported.in_avals)} inputs — re-export "
                "with bake_params=True"
            )
        b, H, W, _ = self.exported.in_avals[0].shape
        self.batch: Optional[int] = b if isinstance(b, int) else None
        self.height, self.width = int(H), int(W)
        # the artifact's aval IS the I/O contract — uint8 artifacts take
        # [0,255] bytes (io='uint8' exports), float ones take [0,1] fp32
        self.input = (
            "uint8"
            if self.exported.in_avals[0].dtype == np.uint8
            else "float32"
        )

    @staticmethod
    def _pad_hw(img: np.ndarray, H: int, W: int) -> np.ndarray:
        ph, pw = H - img.shape[0], W - img.shape[1]
        if ph or pw:
            mode = "reflect" if ph < img.shape[0] and pw < img.shape[1] else "edge"
            img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode=mode)
        return img

    def _ingest(self, img) -> np.ndarray:
        """serve.InferenceEngine._ingest semantics: uint8 means [0, 255],
        float means [0, 1]; only float→uint8 quantises (round, ≤1/510)."""
        a = np.asarray(img)
        if a.dtype == np.uint8:
            return a if self.input == "uint8" else a.astype(np.float32) / 255.0
        if self.input == "uint8":
            a = np.asarray(a, np.float32)
            return np.clip(np.round(a * 255.0), 0.0, 255.0).astype(np.uint8)
        return np.asarray(a, np.float32)

    def __call__(
        self, images: Sequence[np.ndarray], group: int = 8
    ) -> List[np.ndarray]:
        """Run HWC images (float [0,1] or uint8 [0,255] — both accepted,
        converted to the artifact's input contract like the engine's
        ingress) and return dehazed HWC arrays at each input's original
        size, in the artifact's output dtype (fp32, or uint8 for
        ``io='uint8'`` exports). ``group`` caps the batch per dispatch for
        polymorphic artifacts (fixed-batch artifacts always dispatch their
        export batch)."""
        H, W = self.height, self.width
        for im in images:
            if im.ndim != 3 or im.shape[2] != 3:
                raise ValueError(f"expected HWC RGB image, got shape {im.shape}")
            if im.shape[0] > H or im.shape[1] > W:
                raise ValueError(
                    f"image {im.shape[:2]} exceeds the artifact's static "
                    f"{H}x{W} — re-export larger or tile upstream"
                )
        step = self.batch or max(1, group)
        outs: List[np.ndarray] = []
        for i in range(0, len(images), step):
            chunk = list(images[i : i + step])
            n = len(chunk)
            padded = [self._pad_hw(self._ingest(im), H, W) for im in chunk]
            if self.batch is not None:
                while len(padded) < self.batch:
                    padded.append(padded[len(padded) % n])
            y = np.asarray(self.exported.call(np.stack(padded)))
            outs.extend(
                y[j, : im.shape[0], : im.shape[1]].copy()
                for j, im in enumerate(chunk)
            )
        return outs
