"""Cross-check the C PJRT serving runtime against the Python ArtifactRunner.

The native deployment contract has two consumers of one exported program:
``native/pjrt_runner`` (C, no Python) and ``io.export.ArtifactRunner``
(Python). Both must produce the same bytes for the same input. This tool
exports a fresh bundle (or reuses --bundle), drives the C binary on the
default PJRT plugin (the axon TPU here), runs the Python runner on the same
``.shlo``, and diffs the uint8 outputs.

Replaces nothing in the reference (it has no non-Python serving path at
all — demo.py:1-120 needs torch to rebuild the module graph); this checks
the capability that surpasses it.

Usage:
  python tools/check_native.py [--size 64] [--netG ckpt.msgpack]
                               [--image path.jpg] [--bundle /tmp/base]
                               [--loops 3]
"""
import argparse
import os
import subprocess
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
RUNNER = os.path.join(REPO, "native", "pjrt_runner")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--netG", default=None, help="generator .msgpack (random init if absent)")
    ap.add_argument("--image", default=None, help="test image (deterministic pattern if absent)")
    ap.add_argument("--bundle", default=None, help="reuse an existing bundle base path")
    ap.add_argument("--loops", type=int, default=3)
    ap.add_argument("--precision", default="fp32", choices=["fp32", "bf16"])
    opt = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    base = opt.bundle
    if base is None:
        base = f"/tmp/check_native_{opt.size}"
        # Export in a CPU-forced child: under the axon platform each of the
        # hundreds of param-init dispatches costs ~100 ms over the tunnel
        # (export itself only lowers — it never needs the device).
        export_src = f"""
import jax
jax.config.update('jax_platforms', 'cpu')
from fdgan_tpu.io.export import export_native_bundle
if {opt.netG!r}:
    from fdgan_tpu.cli._common import load_generator_params
    params = load_generator_params({opt.netG!r})
else:
    from fdgan_tpu.models import fdgan
    params = fdgan.init(jax.random.PRNGKey(0))
paths = export_native_bundle(
    params, {base!r}, image_size={opt.size}, batch=1,
    precision={opt.precision!r}, bn_mode='batch', io='uint8',
)
import os
print('exported:', {{k: os.path.getsize(p) for k, p in paths.items()}})
"""
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        subprocess.run([sys.executable, "-c", export_src], check=True, env=env)

    n = opt.size * opt.size * 3
    if opt.image:
        from PIL import Image

        img = np.asarray(Image.open(opt.image).convert("RGB"), np.uint8)
        src = np.pad(
            img,
            ((0, opt.size - img.shape[0]), (0, opt.size - img.shape[1]), (0, 0)),
            mode="reflect",
        )
    else:
        src = np.frombuffer(
            bytes((i * 131) % 251 for i in range(n)), np.uint8
        ).reshape(opt.size, opt.size, 3)
    in_raw, out_raw = f"{base}.in.raw", f"{base}.out.raw"
    src[None].tofile(in_raw)

    if not os.path.exists(RUNNER):
        subprocess.run(["make"], cwd=os.path.dirname(RUNNER), check=True)
    cmd = [RUNNER, base, "--input", in_raw, "--output", out_raw,
           "--loops", str(opt.loops)]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)

    from fdgan_tpu.io.export import ArtifactRunner

    runner = ArtifactRunner(base + ".shlo")
    want = runner([src])[0].astype(np.int16)
    got = np.fromfile(out_raw, np.uint8).reshape(opt.size, opt.size, 3).astype(np.int16)
    d = np.abs(got - want)
    exact = 100.0 * float((d == 0).mean())
    print(f"native vs python: max|d|={int(d.max())} exact={exact:.2f}% "
          f"<=1 level={100.0 * float((d <= 1).mean()):.2f}%")
    # Same program, same chip, two runtimes: bytes must agree to <=1 uint8
    # level everywhere (compile-option differences may flip ties in the
    # final round; anything larger means an I/O layout or ABI bug).
    ok = int(d.max()) <= 1
    print("OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
