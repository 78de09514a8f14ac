"""On-chip check: zero-downtime weight hot-reload in the C serving daemon.

The C runtime (native/pjrt_runner.c --serve) bakes weights into the
compiled program, so its POST /reload compiles the NEW bundle on a
background thread while the current executable keeps serving, then swaps
at a quiescent point — the native twin of InferenceEngine.reload
(fdgan_tpu/serve.py). The mock-plugin suite test
(tests/test_native_runner.py::test_serve_reload_hot_swaps_bundle) pins the
machinery hardware-free; THIS tool proves the semantics on the real PJRT
plugin (the axon TPU here):

1. requests served DURING the background reload compile still return the
   OLD weights' bytes (zero downtime, FIFO preserved);
2. after the swap, the same input produces DIFFERENT bytes (the new
   weights are live) with no daemon restart and no failed request;
3. an empty-body /reload (re-promotion of the current bundle) is
   byte-identical;
4. a signature-mismatched bundle is rejected 409 without touching state.

Replaces nothing in the reference — it has no serving daemon at all
(demo.py:1-120 is a batch folder loop that needs torch + Python).

Usage:
  python tools/check_native_reload.py [--size 64] [--netG A.msgpack]
                                      [--netG2 B.msgpack] [--port 8799]
"""
import argparse
import http.client
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
RUNNER = os.path.join(REPO, "native", "pjrt_runner")


def export_bundles(size: int, netg: str | None, netg2: str | None):
    """Export two same-signature bundles with DIFFERENT weights (CPU child —
    export only lowers, it never needs the device)."""
    base_a, base_b = f"/tmp/reload_a_{size}", f"/tmp/reload_b_{size}"
    src = f"""
import jax
jax.config.update('jax_platforms', 'cpu')
from fdgan_tpu.io.export import export_native_bundle
from fdgan_tpu.models import fdgan
from fdgan_tpu.cli._common import load_generator_params
for ckpt, key, base in ((({netg!r}) or None, 0, {base_a!r}),
                        (({netg2!r}) or None, 7, {base_b!r})):
    params = load_generator_params(ckpt) if ckpt else fdgan.init(jax.random.PRNGKey(key))
    export_native_bundle(params, base, image_size={size}, batch=1,
                         precision='fp32', bn_mode='batch', io='uint8')
    print('exported', base, flush=True)
"""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run([sys.executable, "-c", src], check=True, env=env)
    return base_a, base_b


def req(port, method, path, body=None, timeout=600):
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    c.request(method, path, body=body)
    r = c.getresponse()
    data = r.read()
    c.close()
    return r.status, data


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--port", type=int, default=8799)
    ap.add_argument("--netG", default=None, help="bundle A weights (random if absent)")
    ap.add_argument("--netG2", default=None, help="bundle B weights (random key 7 if absent)")
    opt = ap.parse_args()

    base_a, base_b = export_bundles(opt.size, opt.netG, opt.netG2)
    if not os.path.exists(RUNNER):
        subprocess.run(["make"], cwd=os.path.dirname(RUNNER), check=True)

    n = opt.size * opt.size * 3
    img = bytes((i * 131) % 251 for i in range(n))

    daemon = subprocess.Popen(
        [RUNNER, base_a, "--serve", str(opt.port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        t0 = time.time()
        while time.time() - t0 < 900:  # startup compile rides the tunnel
            if daemon.poll() is not None:
                print(daemon.stdout.read())
                raise SystemExit("daemon exited during startup")
            try:
                status, data = req(opt.port, "GET", "/healthz", timeout=5)
                if status == 200:
                    break
            except OSError:
                time.sleep(2.0)
        h = json.loads(data)
        assert h["weights_version"] == 0, h
        print(f"daemon up in {time.time() - t0:.0f}s", flush=True)

        t = time.time()
        status, out_a = req(opt.port, "POST", "/dehaze", img)
        assert status == 200, status
        print(f"bundle A inference {time.time() - t:.2f}s", flush=True)

        # ---- reload to B; probe DURING the background compile ------------
        t_reload = time.time()
        status, data = req(opt.port, "POST", "/reload", base_b.encode())
        assert status == 202, (status, data)
        status, mid = req(opt.port, "POST", "/dehaze", img)
        assert status == 200
        _, hz = req(opt.port, "GET", "/healthz")
        still = json.loads(hz)["reloading"]
        if still:
            assert mid == out_a, "request during reload must serve OLD weights"
            print("during-reload request: served OLD weights (zero downtime)",
                  flush=True)
        else:
            print("note: reload compile finished before the probe "
                  "(cached program) — downtime window not observable",
                  flush=True)

        while time.time() - t_reload < 900:
            _, hz = req(opt.port, "GET", "/healthz")
            if json.loads(hz)["weights_version"] == 1:
                break
            time.sleep(2.0)
        assert json.loads(hz)["weights_version"] == 1, hz
        print(f"reload A->B live in {time.time() - t_reload:.0f}s "
              f"(compile off the serving path)", flush=True)

        status, out_b = req(opt.port, "POST", "/dehaze", img)
        assert status == 200
        assert out_b != out_a, "new weights must change output bytes"
        da = np.abs(np.frombuffer(out_b, np.uint8).astype(np.int16)
                    - np.frombuffer(out_a, np.uint8).astype(np.int16))
        print(f"A vs B output: mean|d|={da.mean():.1f} max={da.max()} "
              f"(different weights confirmed)", flush=True)

        # ---- empty-body re-promotion: byte-identical ----------------------
        status, _ = req(opt.port, "POST", "/reload", b"")
        assert status == 202
        t1 = time.time()
        while time.time() - t1 < 900:
            _, hz = req(opt.port, "GET", "/healthz")
            if json.loads(hz)["weights_version"] == 2:
                break
            time.sleep(2.0)
        status, out_b2 = req(opt.port, "POST", "/dehaze", img)
        assert status == 200 and out_b2 == out_b, "re-promotion must be byte-identical"
        print("same-bundle re-promotion: bytes identical", flush=True)

        # ---- mismatch rejected without touching state ----------------------
        bad = f"/tmp/reload_bad_{opt.size}"
        with open(bad + ".sig", "w") as f:
            s2 = opt.size // 2
            f.write(f"u8 1 {s2} {s2} 3\nu8 1 {s2} {s2} 3\n")
        status, data = req(opt.port, "POST", "/reload", bad.encode())
        assert status == 409, (status, data)
        _, st = req(opt.port, "GET", "/stats")
        st = json.loads(st)
        assert st["weights_version"] == 2 and st["bundle"] == base_b
        print(f"mismatch rejected 409; stats: {st}", flush=True)
        print("OK")
        return 0
    finally:
        daemon.kill()
        daemon.wait()


if __name__ == "__main__":
    sys.exit(main())
