"""Measure the C serving daemon (native/pjrt_runner --serve) end-to-end.

Drives the zero-Python daemon with raw-byte POSTs at concurrency 1 and 2+
to quantify the r5 one-deep pipeline: with >=2 in-flight clients the
daemon overlaps request N+1's socket read + host->device upload with
request N's device execution (both halves ride the ~4 MB/s tunnel here,
so the overlap is the whole win). Sequential clients measure the
unpipelined floor for comparison.

Usage (on the TPU):
  # export a bundle first (or reuse one):
  python -c "... export_native_bundle(...)"   # see tools/check_native.py
  native/pjrt_runner /tmp/bundle --serve 8765 &
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_native_serve.py \
      --port 8765 --bytes $((512*512*3)) --n 32 --threads 2
"""

import argparse
import http.client
import sys
import time
from concurrent.futures import ThreadPoolExecutor


def post(port, body, timeout=900):
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    c.request("POST", "/dehaze", body=body)
    r = c.getresponse()
    data = r.read()
    c.close()
    if r.status != 200:
        raise RuntimeError(f"HTTP {r.status}: {data[:200]!r}")
    return len(data)


def run(port, body, n, threads):
    t0 = time.time()
    if threads <= 1:
        for _ in range(n):
            post(port, body)
    else:
        with ThreadPoolExecutor(threads) as ex:
            list(ex.map(lambda _: post(port, body), range(n)))
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--bytes", type=int, required=True,
                    help="exact raw input size the bundle's .sig demands")
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--threads", type=int, default=2)
    opt = ap.parse_args()

    body = bytes((i * 131) % 251 for i in range(opt.bytes))
    post(opt.port, body)  # absorb any cold path
    t_seq = run(opt.port, body, opt.n, 1)
    t_pipe = run(opt.port, body, opt.n, opt.threads)
    print(f"sequential: {opt.n / t_seq:.2f} img/s ({t_seq / opt.n * 1e3:.0f} ms/img)")
    print(f"{opt.threads} concurrent: {opt.n / t_pipe:.2f} img/s "
          f"({t_pipe / opt.n * 1e3:.0f} ms/img) — pipeline gain "
          f"{t_seq / t_pipe:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
