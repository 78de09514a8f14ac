"""Summarise a cli/train JSONL log: val trajectory, plateau, D health.

Produces the compact table the artifacts/README.md entries are written
from (best/final PSNR+SSIM, plateau window, decay post-mortem, D output
ranges per quarter, sustained throughput).

Usage: python tools/summarize_train.py <train_log.jsonl> [--plateauTol 0.15]
"""

import argparse
import json


def load(path):
    evals, steps = [], []
    with open(path) as f:
        for line in f:
            e = json.loads(line)
            if "val_psnr" in e:
                evals.append(e)
            elif "d_fake" in e:
                steps.append(e)
    return evals, steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--plateauTol", type=float, default=0.15,
                    help="dB band below best that still counts as plateau")
    opt = ap.parse_args()
    evals, steps = load(opt.log)
    if not evals:
        raise SystemExit("no val evals in log")

    best = max(evals, key=lambda e: e["val_psnr"])
    final = evals[-1]
    first = evals[0]
    # plateau: first eval from which every later eval stays within tol of
    # the running max (a genuine flat top, not a single spike)
    plateau_from = None
    for i, e in enumerate(evals):
        tail = evals[i:]
        m = max(t["val_psnr"] for t in tail)
        if all(t["val_psnr"] >= m - opt.plateauTol for t in tail):
            plateau_from = e["step"]
            break

    print(f"evals: {len(evals)}  train steps logged: {len(steps)}")
    print(f"step 0:   {first['val_psnr']:.2f} dB / SSIM {first['val_ssim']:.4f}")
    print(f"best:     {best['val_psnr']:.2f} dB / SSIM {best['val_ssim']:.4f} @ step {best['step']}")
    print(f"final:    {final['val_psnr']:.2f} dB / SSIM {final['val_ssim']:.4f} @ step {final['step']}")
    if plateau_from is not None:
        print(f"plateau (±{opt.plateauTol} dB of running max): from step {plateau_from}")
    if final["val_psnr"] < best["val_psnr"] - 0.2:
        print(f"decay post-mortem: final is {best['val_psnr'] - final['val_psnr']:.2f} dB "
              f"below best — select by val PSNR (netG_best), not the last state")

    if steps:
        q = max(len(steps) // 4, 1)
        print("D health per quarter (d_fake min..max / d_real min..max):")
        for i in range(4):
            chunk = steps[i * q:(i + 1) * q] or steps[-q:]
            df = [s["d_fake"] for s in chunk]
            dr = [s["d_real"] for s in chunk]
            print(f"  q{i + 1}: {min(df):.3f}..{max(df):.3f} / {min(dr):.3f}..{max(dr):.3f}")
        ips = [s["imgs_per_sec"] for s in steps if "imgs_per_sec" in s]
        if ips:
            ips_sorted = sorted(ips)
            print(f"throughput: median {ips_sorted[len(ips_sorted)//2]:.2f} img/s "
                  f"(min {ips_sorted[0]:.2f}, max {ips_sorted[-1]:.2f})")


if __name__ == "__main__":
    main()
