#!/usr/bin/env python3
"""Compare .npy files or directories of .npy files (parity harness).

Same role as the reference tests/compare.py: np.allclose with diff stats and
failure locations, exit code 1 on mismatch.

Usage:
    python -m qwen3_asr_tpu.tools.compare a.npy b.npy --atol 1e-4
    python -m qwen3_asr_tpu.tools.compare dir_a/ dir_b/ --atol 1e-2
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def compare_arrays(a: np.ndarray, b: np.ndarray, atol: float, rtol: float,
                   name: str = "") -> bool:
    if a.shape != b.shape:
        print(f"FAIL {name}: shape mismatch {a.shape} vs {b.shape}")
        return False
    a64 = a.astype(np.float64)
    b64 = b.astype(np.float64)
    diff = np.abs(a64 - b64)
    ok = np.allclose(a64, b64, atol=atol, rtol=rtol)
    status = "OK  " if ok else "FAIL"
    print(
        f"{status} {name}: shape {a.shape}  max_abs_diff {diff.max():.3e}  "
        f"mean_abs_diff {diff.mean():.3e}"
    )
    if not ok:
        bad = np.argwhere(~np.isclose(a64, b64, atol=atol, rtol=rtol))
        for idx in bad[:5]:
            t = tuple(int(i) for i in idx)
            print(f"      at {t}: {a64[t]:.6f} vs {b64[t]:.6f}")
        print(f"      {len(bad)} mismatched elements total")
    return ok


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("a")
    p.add_argument("b")
    p.add_argument("--atol", type=float, default=1e-4)
    p.add_argument("--rtol", type=float, default=0.0)
    args = p.parse_args(argv)

    if os.path.isdir(args.a):
        names = sorted(f for f in os.listdir(args.a) if f.endswith(".npy"))
        ok = True
        for n in names:
            pb = os.path.join(args.b, n)
            if not os.path.exists(pb):
                print(f"FAIL {n}: missing in {args.b}")
                ok = False
                continue
            ok &= compare_arrays(
                np.load(os.path.join(args.a, n)), np.load(pb),
                args.atol, args.rtol, n,
            )
        return 0 if ok else 1

    ok = compare_arrays(np.load(args.a), np.load(args.b), args.atol,
                        args.rtol, os.path.basename(args.a))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
