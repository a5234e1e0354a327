#!/usr/bin/env python3
"""WER/CER between a hypothesis and reference transcript.

Same role as the reference tests/compute_wer.py: jiwer when available, a
pure-Python Levenshtein fallback otherwise, and a --threshold exit code for
CI gating.

Usage:
    python -m qwen3_asr_tpu.tools.compute_wer --ref ref.txt --hyp hyp.txt \
        --threshold 0.05
"""

from __future__ import annotations

import argparse
import sys


def levenshtein(a: list, b: list) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def word_error_rate(ref: str, hyp: str) -> float:
    if not ref.split():  # degenerate: jiwer raises on an empty reference
        return 0.0 if not hyp.split() else 1.0
    try:
        import jiwer
        return float(jiwer.wer(ref, hyp))
    except ImportError:
        r, h = ref.split(), hyp.split()
        return levenshtein(r, h) / max(len(r), 1)


def char_error_rate(ref: str, hyp: str) -> float:
    if not ref.replace(" ", ""):
        return 0.0 if not hyp.replace(" ", "") else 1.0
    try:
        import jiwer
        return float(jiwer.cer(ref, hyp))
    except ImportError:
        r = list(ref.replace(" ", ""))
        h = list(hyp.replace(" ", ""))
        return levenshtein(r, h) / max(len(r), 1)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ref", required=True, help="reference transcript file")
    p.add_argument("--hyp", required=True, help="hypothesis transcript file")
    p.add_argument("--threshold", type=float, default=None,
                   help="exit 1 if WER exceeds this")
    p.add_argument("--cer", action="store_true", help="gate on CER instead")
    args = p.parse_args(argv)

    with open(args.ref, encoding="utf-8") as f:
        ref = f.read().strip()
    with open(args.hyp, encoding="utf-8") as f:
        hyp = f.read().strip()

    wer = word_error_rate(ref, hyp)
    cer = char_error_rate(ref, hyp)
    print(f"WER: {wer:.4f}")
    print(f"CER: {cer:.4f}")

    if args.threshold is not None:
        metric = cer if args.cer else wer
        if metric > args.threshold:
            print(f"FAIL: {'CER' if args.cer else 'WER'} {metric:.4f} > "
                  f"threshold {args.threshold}")
            return 1
        print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
