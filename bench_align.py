#!/usr/bin/env python3
"""Benchmark: forced alignment (mel -> FA encoder -> NAR classify ->
timestamp repair/pairing) on the reference workload shape — 92 s of audio,
183 words (BASELINE.md: M2 Pro 12,998 ms).

Prints ONE JSON line. Synthetic bf16 weights at the real
Qwen3-ForcedAligner-0.6B hparams unless QWEN3_FA_GGUF points at a model.
(bench.py remains the driver-run headline; this covers the FA baseline.)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax

    from qwen3_asr_tpu.ops.support import wait_for_backend

    # the tunnel's first contact can be UNAVAILABLE for minutes (outages
    # of hours have been observed); on terminal failure emit an explicit
    # error artifact instead of a stack trace
    try:
        wait_for_backend(retries=6, sleep_s=120.0)
    except Exception as e:  # noqa: BLE001 - init error shapes vary
        print(json.dumps({
            "metric": "align_realtime_factor", "value": 0.0, "unit": "error",
            "vs_baseline": 0.0,
            "error": f"TPU backend unavailable after retries: {e}",
        }))
        return 1
    import jax.numpy as jnp

    from qwen3_asr_tpu.config import AlignerModelConfig
    from qwen3_asr_tpu.pipeline.aligner import ForcedAligner
    from qwen3_asr_tpu.text.bpe import _byte_to_unicode

    seconds = float(os.environ.get("BENCH_AUDIO_SECONDS", "92"))
    n_words = int(os.environ.get("BENCH_WORDS", "183"))
    gguf = os.environ.get("QWEN3_FA_GGUF", "")
    # "" = dense bf16 (the r3 numbers); "int8pc" quantizes the NAR
    # decoder's layer matmuls (pipeline/aligner.py::ForcedAligner)
    quantize = os.environ.get("QWEN3_FA_QUANTIZE", "")

    fa = ForcedAligner(dtype=jnp.bfloat16, quantize=quantize)
    if gguf:
        assert fa.load_model(gguf), fa.error_msg
    else:
        cfg = AlignerModelConfig()
        table = _byte_to_unicode()
        vocab = [table[b] for b in range(256)]
        vocab += [f"[PAD{i}]" for i in range(256, cfg.decoder.vocab_size)]
        fa.load_random(cfg, seed=0, vocab=vocab)  # ships + asserts residency

    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * 16000)) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 440 * t)
             + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
    # int16 PCM like the WAV loading path (load_wav raw_int16) — the real
    # workload's dtype; f32 doubles the host->device copy
    audio = (audio * 32767.0).clip(-32768, 32767).astype(np.int16)
    # 183 plain-ASCII words, byte-tokenized (~5 tokens/word + 2 ts slots)
    text = " ".join(f"word{i:03d}" for i in range(n_words))

    def run(fused):
        t0 = time.perf_counter()
        r = fa.align(audio, text, fused=fused)
        t1 = time.perf_counter()
        assert r.success, r.error_msg
        assert len(r.words) == n_words, len(r.words)
        return {
            "total_ms": (t1 - t0) * 1e3,
            "mel_ms": r.t_mel_ms,
            "encode_ms": r.t_encode_ms,
            "classify_ms": r.t_decode_ms,
        }

    print("bench_align: compiling/warmup (staged)...", file=sys.stderr, flush=True)
    run(False)
    print("bench_align: compiling/warmup (fused)...", file=sys.stderr, flush=True)
    run(True)
    print("bench_align: timing...", file=sys.stderr, flush=True)
    best = min((run(False) for _ in range(3)), key=lambda r: r["total_ms"])
    best_fused = min((run(True) for _ in range(3)),
                     key=lambda r: r["total_ms"])

    total_ms = min(best["total_ms"], best_fused["total_ms"])
    result = {
        "metric": "forced_alignment_ms_92s_183w",
        "value": round(total_ms, 1),
        "unit": "ms",
        "vs_baseline": round(12998 / total_ms, 2),  # M2 Pro (BASELINE.md)
        "detail": {
            "staged_total_ms": round(best["total_ms"], 1),
            "fused_total_ms": round(best_fused["total_ms"], 1),
            "mel_ms": round(best["mel_ms"], 1),
            "encode_ms": round(best["encode_ms"], 1),
            "classify_ms": round(best["classify_ms"], 1),
            "words": n_words,
            "device": str(jax.devices()[0]),
            "weights": ("gguf" if gguf else "synthetic-bf16")
            + (f"+{quantize}" if quantize else ""),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
