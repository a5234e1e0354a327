#!/usr/bin/env python3
"""Benchmark: batched serving throughput — B concurrent utterances decoded
as one vmapped program (pipeline/asr.py::transcribe_batch). Decode is
HBM-bound on weight reads, which amortize across the batch, so aggregate
tok/s should scale well past B=1.

Prints ONE JSON line. Synthetic weights at real 0.6B hparams.
BENCH_BATCH (default 4), BENCH_AUDIO_SECONDS (default 20 per utterance),
BENCH_DECODE_TOKENS (default 64), BENCH_QUANT as in bench.py.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import dataclasses

    import jax

    from qwen3_asr_tpu.ops.support import wait_for_backend

    # the tunnel's first contact can be UNAVAILABLE for minutes (outages
    # of hours have been observed); on terminal failure emit an explicit
    # error artifact instead of a stack trace
    try:
        wait_for_backend(retries=6, sleep_s=120.0)
    except Exception as e:  # noqa: BLE001 - init error shapes vary
        print(json.dumps({
            "metric": "batched_throughput", "value": 0.0, "unit": "error",
            "vs_baseline": 0.0,
            "error": f"TPU backend unavailable after retries: {e}",
        }))
        return 1
    import jax.numpy as jnp

    from qwen3_asr_tpu.config import ASRModelConfig
    from qwen3_asr_tpu.pipeline.asr import Qwen3ASR, TranscribeParams

    B = int(os.environ.get("BENCH_BATCH", "4"))
    seconds = float(os.environ.get("BENCH_AUDIO_SECONDS", "20"))
    n_tokens = int(os.environ.get("BENCH_DECODE_TOKENS", "64"))
    quant = {"0": "", "1": "q8_0", "2": "int8pc", "3": "int4"}[
        os.environ.get("BENCH_QUANT", "2")
    ]

    # int8 KV cache — the serving daemon's default: required by the
    # batched decode megakernel, which is where the aggregate numbers
    # come from
    asr = Qwen3ASR(dtype=jnp.bfloat16, quantize=quant, kv_int8=True)
    asr.load_random(ASRModelConfig(), seed=0)
    # force fixed-length decode (synthetic weights; workload shape matters)
    asr.cfg = dataclasses.replace(
        asr.cfg, decoder=dataclasses.replace(asr.cfg.decoder, eos_token_id=-1)
    )

    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * 16000)) / 16000
    # int16 PCM like the WAV loading path (load_wav raw_int16) — the real
    # workload's dtype; f32 doubles the host->device copy
    audios = [
        ((0.3 * np.sin(2 * np.pi * (300 + 40 * b) * t)
          + 0.05 * rng.standard_normal(t.shape)) * 32767.0)
        .clip(-32768, 32767).astype(np.int16)
        for b in range(B)
    ]
    params = TranscribeParams(max_tokens=n_tokens, print_timing=False,
                              mel_bucket=500)

    def run():
        t0 = time.perf_counter()
        results = asr.transcribe_batch(audios, params)
        dt = time.perf_counter() - t0
        total = sum(len(r.tokens) for r in results if r.success)
        assert all(r.success for r in results)
        return dt, total

    print("bench_throughput: compiling/warmup...", file=sys.stderr, flush=True)
    run()
    print("bench_throughput: timing...", file=sys.stderr, flush=True)
    best_dt, total = min((run() for _ in range(3)), key=lambda r: r[0])
    agg_tok_s = total / best_dt
    audio_s = B * seconds

    result = {
        "metric": f"batched_throughput_b{B}",
        "value": round(agg_tok_s, 1),
        "unit": "tokens_per_s_aggregate",
        "vs_baseline": round(agg_tok_s / 77.0, 2),  # reference: 77 tok/s, B=1
        "detail": {
            "batch": B,
            "total_ms": round(best_dt * 1e3, 1),
            "tokens": total,
            "audio_seconds_processed": audio_s,
            "realtime_factor_aggregate": round(audio_s / best_dt, 1),
            "device": str(jax.devices()[0]),
            "weights": "synthetic-bf16" + (f"+{quant}" if quant else ""),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
