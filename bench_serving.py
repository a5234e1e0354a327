#!/usr/bin/env python3
"""Benchmark: serving latency under STAGGERED arrivals — closed batches
vs continuous (slot-pool) batching, through the real ASRServer worker.

The closed batcher only coalesces requests that arrive within its
max_wait_ms window; under a steady trickle (one request every gap_ms)
it degenerates toward batch-of-1 dispatches, and any request that
arrives while a batch decodes waits for the WHOLE batch. The continuous
engine admits into free slots every round_tokens decode steps instead.

Prints ONE JSON line. Synthetic weights at real 0.6B hparams; greedy,
fixed 64-token outputs (workload shape, not content, is timed).
Env: BENCH_N_REQUESTS (16), BENCH_GAP_MS (150), BENCH_AUDIO_SECONDS
(20), BENCH_DECODE_TOKENS (64), BENCH_POOL (8), BENCH_ROUND_TOKENS (32),
BENCH_QUANT as in bench.py (default int4), BENCH_MODES
("closed,continuous").
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def _percentile(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def main():
    import dataclasses

    import jax

    # BENCH_TINY is a harness smoke (tiny hparams aren't Mosaic-shaped);
    # it must pin the CPU backend — the axon plugin force-overrides the
    # JAX_PLATFORMS env var, so do it through the config API
    if os.environ.get("BENCH_TINY") == "1":
        jax.config.update("jax_platforms", "cpu")

    from qwen3_asr_tpu.ops.support import wait_for_backend

    try:
        wait_for_backend(retries=6, sleep_s=120.0)
    except Exception as e:  # noqa: BLE001 - init error shapes vary
        print(json.dumps({
            "metric": "serving_staggered", "value": 0.0, "unit": "error",
            "vs_baseline": 0.0,
            "error": f"TPU backend unavailable after retries: {e}",
        }))
        return 1
    import jax.numpy as jnp

    from qwen3_asr_tpu.config import ASRModelConfig
    from qwen3_asr_tpu.pipeline.asr import Qwen3ASR, TranscribeParams
    from qwen3_asr_tpu.serve import ASRServer

    n_req = int(os.environ.get("BENCH_N_REQUESTS", "16"))
    gap_ms = float(os.environ.get("BENCH_GAP_MS", "150"))
    seconds = float(os.environ.get("BENCH_AUDIO_SECONDS", "20"))
    n_tokens = int(os.environ.get("BENCH_DECODE_TOKENS", "64"))
    pool = int(os.environ.get("BENCH_POOL", "8"))
    round_tokens = int(os.environ.get("BENCH_ROUND_TOKENS", "32"))
    quant = {"0": "", "1": "q8_0", "2": "int8pc", "3": "int4"}[
        os.environ.get("BENCH_QUANT", "3")]
    modes = os.environ.get("BENCH_MODES", "closed,continuous").split(",")

    # BENCH_TINY=1: tiny hparams for a CPU smoke run of the harness
    # itself (not a benchmark); requires BENCH_ENGINE_CONTEXT since the
    # VMEM-max default is meaningless off-chip
    if os.environ.get("BENCH_TINY") == "1":
        from qwen3_asr_tpu.config import tiny_asr_config

        cfg = tiny_asr_config()
    else:
        cfg = ASRModelConfig()
    engine_context = int(os.environ.get("BENCH_ENGINE_CONTEXT", "0")) or None

    asr = Qwen3ASR(dtype=jnp.bfloat16, quantize=quant, kv_int8=True)
    asr.load_random(cfg, seed=0)
    # fixed-length decode (synthetic weights never emit a real EOS anyway,
    # but make the workload shape explicit)
    asr.cfg = dataclasses.replace(
        asr.cfg,
        decoder=dataclasses.replace(asr.cfg.decoder, eos_token_id=-1))

    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * 16000)) / 16000
    audios = [
        ((0.3 * np.sin(2 * np.pi * (300 + 25 * i) * t)
          + 0.05 * rng.standard_normal(t.shape)) * 32767.0)
        .clip(-32768, 32767).astype(np.int16)
        for i in range(n_req)
    ]
    params = TranscribeParams(max_tokens=n_tokens, print_timing=False,
                              mel_bucket=500)

    def run_mode_lat(continuous: bool) -> dict:
        """One serving mode end-to-end: warmup, then the staggered
        arrival pattern; per-request latency via done-callbacks."""
        server = ASRServer(asr, params, max_batch=pool, max_wait_ms=5.0,
                           continuous=continuous,
                           round_tokens=round_tokens,
                           engine_context=engine_context)
        try:
            # warmup compiles every program the timed run can hit:
            # pow2 burst sizes cover the engine's admission-count buckets
            # (prefill is jitted per count bucket) AND the closed path's
            # pow2-padded batch shapes; each burst waits to completion
            print(f"bench_serving[{'cont' if continuous else 'closed'}]: "
                  "warmup...", file=sys.stderr, flush=True)
            for burst in (1, 2, 4, pool):
                futs = [server.submit(audios[i % n_req])
                        for i in range(burst)]
                for f in futs:
                    assert f.result(timeout=3600).success
            print(f"bench_serving[{'cont' if continuous else 'closed'}]: "
                  "timing...", file=sys.stderr, flush=True)
            done_at: dict = {}
            t0 = time.perf_counter()
            sub_at: list = []
            futs = []
            for i, a in enumerate(audios):
                target = t0 + i * gap_ms / 1e3
                now = time.perf_counter()
                if target > now:
                    time.sleep(target - now)
                sub_at.append(time.perf_counter())
                fut = server.submit(a)
                fut.add_done_callback(
                    lambda f, i=i: done_at.__setitem__(
                        i, time.perf_counter()))
                futs.append(fut)
            total_tokens = 0
            for f in futs:
                r = f.result(timeout=3600)
                assert r.success
                total_tokens += len(r.tokens)
            makespan = time.perf_counter() - t0
            lats = [(done_at[i] - sub_at[i]) * 1e3 for i in range(n_req)]
            return {
                "latency_ms_mean": round(float(np.mean(lats)), 1),
                "latency_ms_p50": round(_percentile(lats, 50), 1),
                "latency_ms_p95": round(_percentile(lats, 95), 1),
                "latency_ms_max": round(max(lats), 1),
                "makespan_s": round(makespan, 3),
                "aggregate_tok_s": round(total_tokens / makespan, 1),
                "aggregate_rtf": round(n_req * seconds / makespan, 1),
                "batches": server.n_batches,
                "engine": (server._engine.stats()
                           if server._engine else None),
            }
        finally:
            server.close()

    def run_poisson(lam_rps: float, label: str, rt: int) -> dict:
        """Continuous engine under Poisson arrivals at rate lam_rps:
        per-request latency + the engine's slot utilization over the
        timed phase (busy-lane steps / pool-lane steps — the margin the
        round-based design trades for bounded admission latency)."""
        server = ASRServer(asr, params, max_batch=pool, max_wait_ms=5.0,
                           continuous=True, round_tokens=rt,
                           engine_context=engine_context)
        try:
            print(f"bench_serving[poisson {label} rt={rt}]: warmup...",
                  file=sys.stderr, flush=True)
            for burst in (1, 2, 4, pool):
                futs = [server.submit(audios[i % n_req])
                        for i in range(burst)]
                for f in futs:
                    assert f.result(timeout=3600).success
            eng = server._engine
            busy0, total0 = eng.busy_slot_steps, eng.total_slot_steps
            print(f"bench_serving[poisson {label} rt={rt}]: timing...",
                  file=sys.stderr, flush=True)
            arr_rng = np.random.default_rng(7)
            gaps = arr_rng.exponential(1.0 / lam_rps, n_req)
            gaps[0] = 0.0
            arrival = np.cumsum(gaps)
            done_at: dict = {}
            sub_at: list = []
            futs = []
            t0 = time.perf_counter()
            for i, a in enumerate(audios):
                target = t0 + arrival[i]
                now = time.perf_counter()
                if target > now:
                    time.sleep(target - now)
                sub_at.append(time.perf_counter())
                fut = server.submit(a)
                fut.add_done_callback(
                    lambda f, i=i: done_at.__setitem__(
                        i, time.perf_counter()))
                futs.append(fut)
            total_tokens = 0
            for f in futs:
                r = f.result(timeout=3600)
                assert r.success
                total_tokens += len(r.tokens)
            makespan = time.perf_counter() - t0
            lats = [(done_at[i] - sub_at[i]) * 1e3 for i in range(n_req)]
            busy = eng.busy_slot_steps - busy0
            total = eng.total_slot_steps - total0
            return {
                "offered_rps": round(lam_rps, 3),
                "latency_ms_p50": round(_percentile(lats, 50), 1),
                "latency_ms_p95": round(_percentile(lats, 95), 1),
                "aggregate_tok_s": round(total_tokens / makespan, 1),
                "slot_utilization": round(busy / max(total, 1), 3),
                "rounds": eng.n_rounds,
            }
        finally:
            server.close()

    detail = {
        "n_requests": n_req, "gap_ms": gap_ms,
        "audio_seconds_each": seconds, "tokens_each": n_tokens,
        "pool": pool, "round_tokens": round_tokens,
        "weights": "synthetic-bf16" + (f"+{quant}" if quant else ""),
        "device": None,
    }
    # BENCH_ARRIVALS=poisson (VERDICT r4 #7): capacity-calibrated Poisson
    # arrivals at 0.5x/1x/2x through the continuous engine, reporting
    # slot utilization + latency per load, plus a round_tokens sweep at
    # 1x (BENCH_RT_SWEEP, default "16,32,64") to justify the default.
    if os.environ.get("BENCH_ARRIVALS", "staggered") == "poisson":
        # capacity: saturated closed burst -> requests/s the pool sustains
        sat = run_poisson(1e3, "saturate", round_tokens)  # all arrive ~at once
        cap_rps = sat["aggregate_tok_s"] / n_tokens
        detail["capacity_rps"] = round(cap_rps, 3)
        detail["saturated"] = sat
        for load in (0.5, 1.0, 2.0):
            detail[f"poisson_{load}x"] = run_poisson(
                cap_rps * load, f"{load}x", round_tokens)
        sweep = {}
        for rt in [int(x) for x in os.environ.get(
                "BENCH_RT_SWEEP", "16,32,64").split(",") if x]:
            if rt == round_tokens:
                sweep[str(rt)] = detail["poisson_1.0x"]
            else:
                sweep[str(rt)] = run_poisson(cap_rps, f"1x", rt)
        detail["round_tokens_sweep_1x"] = sweep
        detail["device"] = str(jax.devices()[0])
        one = detail["poisson_1.0x"]
        print(json.dumps({
            "metric": "serving_poisson_slot_utilization",
            "value": one["slot_utilization"], "unit": "fraction",
            "vs_baseline": 0.0, "detail": detail,
        }))
        return 0

    for mode in modes:
        detail[mode.strip()] = run_mode_lat(mode.strip() == "continuous")
    detail["device"] = str(jax.devices()[0])
    cont = detail.get("continuous") or {}
    closed = detail.get("closed") or {}
    value = cont.get("latency_ms_p95") or closed.get("latency_ms_p95")
    result = {
        "metric": "serving_staggered_p95_latency",
        "value": value,
        "unit": "ms",
        # vs the closed batcher on the same rig (lower is better)
        "vs_baseline": (round(closed["latency_ms_p95"] / value, 2)
                        if cont and closed else 0.0),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
