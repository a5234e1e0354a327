"""On-chip: long-context batched serving measurements (VERDICT r3 #2/#3).

Two claims built last round, measured here so BASELINE.md carries numbers
instead of intent:

1. Streamed-KV batched megakernel: B>8 x 92s contexts keep the kernel
   (per-seq KV tiles through an online-softmax ring) instead of the
   vmapped XLA fallback. Measure aggregate tok/s at the 92 s context
   (S=1664, pos~1219) for B=8 resident vs B=16 streamed (two chunked
   launches are NOT needed — stream_max_batch covers 16) and report
   whether B=16 sustains >= the B=8 aggregate.

2. Batched prefill: one flattened [B*P] layer stack replaces 8
   sequential prefills (~196 ms of the round-3 B=8 device budget).
   Measure prefill_batch_mega_cache wall at B=8, P=1280, S=1664.

Usage: JAX_PLATFORMS=tpu python scripts/time_serving_longctx.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.models.generate import prefill_batch_mega_cache
from qwen3_asr_tpu.ops.megakernel import KV_BLOCK, pack_megakernel_params
from qwen3_asr_tpu.ops.megakernel_batch import (
    mega_batch_max_context,
    mega_batch_stream_max_batch,
    mega_decode_step_batch,
)
from qwen3_asr_tpu.ops.support import has_pallas_tpu
from qwen3_asr_tpu.runtime.params import (
    fuse_decoder_params,
    host_staging,
    init_asr_params,
    quantize_decoder_params,
    ship_to_device,
)

# Synthetic prompt layout for the prefill timing below: the real engine
# derives the audio splice row via audio_start_pos(build_asr_prompt(...))
# (pipeline/engine.py admit()); this benchmark's prompts are random
# tokens, so the offset is a representative constant, NOT a batch size.
AUDIO_OFFSET = 8

print("has_pallas:", has_pallas_tpu(), flush=True)
cfg = ASRModelConfig()
dcfg = cfg.decoder
with host_staging():
    params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
    dec = fuse_decoder_params(
        quantize_decoder_params(params["decoder"], "int8pc"))
    dec["mega"] = pack_megakernel_params(dec, dcfg)
dec = ship_to_device(dec)
mega = dec["mega"]

L, S = dcfg.n_layers, 1664          # 92 s workload: prompt ~1216 -> S 1664
NKV, D = dcfg.n_kv_heads, dcfg.head_dim
DKV, H = NKV * D, dcfg.hidden_size
POS0 = 1219
N = 50

print(f"resident max context @B=8: {mega_batch_max_context(mega, dcfg, 8)}",
      flush=True)
print(f"resident max context @B=16: {mega_batch_max_context(mega, dcfg, 16)}",
      flush=True)
print(f"stream max batch: {mega_batch_stream_max_batch(mega, dcfg)}",
      flush=True)


def run_decode(B: int, kv_stream: bool):
    kq = jnp.zeros((B, L, S, DKV), jnp.int8)
    vq = jnp.zeros((B, L, S, DKV), jnp.int8)
    if kv_stream:
        sshape = (B, L, S // KV_BLOCK, NKV, KV_BLOCK)
    else:
        sshape = (B, L, NKV, S)
    ks = jnp.ones(sshape, jnp.float32) * 0.01
    vs = jnp.ones(sshape, jnp.float32) * 0.01
    x = jnp.ones((B, H), jnp.bfloat16)
    pos0 = jnp.full((B,), POS0, jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(mega, x, kq, vq, ks, vs, n):
        def body(i, st):
            x, kq, vq, ks, vs = st
            _, kq, vq, ks, vs, _ = mega_decode_step_batch(
                mega, dcfg, x, pos0 + i, kq, vq, ks, vs,
                kv_stream=kv_stream)
            return x, kq, vq, ks, vs
        return jax.lax.fori_loop(0, n, body, (x, kq, vq, ks, vs))

    t0 = time.perf_counter()
    r = loop(mega, x, kq, vq, ks, vs, N)
    jax.block_until_ready(r)
    print(f"B={B} kv_stream={kv_stream}: compile+first "
          f"{time.perf_counter()-t0:.1f} s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop(mega, x, kq, vq, ks, vs, N)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) * 1e3
        best = min(best, dt)
        print(f"  B={B} kv_stream={kv_stream}: {dt/N:.3f} ms/step  "
              f"({B*N/dt*1e3:.0f} tok/s aggregate)", flush=True)
    return B * N / best * 1e3


def run_prefill(B: int):
    P = 1280
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(1, 1000, (B, P)), jnp.int32)
    n_prompt = jnp.full((B,), 1216, jnp.int32)
    n_audio = jnp.full((B,), 1196, jnp.int32)
    audio = jnp.asarray(
        rng.standard_normal((B, P, H)).astype(np.float32) * 0.1,
        jnp.bfloat16)

    pf = jax.jit(prefill_batch_mega_cache,
                 static_argnames=("cfg", "audio_offset", "S", "kv_stream"))
    t0 = time.perf_counter()
    r = pf(dec, dcfg, toks, n_prompt, audio, n_audio, AUDIO_OFFSET, S)
    jax.block_until_ready(r)
    print(f"prefill B={B}: compile+first {time.perf_counter()-t0:.1f} s",
          flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = pf(dec, dcfg, toks, n_prompt, audio, n_audio, AUDIO_OFFSET, S)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) * 1e3
        best = min(best, dt)
        print(f"  prefill B={B} (P={P}, S={S}): {dt:.1f} ms wall "
              f"({dt/B:.1f} ms/seq)", flush=True)
    return best


if __name__ == "__main__":
    agg8 = run_decode(8, kv_stream=False)
    agg16 = run_decode(16, kv_stream=True)
    print(f"\nB=16 streamed vs B=8 resident aggregate: "
          f"{agg16:.0f} vs {agg8:.0f} tok/s "
          f"({'SUSTAINS' if agg16 >= agg8 else 'BELOW'})", flush=True)
    run_prefill(8)
