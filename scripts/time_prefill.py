"""Differential timing of the ASR decoder prefill on the chip.

92 s workload shapes: P=1280 prompt rows (~1196 audio features + ~20 text
tokens), S=1664 cache, int8pc fused weights (the bench-default config's
prefill path), int8 KV cache writes. The fori_loop feeds each iteration's
input from the previous accumulator so XLA cannot hoist the body.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.runtime.params import (
    init_asr_params, quantize_decoder_params, fuse_decoder_params)
from qwen3_asr_tpu.models.decoder import decoder_forward, init_kv_cache
from qwen3_asr_tpu.models.generate import embed_with_audio, lm_logits
from qwen3_asr_tpu.ops.support import has_pallas_tpu

print("has_pallas_tpu:", has_pallas_tpu(), flush=True)
cfg = ASRModelConfig()
dcfg = cfg.decoder
params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
dec_q = fuse_decoder_params(quantize_decoder_params(params["decoder"], "int8pc"))
dec_bf = fuse_decoder_params(params["decoder"])

P, S = 1280, 1664
n_audio, n_prompt = 1196, 1216
rng = np.random.default_rng(0)
toks = jnp.asarray(rng.integers(1, 1000, P), jnp.int32)
audio = jnp.asarray(rng.standard_normal((P, dcfg.hidden_size)) * 0.1,
                    jnp.bfloat16)
dec_q = jax.device_put(dec_q)
dec_bf = jax.device_put(dec_bf)


def make_prefill(dec, cache_dtype):
    @jax.jit
    def run(dec, toks, audio, n):
        def body(i, acc):
            cache = init_kv_cache(dcfg, S, cache_dtype)
            h0 = embed_with_audio(dec, toks, audio, jnp.int32(n_audio), 8)
            h0 = h0.at[0, 0].add(acc * 1e-9)
            h, cache = decoder_forward(
                dec, dcfg, h0, jnp.arange(P, dtype=jnp.int32), cache,
                cache_offset=jnp.int32(0), kv_valid_len=jnp.int32(n_prompt),
                prefill=True)
            tok = jnp.argmax(lm_logits(dec, dcfg, h[n_prompt - 1]))
            return acc + tok.astype(jnp.float32) * 1e-9 + h[0, 1].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    return run


def timeit(name, fn, dec):
    r = fn(dec, toks, audio, 2); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(fn(dec, toks, audio, 4))
        t1 = time.perf_counter(); jax.block_until_ready(fn(dec, toks, audio, 20))
        t2 = time.perf_counter()
        ms = ((t2 - t1) - (t1 - t0)) / 16 * 1e3
        best = min(best, ms)
    print(f"{name}: {best:.2f} ms", flush=True)
    return best


timeit("prefill_int8pc_kv8", make_prefill(dec_q, jnp.int8), dec_q)
timeit("prefill_int8pc_kvbf16", make_prefill(dec_q, jnp.bfloat16), dec_q)
timeit("prefill_bf16_kv8", make_prefill(dec_bf, jnp.int8), dec_bf)
