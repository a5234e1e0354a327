"""On-chip spec-k measurement: acceptance rate + wall time vs plain greedy.

92 s workload shapes, synthetic weights (acceptance on real weights will
differ; this measures the machinery's overhead and the synthetic-weights
agreement between the int4 draft stream and the int8pc verify pass).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import numpy as np, jax, jax.numpy as jnp
from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.runtime.params import (
    init_asr_params, quantize_decoder_params, fuse_decoder_params)
from qwen3_asr_tpu.ops.megakernel import pack_megakernel_params
from qwen3_asr_tpu.models.generate import generate_greedy, generate_greedy_spec
from qwen3_asr_tpu.ops.support import has_pallas_tpu

print("has_pallas_tpu:", has_pallas_tpu(), flush=True)
cfg = ASRModelConfig()
dcfg = dataclasses.replace(cfg.decoder, eos_token_id=-1)  # fixed length
params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
dec = fuse_decoder_params(quantize_decoder_params(params["decoder"], "int8pc"))
dec["mega"] = pack_megakernel_params(dec, dcfg, int4=True)
dec = jax.device_put(dec)

P, n_audio, n_prompt, max_tokens = 1280, 1196, 1216, 323
rng = np.random.default_rng(0)
toks = np.full(P, dcfg.pad_token_id, np.int32)
toks[:n_prompt] = rng.integers(1, 1000, n_prompt)
toks_d = jnp.asarray(toks)
audio = jnp.asarray(rng.standard_normal((P, dcfg.hidden_size)) * 0.1,
                    jnp.bfloat16)
args = (toks_d, jnp.int32(n_prompt), audio, jnp.int32(n_audio), 8, max_tokens)


def run_plain():
    out, n = generate_greedy(dec, dcfg, *args, cache_dtype=jnp.int8)
    return jax.device_get((out, n))


def run_spec(k):
    out, n, stats = generate_greedy_spec(dec, dcfg, *args, k=k)
    return jax.device_get((out, n, stats))


out_p, n_p = run_plain()
for k in (4, 8):
    out_s, n_s, stats = run_spec(k)
    acc = int(stats["accepted"]) / max(int(stats["drafted"]), 1)
    match = np.array_equal(out_p[:int(n_p)], out_s[:int(n_s)])
    print(f"k={k}: rounds={int(stats['rounds'])} acceptance={acc:.0%} "
          f"tokens={int(n_s)} matches_plain_greedy={match}", flush=True)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter(); run_spec(k)
        best = min(best, time.perf_counter() - t0)
    print(f"k={k}: best wall {best * 1e3:.1f} ms "
          f"({int(n_s) / best:.0f} tok/s)", flush=True)

best = 1e9
for _ in range(4):
    t0 = time.perf_counter(); run_plain()
    best = min(best, time.perf_counter() - t0)
print(f"plain int4-mega greedy: best wall {best * 1e3:.1f} ms "
      f"({int(n_p) / best:.0f} tok/s)", flush=True)
