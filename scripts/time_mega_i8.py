"""On-chip: bf16-KV vs int8-KV megakernel decode through generate_greedy."""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.runtime.params import init_asr_params, quantize_decoder_params, fuse_decoder_params
from qwen3_asr_tpu.models.generate import generate_greedy
from qwen3_asr_tpu.ops.megakernel import pack_megakernel_params
from qwen3_asr_tpu.ops.support import has_pallas_tpu

cfg = ASRModelConfig()
params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
dec = fuse_decoder_params(quantize_decoder_params(params["decoder"], "int8pc"))
dec["mega"] = pack_megakernel_params(dec, cfg.decoder)
dcfg = dataclasses.replace(cfg.decoder, eos_token_id=-1)

N_TOK = 323
P = 1280
toks = np.full(P, dcfg.pad_token_id, np.int32); toks[:1219] = 1
audio = jnp.zeros((1216, dcfg.hidden_size), jnp.bfloat16)
print("has_pallas:", has_pallas_tpu())
d = jax.device_put(dec)

def run(label, cache_dtype):
    out, n = generate_greedy(d, dcfg, jnp.asarray(toks), jnp.int32(1219),
                             audio, jnp.int32(1216), 3, N_TOK,
                             cache_dtype=cache_dtype)
    out.block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out, n = generate_greedy(d, dcfg, jnp.asarray(toks), jnp.int32(1219),
                                 audio, jnp.int32(1216), 3, N_TOK,
                                 cache_dtype=cache_dtype)
        out.block_until_ready()
        ts.append(time.perf_counter() - t0)
    best = min(ts) * 1e3
    print(f"{label}: {best:.1f} ms total, {N_TOK/best*1e3:.0f} tok/s, "
          f"{best/N_TOK:.3f} ms/step")
    return np.asarray(out)

o_bf = run("mega bf16-KV", jnp.bfloat16)
o_i8 = run("mega int8-KV", jnp.int8)
agree = int((o_bf == o_i8).sum())
print(f"token agreement: {agree}/{N_TOK} (random weights; flips expected on near-ties)")
