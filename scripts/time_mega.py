import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.runtime.params import init_asr_params, quantize_decoder_params, fuse_decoder_params
from qwen3_asr_tpu.models.generate import generate_greedy
from qwen3_asr_tpu.ops.megakernel import pack_megakernel_params

cfg = ASRModelConfig()
params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
dec = quantize_decoder_params(params["decoder"], "int8pc")
dec = fuse_decoder_params(dec)
dcfg = dataclasses.replace(cfg.decoder, eos_token_id=-1)

N_TOK = 323
P = 1280
toks = np.full(P, dcfg.pad_token_id, np.int32); toks[:1219] = 1
audio = jnp.zeros((1216, dcfg.hidden_size), jnp.bfloat16)

def run(dec_params, label):
    d = jax.device_put(dec_params)
    out, n = generate_greedy(d, dcfg, jnp.asarray(toks), jnp.int32(1219),
                             audio, jnp.int32(1216), 3, N_TOK)
    out.block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out, n = generate_greedy(d, dcfg, jnp.asarray(toks), jnp.int32(1219),
                                 audio, jnp.int32(1216), 3, N_TOK)
        out.block_until_ready()
        ts.append(time.perf_counter() - t0)
    best = min(ts) * 1e3
    print(f"{label}: {best:.1f} ms total, {N_TOK/best*1e3:.0f} tok/s, {best/N_TOK:.3f} ms/step")
    return out

from qwen3_asr_tpu.ops.support import has_pallas_tpu
print("has_pallas:", has_pallas_tpu())
o1 = run(dec, "xla-int8pc")
dec2 = dict(dec); dec2["mega"] = pack_megakernel_params(dec, dcfg)
o2 = run(dec2, "megakernel")
print("token parity:", bool((o1 == o2).all()))
