import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.runtime.params import init_asr_params, quantize_decoder_params, fuse_decoder_params
from qwen3_asr_tpu.ops.megakernel import pack_megakernel_params, mega_decode_step
from qwen3_asr_tpu.ops.support import has_pallas_tpu

print("has_pallas_tpu:", has_pallas_tpu())
cfg = ASRModelConfig()
params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
dec = quantize_decoder_params(params["decoder"], "int8pc")
dec = fuse_decoder_params(dec)
dcfg = cfg.decoder
mega = jax.device_put(pack_megakernel_params(dec, dcfg))

L, S = dcfg.n_layers, 1600
DKV = dcfg.n_kv_heads * dcfg.head_dim
k3 = jnp.zeros((L, S, DKV), jnp.bfloat16)
v3 = jnp.zeros((L, S, DKV), jnp.bfloat16)
x = jnp.ones((1, dcfg.hidden_size), jnp.bfloat16)

@jax.jit
def loop(mega, x, k3, v3, n):
    def body(i, st):
        x, k3, v3, tok = st
        nxt, k3, v3, _ = mega_decode_step(mega, dcfg, x, jnp.int32(1219) + i, k3, v3)
        return x, k3, v3, nxt
    return jax.lax.fori_loop(0, n, body, (x, k3, v3, jnp.int32(0)))

r = loop(mega, x, k3, v3, 100); jax.block_until_ready(r)
for trial in range(3):
    t0 = time.perf_counter()
    r = loop(mega, x, k3, v3, 100); jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) * 1e3
    print(f"mega step: {dt/100:.3f} ms/step  ({100/dt*1e3:.0f} tok/s)")
