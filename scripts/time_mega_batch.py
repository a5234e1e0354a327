"""On-chip: batched megakernel step timing (aggregate tok/s) at B=4/8."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.runtime.params import init_asr_params, quantize_decoder_params, fuse_decoder_params
from qwen3_asr_tpu.ops.megakernel import pack_megakernel_params
from qwen3_asr_tpu.ops.megakernel_batch import mega_decode_step_batch
from qwen3_asr_tpu.ops.support import has_pallas_tpu

print("has_pallas:", has_pallas_tpu())
cfg = ASRModelConfig()
params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
dec = fuse_decoder_params(quantize_decoder_params(params["decoder"], "int8pc"))
dcfg = cfg.decoder
mega = jax.device_put(pack_megakernel_params(dec, dcfg))

L, S = dcfg.n_layers, 1664
NKV, D = dcfg.n_kv_heads, dcfg.head_dim
DKV = NKV * D
H = dcfg.hidden_size
N = 50

for B in (int(os.environ.get("B", "8")),):
    kq = jnp.zeros((B, L, S, DKV), jnp.int8)
    vq = jnp.zeros((B, L, S, DKV), jnp.int8)
    ks = jnp.ones((B, L, NKV, S), jnp.float32) * 0.01
    vs = jnp.ones((B, L, NKV, S), jnp.float32) * 0.01
    x = jnp.ones((B, H), jnp.bfloat16)
    pos0 = jnp.full((B,), 1219, jnp.int32)

    @jax.jit
    def loop(mega, x, kq, vq, ks, vs, n):
        def body(i, st):
            x, kq, vq, ks, vs = st
            tok, kq, vq, ks, vs, _ = mega_decode_step_batch(
                mega, dcfg, x, pos0 + i, kq, vq, ks, vs)
            return x, kq, vq, ks, vs
        return jax.lax.fori_loop(0, n, body, (x, kq, vq, ks, vs))

    t0 = time.perf_counter()
    r = loop(mega, x, kq, vq, ks, vs, N); jax.block_until_ready(r)
    print(f"B={B}: compile+first {time.perf_counter()-t0:.1f} s")
    for trial in range(3):
        t0 = time.perf_counter()
        r = loop(mega, x, kq, vq, ks, vs, N); jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) * 1e3
        print(f"B={B}: {dt/N:.3f} ms/step  ({B*N/dt*1e3:.0f} tok/s aggregate)")
