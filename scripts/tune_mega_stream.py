"""Tune the streamed-KV megakernel's ring geometry on chip.

Sweeps (KVSLOTS, KV_LOOKAHEAD) at the 92 s context and a long context,
int8 weights + int8 KV. The constants are module globals read at trace
time, so patching them before the first call per config re-specializes
the kernel.

Usage: python scripts/tune_mega_stream.py [n_steps]
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.runtime.params import (
    init_asr_params, quantize_decoder_params, fuse_decoder_params)
import qwen3_asr_tpu.ops.megakernel as mk

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200
cfg = ASRModelConfig()
params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
dec = fuse_decoder_params(quantize_decoder_params(params["decoder"], "int8pc"))
dcfg = cfg.decoder
mega = jax.device_put(mk.pack_megakernel_params(dec, dcfg))

L, NKV = dcfg.n_layers, dcfg.n_kv_heads
DKV = NKV * dcfg.head_dim
rng = np.random.default_rng(0)
x = jnp.ones((1, dcfg.hidden_size), jnp.bfloat16)


def run(S, pos0, label):
    k3 = jnp.asarray(rng.integers(-80, 80, (L, S, DKV)), jnp.int8)
    v3 = jnp.asarray(rng.integers(-80, 80, (L, S, DKV)), jnp.int8)
    ks = jnp.full((L, S // mk.KV_BLOCK, NKV, mk.KV_BLOCK), 0.01, jnp.float32)
    vs = jnp.full((L, S // mk.KV_BLOCK, NKV, mk.KV_BLOCK), 0.01, jnp.float32)

    def loop(mega, x, k3, v3, ks, vs, n):
        def body(i, st):
            x, k3, v3, ks, vs, tok = st
            nxt, k3, v3, ks, vs, _ = mk.mega_decode_step_i8(
                mega, dcfg, x, jnp.int32(pos0) + i, k3, v3, ks, vs,
                kv_stream=True)
            return x, k3, v3, ks, vs, nxt
        return jax.lax.fori_loop(0, n, body, (x, k3, v3, ks, vs, jnp.int32(0)))

    loop = jax.jit(loop)
    r = loop(mega, x, k3, v3, ks, vs, N)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop(mega, x, k3, v3, ks, vs, N)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) * 1e3)
    print(f"{label}: {best/N:.3f} ms/step ({N/best*1e3:.0f} tok/s)  "
          f"[S={S}, pos0={pos0}]", flush=True)
    return best / N


for slots, la in [(4, 2), (4, 3), (8, 4), (8, 6)]:
    mk.KVSLOTS, mk.KV_LOOKAHEAD = slots, la
    # bust the jit caches: kv_stream kernels close over module globals, so
    # re-jit by clearing every step wrapper's cache (this script only
    # calls the i8 step, but keep the others honest if extended)
    mk.mega_decode_step.clear_cache()
    mk.mega_decode_step_i8.clear_cache()
    mk.mega_decode_step_i4.clear_cache()
    run(1792, 1219, f"slots={slots} la={la}  92s ")
    run(4096, 4096 - N - 8, f"slots={slots} la={la}  long")
