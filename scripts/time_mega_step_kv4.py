"""Differential timing: int4-weight megakernel step with int8 vs int4 KV.

Realistic shapes (0.6B decoder, S=1664, pos~1220 like the 92 s clip).
Differential loop counts cancel the ~30 ms tunnel dispatch latency
(memory: int4-weight-stream notes).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.runtime.params import (
    init_asr_params, quantize_decoder_params, fuse_decoder_params)
from qwen3_asr_tpu.ops.megakernel import (
    pack_megakernel_params, mega_decode_step_i8, mega_decode_step_i4,
    pack_kv_int4)
from qwen3_asr_tpu.ops.support import has_pallas_tpu

print("has_pallas_tpu:", has_pallas_tpu(), flush=True)
cfg = ASRModelConfig()
params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
dec = quantize_decoder_params(params["decoder"], "int8pc")
dec = fuse_decoder_params(dec)
dcfg = cfg.decoder
mega = jax.device_put(pack_megakernel_params(dec, dcfg, int4=True))
print("mega pack on device (int4 weights)", flush=True)

L, S = dcfg.n_layers, 1664
NKV, D = dcfg.n_kv_heads, dcfg.head_dim
DKV = NKV * D
rng = np.random.default_rng(0)
k8 = jnp.asarray(rng.integers(-127, 128, (L, S, DKV)), jnp.int8)
v8 = jnp.asarray(rng.integers(-127, 128, (L, S, DKV)), jnp.int8)
ks = jnp.asarray(rng.random((L, NKV, S)) * 0.01 + 0.001, jnp.float32)
vs = jnp.asarray(rng.random((L, NKV, S)) * 0.01 + 0.001, jnp.float32)
x = jnp.ones((1, dcfg.hidden_size), jnp.bfloat16)
k4, ks4 = pack_kv_int4(k8, ks.transpose(0, 2, 1))
v4, vs4 = pack_kv_int4(v8, vs.transpose(0, 2, 1))
ks4, vs4 = ks4.transpose(0, 2, 1), vs4.transpose(0, 2, 1)


def make_loop(step):
    @jax.jit
    def loop(mega, x, k3, v3, ks, vs, n):
        def body(i, st):
            x, k3, v3, ks, vs, tok = st
            nxt, k3, v3, ks, vs, _ = step(
                mega, dcfg, x, jnp.int32(1219) + i, k3, v3, ks, vs)
            return x, k3, v3, ks, vs, nxt
        return jax.lax.fori_loop(0, n, body, (x, k3, v3, ks, vs, jnp.int32(0)))
    return loop


def timeit(name, loop, k3, v3, ks, vs):
    r = loop(mega, x, k3, v3, ks, vs, 16); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop(mega, x, k3, v3, ks, vs, 32); jax.block_until_ready(r)
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = loop(mega, x, k3, v3, ks, vs, 288); jax.block_until_ready(r)
        t_big = time.perf_counter() - t0
        ms = (t_big - t_small) / 256 * 1e3
        best = min(best, ms)
        print(f"{name}: {ms:.3f} ms/step ({1e3/ms:.0f} tok/s)", flush=True)
    print(f"{name} BEST: {best:.3f} ms/step", flush=True)
    return best


b8 = timeit("i8-kv", make_loop(mega_decode_step_i8), k8, v8, ks, vs)
b4 = timeit("i4-kv", make_loop(mega_decode_step_i4), k4, v4, ks4, vs4)
print(f"saving: {b8 - b4:.3f} ms/step -> {(b8 - b4) * 323:.1f} ms over 323 tokens")
