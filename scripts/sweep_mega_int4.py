"""Sweep megakernel ring geometry for the int4 weight stream.

VERDICT r3 #1: the int4 decode step measures 0.686 ms (71.4% of HBM peak)
while the int8 stream on the same ring hits 78.8%. Hypothesis: the int4
chunk DMAs move HALF the bytes of int8 at the SAME chunk count (~327
chunks/step), so fixed per-chunk cost (semaphore waits, scalar control,
the in-register nibble expand) doubles as a fraction of the stream time.
This sweep varies (CHUNK_OUT, NBUF, LOOKAHEAD, CHUNK_IN) — bigger chunks
restore the int8 path's bytes-per-DMA; a deeper ring hides more latency.

Usage: python scripts/sweep_mega_int4.py  (needs the TPU chip)
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.runtime.params import (
    init_asr_params, quantize_decoder_params, fuse_decoder_params)
from qwen3_asr_tpu.ops import megakernel as mk
from qwen3_asr_tpu.ops.support import has_pallas_tpu

assert has_pallas_tpu(), "needs the real chip"
cfg = ASRModelConfig()
params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
dec = quantize_decoder_params(params["decoder"], "int8pc")
dec = fuse_decoder_params(dec)
dcfg = cfg.decoder

L = dcfg.n_layers
DKV = dcfg.n_kv_heads * dcfg.head_dim
NKV = dcfg.n_kv_heads
S = 1664          # 92 s workload: prompt 1219 + 323 tokens, 128-aligned
POS0 = 1219       # live context at decode start
N = 100

rng = np.random.default_rng(0)
k3 = jnp.asarray(rng.integers(-127, 128, (L, S, DKV)), jnp.int8)
v3 = jnp.asarray(rng.integers(-127, 128, (L, S, DKV)), jnp.int8)
ks = jnp.asarray(rng.random((L, NKV, S)), jnp.float32) * 0.01
vs = jnp.asarray(rng.random((L, NKV, S)), jnp.float32) * 0.01
x = jnp.ones((1, dcfg.hidden_size), jnp.bfloat16)


def time_cfg(chunk_out, nbuf, lookahead, chunk_in=1024):
    # the int4 stream reads the INT4_* geometry constants
    # (megakernel._ring_geometry / pack chunk width)
    mk.INT4_CHUNK_OUT, mk.INT4_NBUF, mk.INT4_LOOKAHEAD, mk.CHUNK_IN = (
        chunk_out, nbuf, lookahead, chunk_in)
    mega = jax.device_put(mk.pack_megakernel_params(dec, dcfg, int4=True))

    @jax.jit
    def loop(mega, x, k3, v3, ks, vs, n):
        def body(i, st):
            x, k3, v3, ks, vs, tok = st
            nxt, k3, v3, ks, vs, _ = mk.mega_decode_step_i8.__wrapped__(
                mega, dcfg, x, jnp.int32(POS0) + i, k3, v3, ks, vs,
                False, False)
            return x, k3, v3, ks, vs, nxt
        return jax.lax.fori_loop(0, n, body, (x, k3, v3, ks, vs,
                                              jnp.int32(0)))

    try:
        r = loop(mega, x, k3, v3, ks, vs, N)
        jax.block_until_ready(r)
    except Exception as e:
        print(f"co={chunk_out} nbuf={nbuf} la={lookahead} ci={chunk_in}: "
              f"FAIL {type(e).__name__}: {str(e)[:200]}")
        return None
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop(mega, x, k3, v3, ks, vs, N)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / N * 1e3)
    print(f"co={chunk_out} nbuf={nbuf} la={lookahead} ci={chunk_in}: "
          f"{best:.3f} ms/step  ({1e3/best:.0f} tok/s)", flush=True)
    return best


time_cfg(2048, 3, 2)            # r3 baseline geometry
time_cfg(4096, 3, 2)            # 2x bytes per DMA (int8-parity chunks)
time_cfg(2048, 4, 3)            # deeper ring at old chunk size
time_cfg(4096, 4, 3)
time_cfg(4096, 3, 2, 2048)      # + bigger in-chunks for wd (3072-row)
time_cfg(6144, 3, 2)            # gu whole-matmul chunks
time_cfg(4096, 5, 4)
