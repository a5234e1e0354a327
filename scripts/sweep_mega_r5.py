"""Round-5 int4 ring sweep at the calibrated VMEM ceiling.

probe_vmem_limit.py (r5 run): resident int8-KV compiles at S=3328 and
refuses at S=6144; bf16-KV compiles at 1664, refuses at 2304 — the true
Mosaic stack budget sits well above the conservative 16.1 MB estimator
constant. This sweep asks the only question that matters for the 92 s
headline: do rings deeper than the current nbuf=10 (est ~16.07 MB)
compile and go faster? Pack cost is paid ONCE per chunk width (nbuf/la
only shape the kernel, not the pack layout).

Usage: python scripts/sweep_mega_r5.py  (needs the TPU chip)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.ops import megakernel as mk
from qwen3_asr_tpu.ops.support import has_pallas_tpu
from qwen3_asr_tpu.runtime.params import (
    fuse_decoder_params,
    host_staging,
    init_asr_params,
    quantize_decoder_params,
    ship_to_device,
)

assert has_pallas_tpu(), "needs the real chip"
cfg = ASRModelConfig()
dcfg = cfg.decoder

t0 = time.perf_counter()
with host_staging():
    params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
    dec = fuse_decoder_params(
        quantize_decoder_params(params["decoder"], "int8pc"))
print(f"init: {time.perf_counter()-t0:.0f}s", flush=True)

L, DKV, NKV = dcfg.n_layers, dcfg.n_kv_heads * dcfg.head_dim, dcfg.n_kv_heads
S = 1664          # 92 s workload: prompt 1219 + 323 tokens, 128-aligned
POS0 = 1219
N = 100

rng = np.random.default_rng(0)
k3 = jnp.asarray(rng.integers(-127, 128, (L, S, DKV)), jnp.int8)
v3 = jnp.asarray(rng.integers(-127, 128, (L, S, DKV)), jnp.int8)
ks = jnp.asarray(rng.random((L, NKV, S)), jnp.float32) * 0.01
vs = jnp.asarray(rng.random((L, NKV, S)), jnp.float32) * 0.01
x = jnp.ones((1, dcfg.hidden_size), jnp.bfloat16)

_packs = {}


def get_pack(chunk_out, chunk_in):
    key = (chunk_out, chunk_in)
    if key not in _packs:
        mk.INT4_CHUNK_OUT, mk.CHUNK_IN = chunk_out, chunk_in
        t = time.perf_counter()
        with host_staging():
            p = mk.pack_megakernel_params(dec, dcfg, int4=True)
        _packs[key] = ship_to_device(p, what="mega")
        print(f"pack co={chunk_out} ci={chunk_in}: "
              f"{time.perf_counter()-t:.0f}s", flush=True)
    return _packs[key]


def time_cfg(chunk_out, nbuf, lookahead, chunk_in=1024):
    mega = get_pack(chunk_out, chunk_in)
    mk.INT4_CHUNK_OUT, mk.CHUNK_IN = chunk_out, chunk_in
    mk.INT4_NBUF, mk.INT4_NBUF_MIN = nbuf, nbuf  # pin the adaptive depth
    la = lookahead

    orig = mk._int4_ring_depth
    mk._int4_ring_depth = lambda *a, **k: (nbuf, la)
    try:
        @jax.jit
        def loop(mega, x, k3, v3, ks, vs, n):
            def body(i, st):
                x, k3, v3, ks, vs, tok = st
                nxt, k3, v3, ks, vs, _ = mk.mega_decode_step_i8.__wrapped__(
                    mega, dcfg, x, jnp.int32(POS0) + i, k3, v3, ks, vs,
                    False, False)
                return x, k3, v3, ks, vs, nxt
            return jax.lax.fori_loop(0, n, body,
                                     (x, k3, v3, ks, vs, jnp.int32(0)))

        try:
            r = loop(mega, x, k3, v3, ks, vs, N)
            jax.block_until_ready(r)
        except Exception as e:
            print(f"co={chunk_out} nbuf={nbuf} la={la} ci={chunk_in}: "
                  f"FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
            return None
        best = 1e9
        for _ in range(4):
            t1 = time.perf_counter()
            r = loop(mega, x, k3, v3, ks, vs, N)
            jax.block_until_ready(r)
            best = min(best, (time.perf_counter() - t1) / N * 1e3)
        print(f"co={chunk_out} nbuf={nbuf} la={la} ci={chunk_in}: "
              f"{best:.3f} ms/step  ({1e3/best:.0f} tok/s)", flush=True)
        return best
    finally:
        mk._int4_ring_depth = orig


if __name__ == "__main__":
    time_cfg(2048, 10, 8)    # shipping geometry (r4 adopted)
    time_cfg(2048, 11, 9)
    time_cfg(2048, 12, 10)
    time_cfg(2048, 14, 12)
    time_cfg(4096, 6, 4)
    time_cfg(4096, 7, 5)
    print("sweep done", flush=True)
