"""Batched encoder: batched flash kernel vs masked-XLA vmap (VERDICT r3 #7).

Round 3 measured the vmapped masked-XLA batched encoder at ~133 ms for
B=8 x 92 s; pallas-under-vmap was rejected (serialized launches). The
batched flash kernel makes batch a grid axis (ONE launch), amortizing the
fixed kernel overhead that made single-item flash lose below T=1536.
This measures both paths at serving shapes to set the batched gate.

Usage: python scripts/time_enc_batch.py [B ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

import qwen3_asr_tpu.models.encoder as E
from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.ops.support import has_pallas_tpu

print("has_pallas_tpu:", has_pallas_tpu(), flush=True)
cfg = ASRModelConfig()
ecfg = cfg.encoder
params = jax.device_put(
    __import__("qwen3_asr_tpu.runtime.params", fromlist=["init_asr_params"])
    .init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)["encoder"])

BATCHES = [int(a) for a in sys.argv[1:]] or [4, 8]
N_FRAMES = int(os.environ.get("ENC_FRAMES", "9200"))  # 92 s bucket


def make_loop(flash: bool):
    @jax.jit
    def run(enc, mel_b, gp, gs, nv, n):
        def body(i, acc):
            m = mel_b.at[0, 0, 0].add(acc * 1e-9)
            if flash:
                h = E._encode_padded_core_batch(enc, ecfg, m, gp, gs, nv)
            else:
                h = jax.vmap(
                    lambda mm, a, b, c: E._encode_padded_core(
                        enc, ecfg, mm, a, b, c, allow_flash=False)
                )(m, gp, gs, nv)
            return acc + h[0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    return run


def timeit(name, fn, *args):
    jax.block_until_ready(fn(*args, 2))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(fn(*args, 4))
        t1 = time.perf_counter(); jax.block_until_ready(fn(*args, 12))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / 8 * 1e3)
    print(f"{name}: {best:.2f} ms", flush=True)
    return best


rng = np.random.default_rng(0)
for B in BATCHES:
    mel_b = jnp.asarray(
        rng.standard_normal((B, ecfg.n_mel_bins, N_FRAMES)) * 0.3,
        jnp.float32)
    n_frames = [N_FRAMES - 17 * b for b in range(B)]
    gaps = [E._gap_params(ecfg, n) for n in n_frames]
    gp = jnp.asarray([g[0] for g in gaps], jnp.int32)
    gs = jnp.asarray([g[1] for g in gaps], jnp.int32)
    nv = jnp.asarray([g[2] for g in gaps], jnp.int32)
    t_f = timeit(f"B{B}_flash", make_loop(True), params, mel_b, gp, gs, nv)
    t_x = timeit(f"B{B}_xla", make_loop(False), params, mel_b, gp, gs, nv)
    print(f"B={B} frames={N_FRAMES}: flash {t_f:.2f} xla {t_x:.2f} "
          f"({'flash' if t_f < t_x else 'xla'} wins, "
          f"{max(t_f, t_x) / min(t_f, t_x):.2f}x)", flush=True)
