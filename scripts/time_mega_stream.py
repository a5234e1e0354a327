"""Streamed-KV megakernel on chip: compile + step-time vs the resident
kernel (92 s workload) and at long contexts the resident kernel cannot fit
(S=4096/8192 — past mega_max_context for int8 KV).

Usage: python scripts/time_mega_stream.py [n_steps]
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.runtime.params import (
    init_asr_params, quantize_decoder_params, fuse_decoder_params)
from qwen3_asr_tpu.ops.megakernel import (
    block_kv_scales, pack_megakernel_params, mega_decode_step_i8,
    mega_max_context)
from qwen3_asr_tpu.ops.support import has_pallas_tpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
print("has_pallas_tpu:", has_pallas_tpu())
cfg = ASRModelConfig()
params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
dec = fuse_decoder_params(quantize_decoder_params(params["decoder"], "int8pc"))
dcfg = cfg.decoder
mega = jax.device_put(pack_megakernel_params(dec, dcfg))
print("resident max context (int8 KV):",
      mega_max_context(mega, dcfg, kv_i8=True))

L = dcfg.n_layers
NKV = dcfg.n_kv_heads
DKV = NKV * dcfg.head_dim
rng = np.random.default_rng(0)
x = jnp.ones((1, dcfg.hidden_size), jnp.bfloat16)


def run(S, pos0, kv_stream, label):
    k3 = jnp.asarray(rng.integers(-80, 80, (L, S, DKV)), jnp.int8)
    v3 = jnp.asarray(rng.integers(-80, 80, (L, S, DKV)), jnp.int8)
    if kv_stream:
        ks = jnp.full((L, S // 256, NKV, 256), 0.01, jnp.float32)
        vs = jnp.full((L, S // 256, NKV, 256), 0.01, jnp.float32)
    else:
        ks = jnp.full((L, NKV, S), 0.01, jnp.float32)
        vs = jnp.full((L, NKV, S), 0.01, jnp.float32)

    @jax.jit
    def loop(mega, x, k3, v3, ks, vs, n):
        def body(i, st):
            x, k3, v3, ks, vs, tok = st
            nxt, k3, v3, ks, vs, _ = mega_decode_step_i8(
                mega, dcfg, x, jnp.int32(pos0) + i, k3, v3, ks, vs,
                kv_stream=kv_stream)
            return x, k3, v3, ks, vs, nxt
        return jax.lax.fori_loop(0, n, body, (x, k3, v3, ks, vs, jnp.int32(0)))

    r = loop(mega, x, k3, v3, ks, vs, N)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop(mega, x, k3, v3, ks, vs, N)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) * 1e3)
    print(f"{label}: {best/N:.3f} ms/step ({N/best*1e3:.0f} tok/s)  "
          f"[S={S}, pos0={pos0}]")
    return best / N


# correctness on chip: resident vs streamed token at the same state
def check_tokens(S, pos):
    k3 = np.asarray(rng.integers(-80, 80, (L, S, DKV)), np.int8)
    v3 = np.asarray(rng.integers(-80, 80, (L, S, DKV)), np.int8)
    ks = np.abs(rng.standard_normal((L, S, NKV))).astype(np.float32) * 0.01
    vs = np.abs(rng.standard_normal((L, S, NKV))).astype(np.float32) * 0.01
    tr, _, _, _, _, hr = mega_decode_step_i8(
        mega, dcfg, x, jnp.int32(pos), jnp.asarray(k3), jnp.asarray(v3),
        jnp.asarray(ks.transpose(0, 2, 1)), jnp.asarray(vs.transpose(0, 2, 1)))
    ts, _, _, _, _, hs = mega_decode_step_i8(
        mega, dcfg, x, jnp.int32(pos), jnp.asarray(k3), jnp.asarray(v3),
        block_kv_scales(jnp.asarray(ks)), block_kv_scales(jnp.asarray(vs)),
        kv_stream=True)
    d = float(jnp.max(jnp.abs(hr - hs)))
    print(f"token resident={int(tr)} streamed={int(ts)} h_dbg maxdiff={d:.3e}")
    assert int(tr) == int(ts)


# streamed mode needs S % KV_BLOCK == 0 (generate.py rounds S up to 256)
check_tokens(1792, 1300)
run(1664, 1219, False, "resident  92s")
run(1792, 1219, True,  "streamed  92s")
# pos0 + N must stay < S (past-the-end blocks would DMA out of bounds)
run(4096, 4096 - N - 8, True,  "streamed long")
run(8192, 8192 - N - 8, True,  "streamed vlong")
