"""Focused int4-weights + int8-KV decode stepper: times N megakernel
steps (no prefill/mel/encoder) at the 92 s context shape. Fast iteration
harness for ring/scale/compute experiments — compare against the
0.526 ms/step r5 profile figure (scripts/profile_decode_ops.py).

Usage: [QWEN3_INT4_GROUP=1024] python scripts/time_step_i4.py [steps]
"""
import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.runtime.params import (
    init_asr_params, quantize_decoder_params, fuse_decoder_params,
    host_staging, ship_to_device)
from qwen3_asr_tpu.ops.megakernel import (
    pack_megakernel_params, mega_decode_step_i8)
from qwen3_asr_tpu.ops.support import has_pallas_tpu

from qwen3_asr_tpu.ops import megakernel as mk

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
# geometry overrides for A/B runs (pack + kernel read the constants)
if os.environ.get("STEP_CO"):
    mk.INT4_CHUNK_OUT = int(os.environ["STEP_CO"])
if os.environ.get("STEP_NBUF"):
    mk.INT4_NBUF = int(os.environ["STEP_NBUF"])
if os.environ.get("STEP_CI"):
    mk.CHUNK_IN = int(os.environ["STEP_CI"])
print("has_pallas_tpu:", has_pallas_tpu(),
      "group:", os.environ.get("QWEN3_INT4_GROUP", "512"),
      "co:", mk.INT4_CHUNK_OUT, "ci:", mk.CHUNK_IN, "nbuf<=", mk.INT4_NBUF,
      file=sys.stderr)
cfg = ASRModelConfig()
dcfg = cfg.decoder
with host_staging():
    params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
    dec = quantize_decoder_params(params["decoder"], "int8pc")
    dec = fuse_decoder_params(dec)
    mega = pack_megakernel_params(dec, dcfg, int4=True)
mega = ship_to_device(mega)

L, S = dcfg.n_layers, 1664
DKV = dcfg.n_kv_heads * dcfg.head_dim
NKV = dcfg.n_kv_heads
rng = np.random.default_rng(0)
k3 = jnp.asarray(rng.integers(-127, 127, (L, S, DKV)), jnp.int8)
v3 = jnp.asarray(rng.integers(-127, 127, (L, S, DKV)), jnp.int8)
ks = jnp.asarray(rng.random((L, NKV, S)) * 0.01 + 0.001, jnp.float32)
vs = jnp.asarray(rng.random((L, NKV, S)) * 0.01 + 0.001, jnp.float32)
x = jnp.ones((1, dcfg.hidden_size), jnp.bfloat16)

POS = int(os.environ.get("STEP_POS", "1219"))  # 1 => no live KV blocks


@jax.jit
def loop(mega, x, k3, v3, ks, vs, n):
    def body(i, st):
        x, k3, v3, ks, vs, tok = st
        nxt, k3, v3, ks, vs, _ = mega_decode_step_i8(
            mega, dcfg, x, jnp.int32(POS), k3, v3, ks, vs)
        return x, k3, v3, ks, vs, nxt
    return jax.lax.fori_loop(0, n, body, (x, k3, v3, ks, vs, jnp.int32(0)))

r = loop(mega, x, k3, v3, ks, vs, N); jax.block_until_ready(r)
best = 1e9
for trial in range(4):
    t0 = time.perf_counter()
    r = loop(mega, x, k3, v3, ks, vs, N); jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) * 1e3
    best = min(best, dt)
    print(f"step: {dt/N:.4f} ms ({N/dt*1e3:.0f} tok/s)")
print(f"best: {best/N:.4f} ms/step")
