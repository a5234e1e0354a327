"""Is the megakernel's drift vs the XLA decode path benign rounding or a bug?

Build an f32 oracle from the SAME int8pc weights (dequantized to dense f32),
run one decode step in f32, and measure each bf16 path's error against it.
If |mega - oracle| ~ |xla - oracle|, both are valid bf16 evaluations and the
mega-vs-xla gap is op-ordering rounding, not a kernel bug.
"""
import sys, os, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.runtime.params import init_asr_params, quantize_decoder_params, fuse_decoder_params
from qwen3_asr_tpu.ops.megakernel import pack_megakernel_params, mega_decode_step
from qwen3_asr_tpu.models.decoder import decoder_forward

cfg = ASRModelConfig()
dcfg = cfg.decoder
params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
dec_q = fuse_decoder_params(quantize_decoder_params(params["decoder"], "int8pc"))


def dequant_dense(dec, dtype):
    """int8pc leaves -> dense weights of `dtype`; everything else cast."""
    out = {}
    for k, v in dec.items():
        if k == "layers":
            lay = {}
            for kk, vv in v.items():
                if isinstance(vv, dict) and "i8pc:q" in vv:
                    q = np.asarray(vv["i8pc:q"], np.float32)
                    s = np.asarray(vv["i8pc:s"], np.float32)
                    lay[kk] = jnp.asarray(q * s[:, None, :], dtype)  # [L,in,out]
                else:
                    lay[kk] = jnp.asarray(vv, dtype)
            out["layers"] = lay
        elif isinstance(v, dict):
            continue  # lm_head_pc: oracle uses tied embd instead
        else:
            out[k] = jnp.asarray(v, dtype)
    return out


dec_f32 = dequant_dense(dec_q, jnp.float32)
cfg_noker = dataclasses.replace(dcfg, use_decode_attn_kernel=False)

S = 64
L, NKV, D, H = dcfg.n_layers, dcfg.n_kv_heads, dcfg.head_dim, dcfg.hidden_size
DKV = NKV * D
k0 = jax.random.normal(jax.random.PRNGKey(1), (L, S, DKV), jnp.bfloat16) * 0.3
v0 = jax.random.normal(jax.random.PRNGKey(2), (L, S, DKV), jnp.bfloat16) * 0.3
x = jax.random.normal(jax.random.PRNGKey(3), (1, H), jnp.bfloat16)
pos = jnp.int32(33)

# mega path (bf16 weights int8, f32 residual inside kernel)
mega = jax.device_put(pack_megakernel_params(dec_q, dcfg))
_, _, _, h_m = mega_decode_step(mega, dcfg, x, pos,
                                jnp.array(k0), jnp.array(v0))

# XLA bf16 path on the same quantized weights
cache_b = {"k": k0.reshape(L, S, NKV, D), "v": v0.reshape(L, S, NKV, D)}
h_x, _ = decoder_forward(dec_q, dcfg, x, pos[None], cache_b,
                         cache_offset=pos, kv_valid_len=pos + 1)

# f32 oracle: dense dequantized weights, f32 activations + cache
cache_f = {"k": k0.astype(jnp.float32).reshape(L, S, NKV, D),
           "v": v0.astype(jnp.float32).reshape(L, S, NKV, D)}
h_o, _ = decoder_forward(dec_f32, cfg_noker, x.astype(jnp.float32),
                         pos[None], cache_f,
                         cache_offset=pos, kv_valid_len=pos + 1)

hm = np.asarray(h_m, np.float32).ravel()
hx = np.asarray(h_x[0], np.float32).ravel()
ho = np.asarray(h_o[0], np.float32).ravel()
den = np.abs(ho).max()
print(f"max|oracle|      = {den:.4f}")
print(f"mega vs oracle:  max={np.abs(hm-ho).max():.5f}  rel={np.abs(hm-ho).max()/den:.2e}  rms={np.sqrt(((hm-ho)**2).mean()):.5f}")
print(f"xla  vs oracle:  max={np.abs(hx-ho).max():.5f}  rel={np.abs(hx-ho).max()/den:.2e}  rms={np.sqrt(((hx-ho)**2).mean()):.5f}")
print(f"mega vs xla:     max={np.abs(hm-hx).max():.5f}")
