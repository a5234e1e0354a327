"""One-session chip probe: decode-loop glue, encoder split, link costs.

(a) decode glue: the real generate_greedy while_loop body (embedding take +
    out scatter + EOS cond) vs the bare fori_loop over mega_decode_step_i8
    — the ~0.05 ms/step gap seen between bench (0.566) and probe (0.517).
(b) encoder: full (flash) vs XLA attention vs a no-attention matmul proxy,
    to locate the 12.55 ms.
(c) link: device_put of the 92 s int16 PCM, empty-dispatch RT, small fetch.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.runtime.params import (
    init_asr_params, quantize_decoder_params, fuse_decoder_params)
from qwen3_asr_tpu.ops.megakernel import (
    pack_megakernel_params, mega_decode_step_i8)
from qwen3_asr_tpu.ops.support import has_pallas_tpu

print("has_pallas_tpu:", has_pallas_tpu(), flush=True)
cfg = ASRModelConfig()
dcfg = cfg.decoder
params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
dec = fuse_decoder_params(quantize_decoder_params(params["decoder"], "int8pc"))
mega = jax.device_put(pack_megakernel_params(dec, dcfg, int4=True))
embd = jax.device_put(params["decoder"]["token_embd"])

L, S = dcfg.n_layers, 1664
NKV, D = dcfg.n_kv_heads, dcfg.head_dim
DKV = NKV * D
rng = np.random.default_rng(0)
k8 = jnp.asarray(rng.integers(-127, 128, (L, S, DKV)), jnp.int8)
v8 = jnp.asarray(rng.integers(-127, 128, (L, S, DKV)), jnp.int8)
ks = jnp.asarray(rng.random((L, NKV, S)) * 0.01 + 0.001, jnp.float32)
vs = jnp.asarray(rng.random((L, NKV, S)) * 0.01 + 0.001, jnp.float32)
x = jnp.ones((1, dcfg.hidden_size), jnp.bfloat16)


@jax.jit
def loop_bare(mega, x, k3, v3, ks, vs, n):
    def body(i, st):
        x, k3, v3, ks, vs, tok = st
        nxt, k3, v3, ks, vs, _ = mega_decode_step_i8(
            mega, dcfg, x, jnp.int32(1219) + i, k3, v3, ks, vs)
        return x, k3, v3, ks, vs, nxt
    return jax.lax.fori_loop(0, n, body, (x, k3, v3, ks, vs, jnp.int32(0)))


@jax.jit
def loop_real(mega, embd, k3, v3, ks, vs, n):
    """generate_greedy's actual mega loop body: take + out scatter +
    while cond with EOS test."""
    out0 = jnp.zeros((512,), jnp.int32)

    def cond(st):
        i, tok = st[0], st[1]
        return (tok != dcfg.eos_token_id) & (i < n)

    def body(st):
        i, tok, k3, v3, ks, vs, out = st
        xx = jnp.take(embd, tok[None], axis=0)
        nxt, k3, v3, ks, vs, _ = mega_decode_step_i8(
            mega, dcfg, xx, jnp.int32(1219) + i, k3, v3, ks, vs)
        return i + 1, nxt, k3, v3, ks, vs, out.at[i].set(nxt)

    st = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(5), k3, v3, ks, vs, out0))
    return st[1], st[6]


def timeit(name, fn, args, n_small=32, n_big=288, per_step=True):
    r = fn(*args, 16); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(fn(*args, n_small))
        t1 = time.perf_counter(); jax.block_until_ready(fn(*args, n_big))
        t2 = time.perf_counter()
        ms = ((t2 - t1) - (t1 - t0)) / (n_big - n_small) * 1e3
        best = min(best, ms)
    unit = "ms/step" if per_step else "ms"
    print(f"{name}: {best:.3f} {unit}", flush=True)
    return best


b = timeit("loop_bare_i8", loop_bare, (mega, x, k8, v8, ks, vs))
r = timeit("loop_real_i8", loop_real, (mega, embd, k8, v8, ks, vs))
print(f"glue: {r - b:.3f} ms/step -> {(r - b) * 323:.1f} ms over 323 tok",
      flush=True)

# ---- encoder splits --------------------------------------------------------
from qwen3_asr_tpu.models import encoder as E

ecfg = cfg.encoder
enc = jax.device_put(params["encoder"])
n_frames = 9188
mel = jnp.asarray(rng.standard_normal((ecfg.n_mel_bins, n_frames)) * 0.3,
                  jnp.float32)


def enc_loop(allow_flash):
    @jax.jit
    def run(enc, mel, n):
        def body(i, acc):
            h = E._encode_jit.__wrapped__(
                enc, ecfg, mel.at[0, 0].add(acc * 1e-9), n_frames,
            ) if allow_flash else _encode_noflash(enc, mel, acc)
            return acc + h[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    return run


def _encode_noflash(enc, mel, acc):
    # same as _encode_jit but with allow_flash=False blocks
    import qwen3_asr_tpu.ops.support as sup
    real = sup.has_pallas_tpu
    sup.has_pallas_tpu = lambda: False
    try:
        return E._encode_jit.__wrapped__(
            enc, ecfg, mel.at[0, 0].add(acc * 1e-9), n_frames)
    finally:
        sup.has_pallas_tpu = real


T = 1196
h0 = jnp.asarray(rng.standard_normal((T, ecfg.d_model)) * 0.1, jnp.bfloat16)


@jax.jit
def enc_matmuls_only(enc, h, n):
    """18 layers of the block's matmul/LN/gelu work with attention stubbed
    to identity — isolates the non-attention cost."""
    def body(i, carry):
        acc, h = carry, None
        hh = acc
        def layer(hc, lp):
            x = E._layer_norm(hc, lp["attn_norm_w"], lp["attn_norm_b"],
                              ecfg.layer_norm_eps)
            q = x @ lp["wq"] + lp["bq"]
            k = x @ lp["wk"] + lp["bk"]
            v = x @ lp["wv"] + lp["bv"]
            attn = q + k + v   # stub: no attention
            hc = hc + (attn @ lp["wo"] + lp["bo"])
            x = E._layer_norm(hc, lp["ffn_norm_w"], lp["ffn_norm_b"],
                              ecfg.layer_norm_eps)
            x = jax.nn.gelu(x @ lp["w_up"] + lp["b_up"], approximate=False)
            return hc + (x @ lp["w_down"] + lp["b_down"]), None
        hh, _ = jax.lax.scan(layer, hh, enc["layers"])
        return hh
    # serialize iterations through the carry
    def outer(i, acc):
        hh = body(i, h + (acc * 1e-9).astype(h.dtype))
        return acc + hh[0, 0].astype(jnp.float32)
    return jax.lax.fori_loop(0, n, outer, jnp.float32(0))


timeit("enc_full_flash", enc_loop(True), (enc, mel), 4, 20, per_step=False)
timeit("enc_xla_attn", enc_loop(False), (enc, mel), 4, 20, per_step=False)
timeit("enc_matmuls_only", enc_matmuls_only, (enc, h0), 4, 20, per_step=False)

# flash attention alone at encoder shapes
from qwen3_asr_tpu.ops.pallas_attention import flash_attention

q = jnp.asarray(rng.standard_normal((T, ecfg.n_heads, ecfg.head_dim)) * 0.1,
                jnp.bfloat16)


@jax.jit
def flash_loop(q, n):
    def body(i, acc):
        qq = q.at[0, 0, 0].add((acc * 1e-9).astype(q.dtype))
        a = flash_attention(qq, qq, qq, jnp.int32(T), causal=False,
                            scale=0.125)
        return acc + a[0, 0, 0].astype(jnp.float32)
    return jax.lax.fori_loop(0, n, body, jnp.float32(0))


def flash_t(name, n):
    r = flash_loop(q, 2); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(flash_loop(q, 4))
        t1 = time.perf_counter(); jax.block_until_ready(flash_loop(q, 40))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / 36 * 1e3)
    print(f"{name}: {best:.3f} ms (x18 = {best * 18:.2f})", flush=True)


flash_t("flash_1196x14x64", 1)

# ---- link costs ------------------------------------------------------------
buf = np.zeros((n_frames + 2) * 160, np.int16)
tiny = jnp.zeros((8, 128), jnp.float32)
add1 = jax.jit(lambda a: a + 1)
jax.block_until_ready(add1(tiny))
for name, fn in (
    ("device_put_2.9MB_int16", lambda: jax.block_until_ready(
        jax.device_put(buf))),
    ("tiny_dispatch_rt", lambda: jax.block_until_ready(add1(tiny))),
    ("fetch_512_int32", lambda: jax.device_get(
        jnp.zeros(512, jnp.int32))),
):
    ts = []
    for _ in range(6):
        t0 = time.perf_counter(); fn(); ts.append(
            (time.perf_counter() - t0) * 1e3)
    print(f"{name}: min {min(ts):.1f} ms  med {sorted(ts)[3]:.1f} ms",
          flush=True)
