"""Clean conv-frontend timing: DCE-proof, plus an im2col-matmul variant.

The earlier conv_only probe consumed one output element, letting XLA
slice away nearly the whole conv — this one folds the full output into
the accumulator. The im2col variant lowers each stride-2 3x3 conv to one
MXU matmul over extracted patches.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.runtime.params import init_asr_params
from qwen3_asr_tpu.models.encoder import _conv_frontend
import qwen3_asr_tpu.models.encoder as E

cfg = ASRModelConfig()
ecfg = cfg.encoder
params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
enc = jax.device_put(params["encoder"])

n_frames = 9188
chunk = ecfg.chunk_size
n_chunks = -(-n_frames // chunk)
rng = np.random.default_rng(0)
mel = jnp.asarray(rng.standard_normal((ecfg.n_mel_bins, n_frames)) * 0.3,
                  jnp.float32)
pad = n_chunks * chunk - n_frames
mel_p = jnp.pad(mel, ((0, 0), (0, pad)))
chunks = jax.device_put(
    mel_p.reshape(ecfg.n_mel_bins, n_chunks, chunk).transpose(1, 0, 2)[:, None])


def mk_loop(fn):
    @jax.jit
    def run(enc, chunks, n):
        def body(i, acc):
            c = chunks.at[0, 0, 0, 0].add(acc * 1e-9)
            f = fn(enc, c)
            return acc + jnp.sum(f.astype(jnp.float32)) * 1e-9
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    return run


def im2col_conv(x, w):
    """stride-2 3x3 'same' conv as one matmul. x [B,H,W,C] -> [B,H/2,W/2,O]
    f32. Patch (kh, kw) of output (i, j) reads x[2i+kh-1, 2j+kw-1]."""
    B, H, W, C = x.shape
    O = w.shape[3]  # w [kh, kw, C, O] HWIO
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = []
    for kh in range(3):
        for kw in range(3):
            cols.append(jax.lax.slice(
                xp, (0, kh, kw, 0), (B, kh + H, kw + W, C), (1, 2, 2, 1)))
    pat = jnp.concatenate(cols, axis=-1)           # [B, H/2, W/2, 9C]
    y = jnp.dot(pat.reshape(-1, 9 * C), w.reshape(9 * C, O),
                preferred_element_type=jnp.float32)
    return y.reshape(B, (H + 1) // 2, (W + 1) // 2, O)


def conv_im2col(params, chunks, dtype=jnp.bfloat16):
    x = chunks.transpose(0, 2, 3, 1).astype(dtype)  # [B, H, W, 1]
    for i in (1, 2, 3):
        # conv{i}_w is [O, I, kh, kw]; HWIO = (2, 3, 1, 0)
        w = jnp.transpose(params[f"conv{i}_w"], (2, 3, 1, 0)).astype(dtype)
        b = params[f"conv{i}_b"].astype(jnp.float32)
        y = im2col_conv(x, w)
        x = jax.nn.gelu(y + b[None, None, None, :],
                        approximate=False).astype(dtype)
    B, H, W, C = x.shape
    return jnp.transpose(x, (0, 2, 3, 1)).reshape(B, W, C * H)


def timeit(name, fn, *args):
    r = fn(*args, 2); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(fn(*args, 4))
        t1 = time.perf_counter(); jax.block_until_ready(fn(*args, 20))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / 16 * 1e3)
    print(f"{name}: {best:.2f} ms", flush=True)
    return best


# correctness of the im2col formulation first (on-device, cheap)
ref = _conv_frontend(enc, chunks[:2])
new = conv_im2col(enc, chunks[:2])
err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - new.astype(jnp.float32))))
print(f"im2col max abs err vs lax.conv: {err:.4f}", flush=True)

timeit("conv_xla_full", mk_loop(lambda e, c: _conv_frontend(e, c)), enc, chunks)
timeit("conv_im2col", mk_loop(conv_im2col), enc, chunks)

# clean flash-vs-XLA encoder attention re-measure (serialized in this job)
def enc_loop(allow_flash):
    @jax.jit
    def run(enc, mel, n):
        def body(i, acc):
            import qwen3_asr_tpu.ops.support as sup
            h = E._encode_jit.__wrapped__(
                enc, ecfg, mel.at[0, 0].add(acc * 1e-9), n_frames)
            return acc + h[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    return run


import qwen3_asr_tpu.ops.support as sup
timeit("enc_full_flash", enc_loop(True), enc, mel)
real = sup.has_pallas_tpu
sup.has_pallas_tpu = lambda: False
try:
    timeit("enc_xla_attn", enc_loop(False), enc, mel)
finally:
    sup.has_pallas_tpu = real
