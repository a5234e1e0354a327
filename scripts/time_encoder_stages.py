"""Differential timing of the ASR encoder's stages on the chip.

Separately jits (a) the conv frontend alone, (b) conv + conv_out + PE,
(c) the full encoder, at the 92 s workload shape. Differential iteration
counts cancel dispatch latency. Also times a channel-padded conv variant
(480 -> 512) to test whether MXU channel padding is the conv bottleneck.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.runtime.params import init_asr_params
from qwen3_asr_tpu.models.encoder import _conv_frontend, _encode_jit

cfg = ASRModelConfig()
params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
enc = params["encoder"]
ecfg = cfg.encoder

n_frames = 9188  # 92 s clip
chunk = ecfg.chunk_size
n_chunks = -(-n_frames // chunk)
rng = np.random.default_rng(0)
mel = jnp.asarray(rng.standard_normal((ecfg.n_mel_bins, n_frames)) * 0.3,
                  jnp.float32)
pad = n_chunks * chunk - n_frames
mel_p = jnp.pad(mel, ((0, 0), (0, pad)))
chunks = mel_p.reshape(ecfg.n_mel_bins, n_chunks, chunk).transpose(1, 0, 2)[:, None]
chunks = jax.device_put(chunks)


@jax.jit
def conv_only(enc, chunks, n):
    # acc feeds the next iteration's input: serializes the loop so XLA
    # cannot hoist the loop-invariant conv out of it
    def body(i, acc):
        f = _conv_frontend(enc, chunks.at[0, 0, 0, 0].add(acc * 1e-9))
        return acc + f[0, 0, 0].astype(jnp.float32)
    return jax.lax.fori_loop(0, n, body, jnp.float32(0))


@jax.jit
def full_enc(params, mel, n):
    def body(i, acc):
        h = _encode_jit.__wrapped__(params, ecfg,
                                    mel.at[0, 0].add(acc * 1e-9), n_frames)
        return acc + h[0, 0].astype(jnp.float32)
    return jax.lax.fori_loop(0, n, body, jnp.float32(0))


def timeit(name, fn, *args):
    r = fn(*args, 2); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(fn(*args, 4))
        t1 = time.perf_counter(); jax.block_until_ready(fn(*args, 20))
        t2 = time.perf_counter()
        ms = ((t2 - t1) - (t1 - t0)) / 16 * 1e3
        best = min(best, ms)
    print(f"{name}: {best:.2f} ms", flush=True)
    return best


c = timeit("conv_frontend", conv_only, enc, chunks)
f = timeit("full_encode", full_enc, params["encoder"], mel)
print(f"transformer+rest: {f - c:.2f} ms", flush=True)

# channel-padded conv: pad conv2/conv3 IO channels 480 -> 512
enc512 = dict(enc)
w2 = np.asarray(enc["conv2_w"], np.float32)  # [O, I, kh, kw]
w3 = np.asarray(enc["conv3_w"], np.float32)
b = lambda x: np.pad(np.asarray(x, np.float32), (0, 32))
enc512["conv1_w"] = jnp.asarray(
    np.pad(np.asarray(enc["conv1_w"], np.float32), ((0, 32), (0, 0), (0, 0), (0, 0))), jnp.bfloat16)
enc512["conv1_b"] = jnp.asarray(b(enc["conv1_b"]), jnp.bfloat16)
enc512["conv2_w"] = jnp.asarray(
    np.pad(w2, ((0, 32), (0, 32), (0, 0), (0, 0))), jnp.bfloat16)
enc512["conv2_b"] = jnp.asarray(b(enc["conv2_b"]), jnp.bfloat16)
enc512["conv3_w"] = jnp.asarray(
    np.pad(w3, ((0, 32), (0, 32), (0, 0), (0, 0))), jnp.bfloat16)
enc512["conv3_b"] = jnp.asarray(b(enc["conv3_b"]), jnp.bfloat16)
# conv_out maps (c*H) features; padded channels add rows we must also pad
H_after = 16  # 128 -> 64 -> 32 -> 16
co = np.asarray(enc["conv_out_w"], np.float32)  # [C*H, d]
co512 = np.zeros((512 * H_after, co.shape[1]), np.float32)
co512[: co.shape[0]] = co  # feature index = c*H + h: first 480*H rows real
enc512["conv_out_w"] = jnp.asarray(co512, jnp.bfloat16)
timeit("conv_frontend_c512", conv_only, enc512, chunks)
