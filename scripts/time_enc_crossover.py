"""Encoder attention: flash vs XLA crossover in T, and upload parallelism.

probe_conv2 measured XLA attention beating flash at T=1196 (10.90 vs
12.39 ms full encode). This measures larger T to pick the gate, and
whether two concurrent device_put streams beat one (the 2.9 MB PCM
upload runs at ~45 MB/s over the tunnel — TCP-window-bound?).
"""
import sys, os, time
from concurrent.futures import ThreadPoolExecutor
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.runtime.params import init_asr_params
import qwen3_asr_tpu.models.encoder as E
from qwen3_asr_tpu.ops.support import has_pallas_tpu

print("has_pallas_tpu:", has_pallas_tpu(), flush=True)
cfg = ASRModelConfig()
ecfg = cfg.encoder
params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
enc = jax.device_put(params["encoder"])


def enc_loop(n_frames, allow_flash):
    @jax.jit
    def run(enc, mel, n):
        def body(i, acc):
            h = E._encode_jit.__wrapped__(
                enc, ecfg, mel.at[0, 0].add(acc * 1e-9), n_frames,
                allow_flash)
            return acc + h[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    return run


def timeit(name, fn, *args):
    r = fn(*args, 2); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(fn(*args, 4))
        t1 = time.perf_counter(); jax.block_until_ready(fn(*args, 12))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / 8 * 1e3)
    print(f"{name}: {best:.2f} ms", flush=True)
    return best


rng = np.random.default_rng(0)
for n_frames in (9188, 18376, 36752):   # 92 s, 184 s, 368 s -> T=1196/2392/4784
    mel = jnp.asarray(rng.standard_normal((ecfg.n_mel_bins, n_frames)) * 0.3,
                      jnp.float32)
    t_f = timeit(f"enc_T{n_frames//768*100}_flash", enc_loop(n_frames, True), enc, mel)
    t_x = timeit(f"enc_T{n_frames//768*100}_xla", enc_loop(n_frames, False), enc, mel)
    print(f"n_frames={n_frames}: flash {t_f:.2f} xla {t_x:.2f} "
          f"({'xla' if t_x < t_f else 'flash'} wins)", flush=True)

# ---- upload parallelism ----
pcm = np.random.default_rng(1).integers(-2**14, 2**14, 92 * 16000,
                                        dtype=np.int16)
halves = np.split(pcm, 2)
quarters = np.split(pcm, 4)
pool = ThreadPoolExecutor(4)


def t_upload(fn, reps=5):
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        best = min(best, (t1 - t0) * 1e3)
        del out
    return best


print(f"put_whole_2.9MB: {t_upload(lambda: jax.device_put(pcm)):.1f} ms",
      flush=True)
print(f"put_2x1.45MB_seq: "
      f"{t_upload(lambda: [jax.device_put(h) for h in halves]):.1f} ms",
      flush=True)
print(f"put_2x1.45MB_par: "
      f"{t_upload(lambda: list(pool.map(jax.device_put, halves))):.1f} ms",
      flush=True)
print(f"put_4x0.73MB_par: "
      f"{t_upload(lambda: list(pool.map(jax.device_put, quarters))):.1f} ms",
      flush=True)
