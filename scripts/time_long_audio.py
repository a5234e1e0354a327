"""Long-audio robustness/perf check on the real chip.

Transcribes BENCH_AUDIO_SECONDS (default 300 s) of synthetic audio at the
real 0.6B hparams through the staged pipeline and reports per-stage wall
times plus which decode path the VMEM guard picked (megakernel vs XLA
fallback). Exercises the long-context story end-to-end: chunked conv,
flash encoder attention (T >= FLASH_MIN_T), and the decode guard
(ops/megakernel.py::mega_max_context).

Run:  cd /root/repo && nohup python scripts/time_long_audio.py \
          > /tmp/long_audio.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from qwen3_asr_tpu.audio.mel import generate_mel_filters, log_mel_spectrogram
    from qwen3_asr_tpu.config import ASRModelConfig
    from qwen3_asr_tpu.models.encoder import encode_audio
    from qwen3_asr_tpu.models.generate import generate_greedy
    from qwen3_asr_tpu.ops.megakernel import (
        mega_max_context,
        pack_megakernel_params,
    )
    from qwen3_asr_tpu.runtime.params import (
        fuse_decoder_params,
        init_asr_params,
        quantize_decoder_params,
    )
    from qwen3_asr_tpu.text.prompt import audio_start_pos, build_asr_prompt

    import dataclasses

    seconds = float(os.environ.get("BENCH_AUDIO_SECONDS", "300"))
    max_tokens = int(os.environ.get("BENCH_DECODE_TOKENS", "64"))
    quant = os.environ.get("BENCH_QUANT", "int4")

    cfg = ASRModelConfig()
    dcfg = dataclasses.replace(cfg.decoder, eos_token_id=-1)

    print(f"init {quant} params at real hparams...", flush=True)
    params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
    dec = jax.tree.map(np.asarray, params["decoder"])
    dec = fuse_decoder_params(quantize_decoder_params(dec, "int8pc"))
    dec["mega"] = pack_megakernel_params(dec, dcfg, int4=(quant == "int4"))
    params["decoder"] = jax.device_put(dec)
    params["encoder"] = jax.device_put(params["encoder"])

    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * 16000)) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 440 * t)
             + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
    audio = (audio * 32768.0).clip(-32768, 32767).astype(np.int16)
    filters = generate_mel_filters()

    cache_dtype = jnp.int8

    def run():
        t0 = time.perf_counter()
        mel = log_mel_spectrogram(audio, filters, as_numpy=False)
        mel.block_until_ready()
        t1 = time.perf_counter()
        feats = encode_audio(params["encoder"], cfg.encoder, mel)
        feats.block_until_ready()
        t2 = time.perf_counter()
        n_audio = int(feats.shape[0])
        prompt = build_asr_prompt(n_audio, dcfg)
        off = audio_start_pos(prompt, dcfg)
        n_prompt = len(prompt)
        P = -(-n_prompt // 128) * 128
        toks = np.full(P, dcfg.pad_token_id, np.int32)
        toks[:n_prompt] = prompt
        cap = P - (n_prompt - n_audio)
        audio_padded = jnp.zeros((cap, dcfg.hidden_size), feats.dtype)
        audio_padded = jax.lax.dynamic_update_slice(audio_padded, feats, (0, 0))
        S = -(-(P + max_tokens) // 128) * 128
        s_max = mega_max_context(dec["mega"], dcfg, kv_i8=True)
        print(f"T={n_audio} frames, prompt={n_prompt}, S={S}, "
              f"mega_max_context={s_max} -> "
              f"{'MEGAKERNEL' if S <= s_max else 'XLA fallback'}", flush=True)
        out, n_kept = generate_greedy(
            params["decoder"], dcfg, jnp.asarray(toks), jnp.int32(n_prompt),
            audio_padded, jnp.int32(n_audio), off, max_tokens,
            cache_dtype=cache_dtype)
        out.block_until_ready()
        t3 = time.perf_counter()
        return {"mel_ms": (t1 - t0) * 1e3, "encode_ms": (t2 - t1) * 1e3,
                "decode_ms": (t3 - t2) * 1e3, "total_ms": (t3 - t0) * 1e3,
                "n_tokens": int(n_kept)}

    print("cold run (compiles)...", flush=True)
    cold = run()
    print("cold:", cold, flush=True)
    times = [run() for _ in range(3)]
    best = min(times, key=lambda r: r["total_ms"])
    dec_ms_tok = best["decode_ms"] / max(1, best["n_tokens"])
    print("warm best:", {k: round(v, 1) for k, v in best.items()}, flush=True)
    print(f"decode ms/token: {dec_ms_tok:.3f}; "
          f"realtime x{seconds * 1e3 / best['total_ms']:.0f}", flush=True)


if __name__ == "__main__":
    main()
