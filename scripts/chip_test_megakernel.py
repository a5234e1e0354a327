#!/usr/bin/env python3
"""Megakernel on-chip validation + timing at real Qwen3-ASR-0.6B hparams.

1. correctness: N greedy decode steps, megakernel vs the XLA int8pc path,
   starting from the same XLA-prefilled cache — tokens must match.
2. timing: slope method (t(1+k passes) - t(1 pass)) on k*STEPS-step loops.

Run from /root/repo on the chip: python scripts/chip_test_megakernel.py
Env: MK_PROMPT (default 1280), MK_STEPS (default 64), MK_CHECK (default 8)
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


def main():
    from qwen3_asr_tpu.config import ASRModelConfig
    from qwen3_asr_tpu.models.decoder import (
        decoder_forward,
        embed_with_audio,
        init_kv_cache,
        lm_logits,
    )
    from qwen3_asr_tpu.ops.megakernel import (
        mega_decode_step,
        pack_megakernel_params,
    )
    from qwen3_asr_tpu.runtime.params import (
        fuse_decoder_params,
        init_decoder_params,
        quantize_decoder_params,
    )

    P = int(os.environ.get("MK_PROMPT", "1280"))
    steps = int(os.environ.get("MK_STEPS", "64"))
    n_check = int(os.environ.get("MK_CHECK", "8"))

    cfg = ASRModelConfig().decoder
    print(f"device {jax.devices()[0]}; prompt {P}, steps {steps}",
          file=sys.stderr, flush=True)
    dec = init_decoder_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    dec = fuse_decoder_params(quantize_decoder_params(
        jax.tree.map(np.asarray, dec), "int8pc"))
    mega = pack_megakernel_params(dec, cfg)
    dec = jax.device_put(dec)
    mega = jax.device_put(mega)

    S = P + steps + 8
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(1, 100000, size=P), jnp.int32)

    # ---- compile the megakernel FIRST (fail fast on Mosaic issues) --------
    L, DKV = cfg.n_layers, cfg.n_kv_heads * cfg.head_dim
    t0 = time.perf_counter()
    tok_probe, _, _, _ = mega_decode_step(
        mega, cfg, jnp.zeros((1, cfg.hidden_size), jnp.bfloat16),
        jnp.int32(P),
        jnp.zeros((L, S, DKV), jnp.bfloat16),
        jnp.zeros((L, S, DKV), jnp.bfloat16))
    tok_probe.block_until_ready()
    print(f"mega kernel compiled+ran in {time.perf_counter()-t0:.1f}s "
          f"(probe token {int(tok_probe)})", flush=True)

    # ---- prefill on the XLA path ------------------------------------------
    @jax.jit
    def prefill(prompt):
        cache = init_kv_cache(cfg, S, jnp.bfloat16)
        h0 = embed_with_audio(dec, prompt, None, 0, 0)
        h, cache = decoder_forward(
            dec, cfg, h0, jnp.arange(P, dtype=jnp.int32), cache,
            cache_offset=jnp.int32(0), kv_valid_len=jnp.int32(P),
            prefill=True)
        tok = jnp.argmax(lm_logits(dec, cfg, h[-1])).astype(jnp.int32)
        return tok, cache

    t0 = time.perf_counter()
    tok0, cache0 = prefill(prompt)
    tok0.block_until_ready()
    print(f"prefill ok ({time.perf_counter()-t0:.1f}s incl compile); "
          f"first token {int(tok0)}", file=sys.stderr, flush=True)

    # ---- correctness: n_check steps both ways ------------------------------
    @jax.jit
    def xla_step(tok, pos, cache):
        h0 = jnp.take(dec["token_embd"], tok[None], axis=0)
        h, cache = decoder_forward(dec, cfg, h0, pos[None], cache,
                                   cache_offset=pos, kv_valid_len=pos + 1)
        return jnp.argmax(lm_logits(dec, cfg, h[0])).astype(jnp.int32), cache

    k_m = cache0["k"].reshape(L, S, DKV)
    v_m = cache0["v"].reshape(L, S, DKV)
    cache = cache0
    tok_r = tok_m = tok0
    ok = True
    t0 = time.perf_counter()
    for i in range(n_check):
        pos = jnp.int32(P + i)
        tok_r, cache = xla_step(tok_r, pos, cache)
        x = jnp.take(dec["token_embd"], tok_m[None], axis=0)
        tok_m, k_m, v_m, _ = mega_decode_step(mega, cfg, x, pos, k_m, v_m)
        a, b = int(tok_r), int(tok_m)
        match = "OK" if a == b else "MISMATCH"
        if a != b:
            ok = False
        print(f"step {i}: xla {a} mega {b} {match}", flush=True)
    print(f"correctness loop: {time.perf_counter()-t0:.1f}s (incl compiles)",
          file=sys.stderr, flush=True)
    if not ok:
        print("TOKEN MISMATCH — stopping before timing", flush=True)
        return 1

    # ---- timing -------------------------------------------------------------
    def time_loop(step_fn, state, n_passes):
        def one_pass(state):
            def body(i, st):
                return step_fn(i, st)
            return jax.lax.fori_loop(0, steps, body, state)

        run = jax.jit(lambda st, n: jax.lax.fori_loop(
            0, n, lambda _, s: one_pass(s), st))
        jax.block_until_ready(run(state, 1))
        t0 = time.perf_counter()
        jax.block_until_ready(run(state, 1))
        t1 = time.perf_counter()
        jax.block_until_ready(run(state, 1 + n_passes))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (n_passes * steps)

    def mega_body(i, st):
        tok, k, v = st
        x = jnp.take(dec["token_embd"], tok[None], axis=0)
        tok2, k, v, _ = mega_decode_step(mega, cfg, x, jnp.int32(P) + i, k, v)
        return tok2, k, v

    def xla_body(i, st):
        tok, cache = st
        pos = jnp.int32(P) + i
        h0 = jnp.take(dec["token_embd"], tok[None], axis=0)
        h, cache = decoder_forward(dec, cfg, h0, pos[None], cache,
                                   cache_offset=pos, kv_valid_len=pos + 1)
        return (jnp.argmax(lm_logits(dec, cfg, h[0])).astype(jnp.int32),
                cache)

    dt_mega = time_loop(mega_body, (tok0, k_m, v_m), 4)
    print(f"mega : {dt_mega*1e3:.3f} ms/step  "
          f"({1/dt_mega:.0f} tok/s)", flush=True)
    dt_xla = time_loop(xla_body, (tok0, cache0), 4)
    print(f"xla  : {dt_xla*1e3:.3f} ms/step  "
          f"({1/dt_xla:.0f} tok/s)", flush=True)
    print(f"speedup: {dt_xla/dt_mega:.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
