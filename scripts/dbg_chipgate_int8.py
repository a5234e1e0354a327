#!/usr/bin/env python3
"""Diagnose the mega_int8_vs_xla chipgate failure (VERDICT r4 weak#2).

Reproduces the gate's exact setup (seed-0 synthetic 0.6B params, int8pc
quantize + fuse, PROMPT=256, STEPS=16), then runs the int8 megakernel and
the XLA int8pc step SIDE BY SIDE with teacher forcing on the XLA token
sequence, reading back per step:
  - both argmax tokens,
  - the XLA step's full f32 logits (top-2 gap at each step),
  - the megakernel's pre-final-norm hidden h_dbg vs the XLA step's h,
  - the lm-head logits recomputed (XLA math) from BOTH hiddens.

If hiddens agree to f32-rounding and the divergent step has a ~0 top-2
logit gap, the failure is an argmax near-tie from the documented f32
scale-multiply-order difference (ops/megakernel.py header), not a kernel
defect. Run: python scripts/dbg_chipgate_int8.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.models.decoder import decoder_forward, lm_logits, rms_norm
from qwen3_asr_tpu.models.generate import init_kv_cache, prefill_only
from qwen3_asr_tpu.ops import megakernel as mk
from qwen3_asr_tpu.runtime.params import (
    fuse_decoder_params,
    host_staging,
    init_asr_params,
    quantize_decoder_params,
    ship_to_device,
)

PROMPT = int(os.environ.get("CHIPGATE_PROMPT", "256"))
STEPS = int(os.environ.get("CHIPGATE_STEPS", "16"))


@functools.partial(jax.jit, static_argnames=("cfg",))
def xla_step_dbg(dec, cfg, token, pos, cache):
    """One XLA int8pc decode step -> (logits [V] f32, h pre-norm [H])."""
    h0 = jnp.take(dec["token_embd"], token[None], axis=0)
    h, cache = decoder_forward(
        dec, cfg, h0, pos[None].astype(jnp.int32), cache,
        cache_offset=pos, kv_valid_len=pos + 1,
    )
    return lm_logits(dec, cfg, h[0]), h[0].astype(jnp.float32), cache


@functools.partial(jax.jit, static_argnames=("cfg",))
def head_on_hidden(dec, cfg, h):
    """XLA lm head applied to a pre-final-norm hidden row."""
    return lm_logits(dec, cfg, h.astype(jnp.bfloat16))


def main():
    cfg = ASRModelConfig()
    dcfg = dataclasses.replace(cfg.decoder, eos_token_id=-1)
    t0 = time.perf_counter()
    with host_staging():
        params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
        dec = quantize_decoder_params(
            jax.tree.map(np.asarray, params["decoder"]), "int8pc")
        dec = fuse_decoder_params(dec)
        mega = mk.pack_megakernel_params(dec, cfg.decoder)
    dec = ship_to_device(dec)
    mega = ship_to_device(mega, what="mega")
    print(f"init+ship: {time.perf_counter()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(1)
    n_audio = PROMPT - 40
    audio = jnp.asarray(
        rng.standard_normal((n_audio, dcfg.hidden_size)) * 0.1, jnp.bfloat16)
    prompt = ([5, 6, dcfg.audio_start_token_id]
              + [dcfg.audio_pad_token_id] * n_audio
              + [dcfg.audio_end_token_id] + [7] * 20)
    toks = np.full(PROMPT, dcfg.pad_token_id, np.int32)
    toks[: len(prompt)] = prompt
    toks = jnp.asarray(toks)
    n_prompt = len(prompt)

    S = -(-(PROMPT + STEPS) // 128) * 128
    L = dcfg.n_layers
    DKV = dcfg.n_kv_heads * dcfg.head_dim

    prefill_jit = jax.jit(
        prefill_only,
        static_argnames=("cfg", "audio_offset", "cache_len", "cache_dtype"))

    # XLA-path cache (dict layout) and mega-path cache (k3/v3 + scales),
    # both from the SAME prefill program
    tok0, cache_x = prefill_jit(dec, dcfg, toks, jnp.int32(n_prompt), audio,
                                jnp.int32(n_audio), audio_offset=3,
                                cache_len=S, cache_dtype=jnp.int8)
    tok0_m, cache_m = prefill_jit(dec, dcfg, toks, jnp.int32(n_prompt), audio,
                                  jnp.int32(n_audio), audio_offset=3,
                                  cache_len=S, cache_dtype=jnp.int8)
    k3 = cache_m["k"].reshape(L, S, DKV)
    v3 = cache_m["v"].reshape(L, S, DKV)
    ks = cache_m["k_s"].transpose(0, 2, 1)
    vs = cache_m["v_s"].transpose(0, 2, 1)
    print(f"prefill tok0: xla={int(tok0)} mega-path={int(tok0_m)}",
          flush=True)

    tok_x, tok_m = tok0, tok0
    for i in range(STEPS - 1):
        pos = jnp.int32(n_prompt + i)
        # teacher-forced on the XLA token so steps stay comparable
        logits_x, h_x, cache_x = xla_step_dbg(dec, dcfg, tok_x, pos, cache_x)
        x = jnp.take(dec["token_embd"], tok_x[None], axis=0)
        tok_m, k3, v3, ks, vs, h_m = mk.mega_decode_step_i8(
            mega, dcfg, x, pos, k3, v3, ks, vs)
        lx = np.asarray(logits_x)
        hm = np.asarray(h_m)[0]
        hx = np.asarray(h_x)
        lm_from_hm = np.asarray(head_on_hidden(dec, dcfg, jnp.asarray(hm)))
        nxt_x = int(np.argmax(lx))
        nxt_m = int(tok_m)
        top2 = np.argsort(lx)[-2:][::-1]
        gap = float(lx[top2[0]] - lx[top2[1]])
        hdiff = float(np.abs(hm - hx).max())
        hrel = hdiff / max(float(np.abs(hx).max()), 1e-9)
        ldiff = float(np.abs(lm_from_hm - lx).max())
        mark = "  <-- DIVERGE" if nxt_x != nxt_m else ""
        print(f"step {i:2d} pos {int(pos)}: xla={nxt_x} mega={nxt_m} "
              f"top2gap={gap:.4f} (top2={top2.tolist()}) "
              f"|h_mega-h_xla|max={hdiff:.4e} (rel {hrel:.2e}) "
              f"|head(h_mega)-logits_xla|max={ldiff:.4e}{mark}", flush=True)
        if nxt_x != nxt_m:
            # rank of each candidate in the other's logits
            print(f"   logits_x[{nxt_x}]={lx[nxt_x]:.6f} "
                  f"logits_x[{nxt_m}]={lx[nxt_m]:.6f} "
                  f"head(h_mega)[{nxt_x}]={lm_from_hm[nxt_x]:.6f} "
                  f"head(h_mega)[{nxt_m}]={lm_from_hm[nxt_m]:.6f}",
                  flush=True)
        tok_x = jnp.int32(nxt_x)  # teacher forcing

    print("done", flush=True)


if __name__ == "__main__":
    main()
