#!/usr/bin/env python3
"""On-chip kernel correctness gate -> CHIPTEST.json (VERDICT r3 #6).

All 200+ pytest tests run the Pallas kernels in INTERPRET mode on CPU
(tests/conftest.py pins the platform); "interpret passed but Mosaic
differs" was an open hole in the round loop. This gate runs the real
Mosaic-compiled kernels on the chip and checks them against their XLA
contracts:

  1. mega_int8_vs_xla     — whole-loop greedy tokens through the int8
                            megakernel == the XLA int8pc decode loop
                            (same weights, same activation-quant math;
                            scripts/time_mega.py's parity check, gated)
  2. mega_stream_vs_resident — int4-weight megakernel in streamed-KV mode
                            == resident mode (same weights, same cache,
                            different attention structure)
  3. flash_vs_xla         — Pallas flash attention (encoder shapes,
                            non-causal + causal) vs ops/attention.py's
                            einsum reference, f32-level tolerance

bench.py invokes run_chipgate() after timing (QWEN3_CHIPGATE=0 skips) so
every driver round emits the artifact next to BENCH_rN.json; it is also
runnable standalone: python scripts/chipgate.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

# small shapes keep the gate's extra compiles cheap (~minutes on the
# tunnel, cached across rounds) while still exercising the real 0.6B
# layer shapes — only prompt/steps shrink, never hidden/head dims
PROMPT = int(os.environ.get("CHIPGATE_PROMPT", "256"))
STEPS = int(os.environ.get("CHIPGATE_STEPS", "16"))


# Near-tie tolerance for the mega-vs-XLA token gate. Contract
# (ops/megakernel.py header, BASELINE.md "Megakernel numerics"): the
# megakernel's per-matmul int8 math is bit-matched to the XLA int8pc
# path, but Mosaic and XLA order the f32 scale multiplies / attention
# reductions differently, which perturbs the pre-head hidden by ~3%
# relative and the lm-head logits by <=~0.1 (measured on chip,
# scripts/dbg_chipgate_int8.py: |head(h_mega)-logits_xla|max 0.088-0.100
# across 15 steps). Where the XLA argmax leads its runner-up by less
# than that perturbation, the two implementations may legitimately pick
# different tokens (r4's CHIPTEST failure was exactly this: one token
# at an XLA top-2 gap of 0.0128). The gate therefore runs TEACHER-FORCED
# on the XLA tokens (cascade semantics: a near-tie flip must not charge
# every later step) and fails only a divergence whose XLA logit distance
# exceeds 2x the measured perturbation — a logic bug (wrong row, skipped
# layer) shows gaps O(1)+.
NEAR_TIE_TOL = 0.2


def _gate_mega_vs_xla(jax, jnp, cfg, dec_int8, audio, n_audio, toks,
                      n_prompt):
    """int8 megakernel vs XLA int8pc loop, teacher-forced per step:
    every token must match, or be an argmax near-tie (XLA logit distance
    between the two picks <= NEAR_TIE_TOL — see contract above)."""
    import functools

    from qwen3_asr_tpu.models.decoder import decoder_forward, lm_logits
    from qwen3_asr_tpu.models.generate import prefill_only
    from qwen3_asr_tpu.ops import megakernel as mk
    from qwen3_asr_tpu.runtime.params import host_staging, ship_to_device

    dcfg = dataclasses.replace(cfg.decoder, eos_token_id=-1)
    dec_xla = ship_to_device(
        {k: v for k, v in dec_int8.items() if k != "mega"})
    with host_staging():  # pack on host (leaves are host numpy)
        mega = mk.pack_megakernel_params(dec_int8, cfg.decoder)
    mega = ship_to_device(mega, what="mega")

    P = toks.shape[0]
    S = -(-(P + STEPS) // 128) * 128
    L = cfg.decoder.n_layers
    DKV = cfg.decoder.n_kv_heads * cfg.decoder.head_dim

    prefill_jit = jax.jit(
        prefill_only,
        static_argnames=("cfg", "audio_offset", "cache_len", "cache_dtype"))

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def xla_step(dec, cfg, token, pos, cache):
        h0 = jnp.take(dec["token_embd"], token[None], axis=0)
        h, cache = decoder_forward(
            dec, cfg, h0, pos[None].astype(jnp.int32), cache,
            cache_offset=pos, kv_valid_len=pos + 1)
        return lm_logits(dec, cfg, h[0]), cache

    # both caches from the SAME prefill program (the prefill path is
    # shared XLA code — the gate isolates the decode-step kernel)
    tok0, cache_x = prefill_jit(dec_xla, dcfg, toks, jnp.int32(n_prompt),
                                audio, jnp.int32(n_audio), audio_offset=3,
                                cache_len=S, cache_dtype=jnp.int8)
    _, cache_m = prefill_jit(dec_xla, dcfg, toks, jnp.int32(n_prompt),
                             audio, jnp.int32(n_audio), audio_offset=3,
                             cache_len=S, cache_dtype=jnp.int8)
    k3 = cache_m["k"].reshape(L, S, DKV)
    v3 = cache_m["v"].reshape(L, S, DKV)
    ks = cache_m["k_s"].transpose(0, 2, 1)
    vs = cache_m["v_s"].transpose(0, 2, 1)

    seq_x, seq_m, gaps = [int(tok0)], [int(tok0)], []
    tok = tok0
    n_mismatch, max_gap = 0, 0.0
    ok = True
    for i in range(STEPS - 1):
        pos = jnp.int32(n_prompt + i)
        logits, cache_x = xla_step(dec_xla, dcfg, tok, pos, cache_x)
        x = jnp.take(dec_xla["token_embd"], tok[None], axis=0)
        tok_m, k3, v3, ks, vs, _ = mk.mega_decode_step_i8(
            mega, dcfg, x, pos, k3, v3, ks, vs)
        lx = np.asarray(logits)
        nxt_x, nxt_m = int(np.argmax(lx)), int(tok_m)
        seq_x.append(nxt_x)
        seq_m.append(nxt_m)
        if nxt_m != nxt_x:
            gap = float(lx[nxt_x] - lx[nxt_m])
            gaps.append({"step": i + 1, "xla": nxt_x, "mega": nxt_m,
                         "xla_logit_gap": round(gap, 4)})
            n_mismatch += 1
            max_gap = max(max_gap, gap)
            ok &= gap <= NEAR_TIE_TOL
        tok = jnp.int32(nxt_x)  # teacher forcing (cascade semantics)
    # a pile of "near-ties" is itself suspicious — bound the count
    ok &= n_mismatch <= max(2, STEPS // 4)
    return {"pass": bool(ok), "tokens": STEPS,
            "matched": STEPS - n_mismatch,
            "near_tie_tol": NEAR_TIE_TOL, "max_mismatch_gap": max_gap,
            "mismatches": gaps[:8],
            "xla_head": seq_x[:8], "mega_head": seq_m[:8]}


def _gate_stream_vs_resident(jax, jnp, cfg, dec_int8, audio, n_audio,
                             toks, n_prompt, mega_int4=None):
    """int4-weight megakernel: streamed-KV attention == resident slabs.
    Same weights, same int8 cache; only the kernel's KV structure differs
    (flash-decoding ring vs whole-slab VMEM residency)."""
    from qwen3_asr_tpu.models.generate import generate_greedy
    from qwen3_asr_tpu.ops import megakernel as mk

    from qwen3_asr_tpu.runtime.params import host_staging, ship_to_device

    dcfg = dataclasses.replace(cfg.decoder, eos_token_id=-1)
    dec_mega = dict(dec_int8)
    if mega_int4 is not None:
        dec_mega["mega"] = mega_int4
    else:
        with host_staging():  # pack on host (leaves are host numpy)
            dec_mega["mega"] = mk.pack_megakernel_params(
                dec_int8, cfg.decoder, int4=True)
    dec_mega = ship_to_device(dec_mega)
    P = toks.shape[0]
    S = -(-(P + STEPS) // mk.KV_BLOCK) * mk.KV_BLOCK
    L = cfg.decoder.n_layers
    DKV = cfg.decoder.n_kv_heads * cfg.decoder.head_dim

    from qwen3_asr_tpu.models.generate import prefill_only

    import jax as _jax

    prefill_jit = _jax.jit(
        prefill_only,
        static_argnames=("cfg", "audio_offset", "cache_len", "cache_dtype"))

    outs = {}
    for stream in (False, True):
        tok0, cache = prefill_jit(
            dec_mega, cfg.decoder, toks, jnp.int32(n_prompt), audio,
            jnp.int32(n_audio), audio_offset=3, cache_len=S,
            cache_dtype=jnp.int8)
        k3 = cache["k"].reshape(L, S, DKV)
        v3 = cache["v"].reshape(L, S, DKV)
        if stream:
            ks = mk.block_kv_scales(cache["k_s"])
            vs = mk.block_kv_scales(cache["v_s"])
        else:
            ks = cache["k_s"].transpose(0, 2, 1)
            vs = cache["v_s"].transpose(0, 2, 1)
        seq = [int(tok0)]
        tok = tok0
        for i in range(STEPS - 1):
            x = jnp.take(dec_mega["token_embd"], tok[None], axis=0)
            tok, k3, v3, ks, vs, _ = mk.mega_decode_step_i8(
                dec_mega["mega"], cfg.decoder, x,
                jnp.int32(int(n_prompt) + i), k3, v3, ks, vs,
                kv_stream=stream)
            seq.append(int(tok))
        outs[stream] = seq
    match = outs[False] == outs[True]
    return {"pass": bool(match), "tokens": STEPS,
            "resident_head": outs[False][:8], "stream_head": outs[True][:8]}


def _f64_attention(q, k, v, valid, causal, scale):
    """Ground-truth attention in numpy float64 (host)."""
    T = q.shape[0]
    s = np.einsum("thd,shd->hts", q.astype(np.float64),
                  k.astype(np.float64)) * scale
    cols = np.arange(T)[None, None, :]
    mask = cols < valid
    if causal:
        mask = mask & (cols <= np.arange(T)[None, :, None])
    s = np.where(mask, s, -np.inf)
    p = np.exp(s - s.max(axis=-1, keepdims=True))
    p /= p.sum(axis=-1, keepdims=True)
    return np.einsum("hts,shd->thd", p, v.astype(np.float64))


def _gate_flash_vs_xla(jax, jnp, cfg):
    """Pallas flash attention (Mosaic, on chip) vs f64 ground truth at
    encoder shapes, with the on-chip XLA einsum's own error as the yard-
    stick. Both paths multiply on the MXU (bf16-decomposed f32), so
    flash-vs-xla alone shows ~5e-3 of shared rounding noise; a LOGIC bug
    (masking off-by-one, block mis-indexing) produces O(1) error. Gate:
    flash within max(3x the XLA path's own f64 error, 2e-2)."""
    from qwen3_asr_tpu.ops.attention import causal_mask, mha_attention
    from qwen3_asr_tpu.ops.pallas_attention import flash_attention

    ecfg = cfg.encoder
    T, NH, D = 2048, ecfg.n_heads, ecfg.d_model // ecfg.n_heads
    rng = np.random.default_rng(0)
    qn = rng.standard_normal((T, NH, D)).astype(np.float32)
    kn = rng.standard_normal((T, NH, D)).astype(np.float32)
    vn = rng.standard_normal((T, NH, D)).astype(np.float32)
    q, k, v = (jnp.asarray(a) for a in (qn, kn, vn))
    scale = 1.0 / float(np.sqrt(D))
    n_valid = T - 100  # exercise the valid_len masking too
    valid = jnp.int32(n_valid)
    out = {"tol_floor": 2e-2}
    ok = True
    for causal in (False, True):
        got = np.asarray(jax.jit(flash_attention, static_argnames=(
            "causal", "scale"))(q, k, v, valid, causal=causal, scale=scale))
        col = jnp.arange(T)[None, :] < valid
        mask = col & causal_mask(T, T, 0, valid) if causal else (
            jnp.broadcast_to(col, (T, T)))
        xla = np.asarray(mha_attention(q, k, v, mask, scale))
        truth = _f64_attention(qn, kn, vn, n_valid, causal, scale)
        d_flash = float(np.abs(got[:n_valid] - truth[:n_valid]).max())
        d_xla = float(np.abs(xla[:n_valid] - truth[:n_valid]).max())
        key = "causal" if causal else "bidi"
        out[f"{key}_flash_vs_f64"] = d_flash
        out[f"{key}_xla_vs_f64"] = d_xla
        ok &= d_flash <= max(3.0 * d_xla, 2e-2)

    # batched kernel: per-item valid lens via program_id(0) scalar indexing
    # must reproduce the single-item runs (same kernel cells — deterministic)
    from qwen3_asr_tpu.ops.pallas_attention import flash_attention_batch

    q2 = jnp.stack([q, k])   # two distinct items from the same material
    k2 = jnp.stack([k, q])
    v2 = jnp.stack([v, v])
    vl = jnp.asarray([n_valid, T - 300], jnp.int32)
    got_b = np.asarray(jax.jit(flash_attention_batch, static_argnames=(
        "causal", "scale"))(q2, k2, v2, vl, causal=False, scale=scale))
    d_batch = 0.0
    for b in range(2):
        single = np.asarray(jax.jit(flash_attention, static_argnames=(
            "causal", "scale"))(q2[b], k2[b], v2[b], vl[b],
                                causal=False, scale=scale))
        nb = int(vl[b])
        d_batch = max(d_batch,
                      float(np.abs(got_b[b, :nb] - single[:nb]).max()))
    out["batch_vs_single"] = d_batch
    ok &= d_batch <= 1e-6
    out["pass"] = ok
    return out


def run_chipgate(out_path: str = "CHIPTEST.json", cfg=None,
                 dec=None) -> dict:
    """Run all gates; write the artifact; return it. Never raises — a
    crashed gate is recorded as failed with its error string.

    cfg/dec: optionally reuse a caller's already-built fused int8pc
    decoder tree (bench.py passes its own, skipping ~15 min of identical
    synthetic-param init + quantize + int4 clip-search pack). dec may
    carry a "mega" pack; an int4 one (qkv_q cols == H//2) is reused by
    the stream gate, any pack is stripped before the XLA-contract gates.
    """
    import jax
    import jax.numpy as jnp

    from qwen3_asr_tpu.config import ASRModelConfig
    from qwen3_asr_tpu.ops.support import has_pallas_tpu

    t0 = time.perf_counter()
    result = {
        "metric": "chipgate",
        "device": str(jax.devices()[0]),
        "has_pallas_tpu": bool(has_pallas_tpu()),
        "prompt": PROMPT, "steps": STEPS,
        "gates": {},
    }
    if not result["has_pallas_tpu"]:
        result["skipped"] = "no TPU backend — gates need Mosaic"
        result["pass"] = False
        _write(out_path, result)
        return result

    mega_int4 = None
    if dec is not None and cfg is not None:
        mega = dec.get("mega")
        if (mega is not None
                and mega["qkv_q"].shape[2] == cfg.decoder.hidden_size // 2):
            mega_int4 = mega
        # pull the tree to host ONCE: the gates re-pack megakernel params
        # (host-side jits) and device_put their own copies; packing from
        # device-committed leaves would run the dequant on the TPU and
        # ship the dense f32 intermediate back over the tunnel
        dec = {k: jax.tree.map(np.asarray, v)
               for k, v in dec.items() if k != "mega"}
        result["params"] = "reused from caller"
    else:
        from qwen3_asr_tpu.runtime.params import (
            fuse_decoder_params,
            host_staging,
            init_asr_params,
            quantize_decoder_params,
        )

        cfg = ASRModelConfig()
        with host_staging():  # transforms on host, not over the tunnel
            params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
            dec = quantize_decoder_params(
                jax.tree.map(np.asarray, params["decoder"]), "int8pc")
            dec = fuse_decoder_params(dec)

    rng = np.random.default_rng(1)
    n_audio = PROMPT - 40
    audio = jnp.asarray(
        rng.standard_normal((n_audio, cfg.decoder.hidden_size)) * 0.1,
        jnp.bfloat16)
    prompt = ([5, 6, cfg.decoder.audio_start_token_id]
              + [cfg.decoder.audio_pad_token_id] * n_audio
              + [cfg.decoder.audio_end_token_id] + [7] * 20)
    toks = np.full(PROMPT, cfg.decoder.pad_token_id, np.int32)
    toks[: len(prompt)] = prompt
    toks = jnp.asarray(toks)
    n_prompt = len(prompt)

    gates = (
        ("mega_int8_vs_xla", _gate_mega_vs_xla,
         (jax, jnp, cfg, dec, audio, n_audio, toks, n_prompt)),
        ("mega_stream_vs_resident", _gate_stream_vs_resident,
         (jax, jnp, cfg, dec, audio, n_audio, toks, n_prompt, mega_int4)),
        ("flash_vs_xla", _gate_flash_vs_xla, (jax, jnp, cfg)),
    )
    for name, fn, args in gates:
        t1 = time.perf_counter()
        try:
            g = fn(*args)
        except Exception as e:  # noqa: BLE001 — record, don't crash bench
            g = {"pass": False, "error": f"{type(e).__name__}: {e}"}
        g["seconds"] = round(time.perf_counter() - t1, 1)
        result["gates"][name] = g
        print(f"chipgate: {name}: {'PASS' if g['pass'] else 'FAIL'} "
              f"({g['seconds']}s)", file=sys.stderr, flush=True)

    result["pass"] = all(g["pass"] for g in result["gates"].values())
    result["total_seconds"] = round(time.perf_counter() - t0, 1)
    _write(out_path, result)
    return result


def _write(path, result):
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    r = run_chipgate()
    print(json.dumps({"pass": r.get("pass"),
                      "gates": {k: v.get("pass")
                                for k, v in r.get("gates", {}).items()}}))
    sys.exit(0 if r.get("pass") else 1)
