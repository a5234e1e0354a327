"""Sampled decoding (temperature / top-k / top-p).

The reference is greedy-only (qwen3_asr.cpp:305-317); sampling is a
serving-surface extension. Contracts tested here: the greedy limits
(temperature=0, top_k=1) reproduce generate_greedy exactly, nucleus
filtering only ever draws from the true top-p set, same seed => same
transcript, and the megakernel path (h_debug -> XLA lm head) agrees with
the XLA path in its greedy limit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.config import tiny_asr_config
from qwen3_asr_tpu.models.generate import (
    generate_greedy,
    generate_sample,
    sample_from_logits,
)
from qwen3_asr_tpu.runtime.params import (
    fuse_decoder_params,
    init_asr_params,
    quantize_decoder_params,
)


def test_sample_from_logits_greedy_limits(rng):
    logits = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    want = int(jnp.argmax(logits))
    key = jax.random.PRNGKey(0)
    # temperature<=0 is argmax regardless of key
    assert int(sample_from_logits(logits, key, 0.0, 0, 1.0)) == want
    # top_k=1 pins the distribution to the argmax at any temperature
    for s in range(5):
        got = sample_from_logits(logits, jax.random.PRNGKey(s), 1.7, 1, 1.0)
        assert int(got) == want


def test_top_p_draws_only_from_nucleus(rng):
    logits_np = rng.standard_normal(32).astype(np.float32) * 3.0
    logits = jnp.asarray(logits_np)
    top_p = 0.6
    # numpy reference: smallest descending-prob prefix reaching top_p,
    # cutoff element included (HF TopPLogitsWarper semantics)
    order = np.argsort(-logits_np)
    probs = np.exp(logits_np - logits_np.max())
    probs /= probs.sum()
    cum = np.cumsum(probs[order])
    keep = set(order[: int(np.argmax(cum >= top_p)) + 1].tolist())
    for s in range(50):
        got = int(sample_from_logits(
            logits, jax.random.PRNGKey(s), 1.0, 0, top_p))
        assert got in keep


def _setup(rng, dtype=jnp.float32):
    cfg = tiny_asr_config()
    dcfg = cfg.decoder
    dec = init_asr_params(cfg, seed=13, dtype=dtype)["decoder"]
    n_audio = 4
    audio = rng.standard_normal((n_audio, dcfg.hidden_size)).astype(np.float32)
    prompt = [5, 6] + [dcfg.audio_pad_token_id] * n_audio + [7]
    P = 16
    toks = np.zeros(P, np.int32)
    toks[: len(prompt)] = prompt
    return dcfg, dec, jnp.asarray(toks), len(prompt), jnp.asarray(
        audio, dtype), n_audio


def test_generate_sample_topk1_matches_greedy(rng):
    dcfg, dec, toks, n_prompt, audio, n_audio = _setup(rng)
    max_tokens = 8
    out_g, n_g = generate_greedy(
        dec, dcfg, toks, jnp.int32(n_prompt), audio, jnp.int32(n_audio),
        2, max_tokens, cache_dtype=jnp.float32)
    out_s, n_s = generate_sample(
        dec, dcfg, toks, jnp.int32(n_prompt), audio, jnp.int32(n_audio),
        2, max_tokens, jax.random.PRNGKey(7), temperature=1.3, top_k=1,
        cache_dtype=jnp.float32)
    assert int(n_s) == int(n_g)
    np.testing.assert_array_equal(
        np.asarray(out_s)[: int(n_s)], np.asarray(out_g)[: int(n_g)])


def test_generate_sample_seed_determinism(rng):
    dcfg, dec, toks, n_prompt, audio, n_audio = _setup(rng)
    max_tokens = 8

    def run(seed):
        out, n = generate_sample(
            dec, dcfg, toks, jnp.int32(n_prompt), audio, jnp.int32(n_audio),
            2, max_tokens, jax.random.PRNGKey(seed), temperature=1.0,
            top_k=0, top_p=0.95, cache_dtype=jnp.float32)
        return list(np.asarray(out)[: int(n)])

    a, b = run(3), run(3)
    assert a == b and len(a) >= 1
    assert all(0 <= t < dcfg.vocab_size for t in a)


def test_generate_sample_mega_interpret_topk1(rng):
    """Megakernel sampling path (kernel h_debug -> XLA lm head) in its
    greedy limit == generate_greedy through the same megakernel."""
    dcfg, dec, toks, n_prompt, audio, n_audio = _setup(rng, jnp.bfloat16)
    from qwen3_asr_tpu.ops.megakernel import pack_megakernel_params

    dec = jax.tree.map(np.asarray, dec)
    dec = fuse_decoder_params(quantize_decoder_params(dec, "int8pc"))
    dec["mega"] = pack_megakernel_params(dec, dcfg)
    max_tokens = 6
    out_g, n_g = generate_greedy(
        dec, dcfg, toks, jnp.int32(n_prompt), audio.astype(jnp.bfloat16),
        jnp.int32(n_audio), 2, max_tokens, cache_dtype=jnp.int8,
        _force_mega_interpret=True)
    out_s, n_s = generate_sample(
        dec, dcfg, toks, jnp.int32(n_prompt), audio.astype(jnp.bfloat16),
        jnp.int32(n_audio), 2, max_tokens, jax.random.PRNGKey(5),
        temperature=0.8, top_k=1, cache_dtype=jnp.int8,
        _force_mega_interpret=True)
    assert int(n_s) == int(n_g)
    np.testing.assert_array_equal(
        np.asarray(out_s)[: int(n_s)], np.asarray(out_g)[: int(n_g)])


def test_generate_sample_no_recompile_across_settings(rng):
    """temperature/top_p are traced scalars: any (temperature, top_p)
    combination reuses ONE compiled whole-loop program per (top_k,
    use_top_p) structure — a hostile client sweeping settings cannot force
    per-setting recompiles (VERDICT r3 weak #5; serve.py passes raw client
    temperatures through on this guarantee)."""
    from qwen3_asr_tpu.models.generate import _generate_sample

    dcfg, dec, toks, n_prompt, audio, n_audio = _setup(rng)
    max_tokens = 4

    def run(temperature, top_p, top_k=0, seed=0):
        out, n = generate_sample(
            dec, dcfg, toks, jnp.int32(n_prompt), audio, jnp.int32(n_audio),
            2, max_tokens, jax.random.PRNGKey(seed),
            temperature=temperature, top_k=top_k, top_p=top_p,
            cache_dtype=jnp.float32)
        return list(np.asarray(out)[: int(n)])

    run(0.7, 0.9)
    base = _generate_sample._cache_size()
    for temperature, top_p in ((0.71, 0.9), (1.3, 0.8), (0.05, 0.3),
                               (2.0, 0.999)):
        run(temperature, top_p)
    assert _generate_sample._cache_size() == base, (
        "sampled-loop recompiled across (temperature, top_p) settings")
    # the no-top-p structure is its own (single) program
    run(0.7, 1.0)
    base2 = _generate_sample._cache_size()
    assert base2 == base + 1
    run(1.9, 1.0)
    assert _generate_sample._cache_size() == base2
    # determinism per seed still holds with traced knobs
    assert run(0.9, 0.7, seed=5) == run(0.9, 0.7, seed=5)


def test_pipeline_temperature_param(rng):
    """Qwen3ASR.transcribe honors TranscribeParams.temperature and stays
    reproducible for a fixed seed."""
    from qwen3_asr_tpu.pipeline.asr import Qwen3ASR, TranscribeParams

    from helpers import make_byte_vocab

    cfg = tiny_asr_config()
    asr = Qwen3ASR(dtype=jnp.float32)
    asr.load_random(cfg, seed=13,
                    vocab=make_byte_vocab(cfg.decoder.vocab_size, {}))
    t = np.arange(16000) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    params = TranscribeParams(max_tokens=5, print_timing=False,
                              prompt_bucket=32, temperature=0.9, seed=11)
    r1 = asr.transcribe(audio, params)
    r2 = asr.transcribe(audio, params)
    assert r1.success and r2.success
    assert r1.tokens == r2.tokens
    # the greedy limit via top_k=1 equals the plain greedy path
    greedy = asr.transcribe(audio, TranscribeParams(
        max_tokens=5, print_timing=False, prompt_bucket=32))
    limit = asr.transcribe(audio, TranscribeParams(
        max_tokens=5, print_timing=False, prompt_bucket=32,
        temperature=1.0, top_k=1))
    assert limit.tokens == greedy.tokens
