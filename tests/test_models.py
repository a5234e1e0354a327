"""Encoder/decoder parity vs the float64 torch oracle, and generation
self-consistency (jitted prefill+while_loop vs naive full recompute)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.config import tiny_aligner_config, tiny_asr_config
from qwen3_asr_tpu.models.decoder import (
    classify_logits,
    decoder_forward,
    embed_with_audio,
    init_kv_cache,
    lm_logits,
)
from qwen3_asr_tpu.models.encoder import chunk_output_len, encode_audio, sinusoidal_pe
from qwen3_asr_tpu.models.generate import generate_greedy, nar_forward
from qwen3_asr_tpu.runtime.params import init_asr_params, init_aligner_params

from oracles import torch_ref


def to_numpy_tree(tree):
    return jax.tree.map(lambda a: np.asarray(a, dtype=np.float64), tree)


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_asr_config()
    params = init_asr_params(cfg, seed=1, dtype=jnp.float32)
    return cfg, params


@pytest.fixture(scope="module")
def tiny_fa():
    cfg = tiny_aligner_config()
    params = init_aligner_params(cfg, seed=2, dtype=jnp.float32)
    return cfg, params


# -- encoder -------------------------------------------------------------------

def test_sinusoidal_pe_matches_reference_formula():
    pe = np.asarray(sinusoidal_pe(4, 8))
    half = 4
    for pos in range(4):
        for i in range(half):
            div = np.exp(-np.log(10000.0) * i / (half - 1))
            assert np.isclose(pe[pos, i], np.sin(pos * div), atol=1e-6)
            assert np.isclose(pe[pos, half + i], np.cos(pos * div), atol=1e-6)


@pytest.mark.parametrize("n_frames", [100, 137, 250])
def test_encoder_matches_oracle(tiny, rng, n_frames):
    cfg, params = tiny
    mel = rng.standard_normal((128, n_frames)).astype(np.float32)
    ours = np.asarray(encode_audio(params["encoder"], cfg.encoder, mel))
    ref = torch_ref.encoder_forward(
        to_numpy_tree(params["encoder"]), cfg.encoder, mel
    )
    n_chunks = -(-n_frames // 100)
    expect_ctx = 13 * (n_chunks - 1) + chunk_output_len(n_frames - (n_chunks - 1) * 100)
    assert ours.shape == (expect_ctx, cfg.encoder.output_dim)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=0)


def test_encoder_block_diagonal_windows(tiny_fa, rng):
    cfg, params = tiny_fa
    # 900 frames -> 9 chunks -> 117 ctx > one 104 window: exercises masking
    mel = rng.standard_normal((128, 900)).astype(np.float32)
    ours = np.asarray(encode_audio(params["encoder"], cfg.encoder, mel))
    ref = torch_ref.encoder_forward(
        to_numpy_tree(params["encoder"]), cfg.encoder, mel
    )
    assert ours.shape[0] == 117
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=0)

    # the block-diagonal predicate must equal the reference's cu_seqlens
    # construction (full 104-windows then remainder)
    from qwen3_asr_tpu.ops.attention import block_diagonal_mask
    m = np.asarray(block_diagonal_mask(117, 104))
    assert m[:104, :104].all() and m[104:, 104:].all()
    assert not m[:104, 104:].any() and not m[104:, :104].any()


# -- decoder -------------------------------------------------------------------

def test_decoder_full_pass_matches_oracle(tiny, rng):
    cfg, params = tiny
    dec = params["decoder"]
    T = 17
    tokens = rng.integers(0, 100, size=T).astype(np.int32)
    n_audio = 5
    audio = rng.standard_normal((n_audio, cfg.decoder.hidden_size)).astype(np.float32)
    off = 3

    h0 = embed_with_audio(dec, jnp.asarray(tokens), jnp.asarray(audio),
                          jnp.int32(n_audio), off)
    cache = init_kv_cache(cfg.decoder, T, jnp.float32)
    h, _ = decoder_forward(
        dec, cfg.decoder, h0, jnp.arange(T, dtype=jnp.int32), cache,
        cache_offset=jnp.int32(0), kv_valid_len=jnp.int32(T),
    )
    ref_h = torch_ref.decoder_forward(
        to_numpy_tree(dec), cfg.decoder, tokens, np.asarray(audio), off
    )
    np.testing.assert_allclose(np.asarray(h), ref_h, atol=1e-3, rtol=0)

    ours_logits = np.asarray(lm_logits(dec, cfg.decoder, h[-1]))
    ref_logits = torch_ref.lm_logits(to_numpy_tree(dec), cfg.decoder, ref_h[-1])
    np.testing.assert_allclose(ours_logits, ref_logits, atol=1e-3, rtol=0)


def test_decoder_incremental_matches_full(tiny, rng):
    """KV-cache decode (one token at a time) == full-sequence forward."""
    cfg, params = tiny
    dec = params["decoder"]
    T = 12
    tokens = rng.integers(0, 100, size=T).astype(np.int32)

    # full pass
    cache = init_kv_cache(cfg.decoder, T, jnp.float32)
    h_full, _ = decoder_forward(
        dec, cfg.decoder,
        embed_with_audio(dec, jnp.asarray(tokens), None, 0, 0),
        jnp.arange(T, dtype=jnp.int32), cache, jnp.int32(0), jnp.int32(T),
    )

    # prefill 5 then step 7 single tokens
    cache = init_kv_cache(cfg.decoder, T, jnp.float32)
    h_pre, cache = decoder_forward(
        dec, cfg.decoder,
        embed_with_audio(dec, jnp.asarray(tokens[:5]), None, 0, 0),
        jnp.arange(5, dtype=jnp.int32), cache, jnp.int32(0), jnp.int32(5),
    )
    hs = [np.asarray(h_pre)]
    for t in range(5, T):
        h_t, cache = decoder_forward(
            dec, cfg.decoder,
            embed_with_audio(dec, jnp.asarray(tokens[t : t + 1]), None, 0, 0),
            jnp.asarray([t], dtype=jnp.int32), cache,
            jnp.int32(t), jnp.int32(t + 1),
        )
        hs.append(np.asarray(h_t))
    h_inc = np.concatenate(hs, axis=0)
    # paths are mathematically identical (verified 2.8e-17 max diff under
    # float64); 1e-3 covers f32 reduction-order noise across shapes
    np.testing.assert_allclose(h_inc, np.asarray(h_full), atol=1e-3, rtol=0)


def test_prompt_padding_invariance(tiny, rng):
    """Bucketed (padded) prompt must give identical logits to exact-length."""
    cfg, params = tiny
    dec = params["decoder"]
    n = 9
    tokens = rng.integers(0, 100, size=n).astype(np.int32)

    def last_logits(P):
        toks = np.zeros(P, np.int32)
        toks[:n] = tokens
        cache = init_kv_cache(cfg.decoder, P, jnp.float32)
        h, _ = decoder_forward(
            dec, cfg.decoder,
            embed_with_audio(dec, jnp.asarray(toks), None, 0, 0),
            jnp.arange(P, dtype=jnp.int32), cache, jnp.int32(0), jnp.int32(n),
        )
        return np.asarray(lm_logits(dec, cfg.decoder, h[n - 1]))

    np.testing.assert_allclose(last_logits(n), last_logits(16), atol=1e-5, rtol=0)


# -- generation ----------------------------------------------------------------

def test_generate_matches_naive_oracle(tiny, rng):
    cfg, params = tiny
    dec = params["decoder"]
    dcfg = cfg.decoder
    n_audio = 4
    audio = rng.standard_normal((n_audio, dcfg.hidden_size)).astype(np.float32)
    prompt = (
        [5, 6]
        + [dcfg.audio_pad_token_id] * n_audio
        + [dcfg.audio_end_token_id, 7]
    )
    off = 2
    max_tokens = 8

    # bucketed invocation: pad prompt to 16
    P = 16
    toks = np.full(P, dcfg.pad_token_id % dcfg.vocab_size, np.int32)
    toks[: len(prompt)] = prompt
    out, n_kept = generate_greedy(
        dec, dcfg, jnp.asarray(toks), jnp.int32(len(prompt)),
        jnp.asarray(audio), jnp.int32(n_audio), off, max_tokens,
        cache_dtype=jnp.float32,
    )
    ours = list(np.asarray(out)[: int(n_kept)])

    ref = torch_ref.generate_greedy(
        to_numpy_tree(dec), dcfg, prompt, np.asarray(audio, np.float64),
        off, max_tokens,
    )
    assert ours == ref


def test_fused_qkv_gate_up_is_exact(tiny, rng):
    """fuse_decoder_params (wqkv / w_gate_up) must not change generation:
    the fused matmul computes identical columns, so greedy tokens match
    token-for-token. Also covers the quantized-leaf concat path."""
    from qwen3_asr_tpu.runtime.params import (
        fuse_decoder_params,
        quantize_decoder_params,
    )

    cfg, params = tiny
    dcfg = cfg.decoder
    n_audio = 4
    audio = rng.standard_normal((n_audio, dcfg.hidden_size)).astype(np.float32)
    prompt = (
        [5, 6]
        + [dcfg.audio_pad_token_id] * n_audio
        + [dcfg.audio_end_token_id, 7]
    )
    P = 16
    toks = np.full(P, dcfg.pad_token_id % dcfg.vocab_size, np.int32)
    toks[: len(prompt)] = prompt
    args = (jnp.asarray(toks), jnp.int32(len(prompt)), jnp.asarray(audio),
            jnp.int32(n_audio), 2, 8)

    for quant in (False, True):
        dec = params["decoder"]
        if quant:
            dec = quantize_decoder_params(dec)
        fused = fuse_decoder_params(dec)
        assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]
        base_out, base_n = generate_greedy(dec, dcfg, *args,
                                           cache_dtype=jnp.float32)
        f_out, f_n = generate_greedy(fused, dcfg, *args,
                                     cache_dtype=jnp.float32)
        assert int(base_n) == int(f_n)
        n = int(base_n)
        assert list(np.asarray(base_out)[:n]) == list(np.asarray(f_out)[:n])


def test_nar_and_classify_head(tiny_fa, rng):
    cfg, params = tiny_fa
    dec = params["decoder"]
    dcfg = cfg.decoder
    T = 14
    tokens = rng.integers(0, 100, size=T).astype(np.int32)
    n_audio = 6
    audio = rng.standard_normal((n_audio, dcfg.hidden_size)).astype(np.float32)
    off = 1

    h = nar_forward(dec, dcfg, jnp.asarray(tokens), jnp.asarray(audio),
                    jnp.int32(n_audio), off)
    logits = np.asarray(classify_logits(dec, dcfg, h))
    assert logits.shape == (T, dcfg.classify_num)

    ref_h = torch_ref.decoder_forward(
        to_numpy_tree(dec), dcfg, tokens, np.asarray(audio, np.float64), off
    )
    ref_logits = torch_ref.classify_logits(to_numpy_tree(dec), dcfg, ref_h)
    np.testing.assert_allclose(logits, ref_logits, atol=3e-3, rtol=0)  # f32 noise; ref tol is 1e-2


def test_wait_for_backend_returns_device():
    from qwen3_asr_tpu.ops.support import wait_for_backend

    dev = wait_for_backend(retries=2, sleep_s=0.01)
    assert dev is jax.devices()[0]
