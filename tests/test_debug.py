"""Debug-surface tests: intermediates match the torch oracle; the
dump_intermediates tool produces a comparable artifact set."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.config import tiny_asr_config
from qwen3_asr_tpu.models.debug import decoder_debug, encode_conv_only
from qwen3_asr_tpu.runtime.params import init_asr_params

from helpers import make_byte_vocab, write_tiny_gguf
from oracles import torch_ref


def np_tree(t):
    return jax.tree.map(lambda a: np.asarray(a, np.float64), t)


def test_decoder_debug_matches_oracle(rng):
    cfg = tiny_asr_config()
    params = init_asr_params(cfg, seed=9, dtype=jnp.float32)
    dec = params["decoder"]
    tokens = rng.integers(0, 100, size=7).astype(np.int32)

    dbg = decoder_debug(dec, cfg.decoder, tokens)
    ref_h = torch_ref.decoder_forward(np_tree(dec), cfg.decoder, tokens)
    ref_logits = torch_ref.lm_logits(np_tree(dec), cfg.decoder, ref_h)
    np.testing.assert_allclose(dbg["logits"], ref_logits, atol=1e-3, rtol=0)

    # intermediates have the right shapes and are finite
    T = 7
    d = cfg.decoder
    assert dbg["debug_norm0"].shape == (T, d.hidden_size)
    assert dbg["debug_q0_rope"].shape == (T, d.n_heads, d.head_dim)
    assert dbg["debug_kq_softmax"].shape == (d.n_heads, T, T)
    probs = dbg["debug_kq_softmax"]
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    # causality: no attention above the diagonal
    assert np.triu(probs, k=1).max() < 1e-7


def test_encode_conv_only_shape(rng):
    cfg = tiny_asr_config()
    params = init_asr_params(cfg, seed=9, dtype=jnp.float32)
    mel = rng.standard_normal((128, 100)).astype(np.float32)
    out = encode_conv_only(params["encoder"], cfg.encoder, mel)
    assert out.shape == (13, cfg.encoder.d_model)
    assert np.isfinite(out).all()


def test_encode_no_chunk_matches_chunked_within_one_chunk(rng):
    """For audio <= one chunk, the no-chunk debug path must equal the
    production chunked encoder exactly (audio_encoder.cpp:603-852: the only
    differences are the chunk split and the per-chunk position reset)."""
    from qwen3_asr_tpu.models.debug import encode_no_chunk
    from qwen3_asr_tpu.models.encoder import encode_audio

    cfg = tiny_asr_config()
    params = init_asr_params(cfg, seed=9, dtype=jnp.float32)
    mel = rng.standard_normal((128, cfg.encoder.chunk_size)).astype(np.float32)
    chunked = np.asarray(encode_audio(params["encoder"], cfg.encoder, mel))
    whole = encode_no_chunk(params["encoder"], cfg.encoder, mel)
    np.testing.assert_allclose(whole, chunked, atol=2e-5)


def test_dump_intermediates_tool(tmp_path, rng):
    from qwen3_asr_tpu.audio import write_wav
    from qwen3_asr_tpu.tools.dump_intermediates import main

    cfg = tiny_asr_config()
    params = jax.tree.map(np.asarray, init_asr_params(cfg, 3, jnp.float32))
    vocab = make_byte_vocab(cfg.decoder.vocab_size, {})
    gguf = str(tmp_path / "m.gguf")
    write_tiny_gguf(gguf, cfg, params, vocab=vocab, merges=[])
    wav = str(tmp_path / "a.wav")
    t = np.arange(16000) / 16000
    write_wav(wav, (0.2 * np.sin(2 * np.pi * 330 * t)).astype(np.float32))

    out_dir = str(tmp_path / "out")
    rc = main(["-m", gguf, "-f", wav, "-o", out_dir])
    assert rc == 0
    for name in ("mel.npy", "audio_features.npy", "decoder_logits.npy",
                 "debug_norm0.npy", "debug_kq_softmax.npy"):
        assert os.path.exists(os.path.join(out_dir, name)), name
    mel = np.load(os.path.join(out_dir, "mel.npy"))
    assert mel.shape[0] == 128
    logits = np.load(os.path.join(out_dir, "decoder_logits.npy"))
    assert logits.shape == (5, cfg.decoder.vocab_size)
