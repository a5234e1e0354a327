"""Streaming (per-token host loop) decode == single-jit while_loop decode."""

import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.config import tiny_asr_config
from qwen3_asr_tpu.models.generate import generate_greedy, generate_greedy_streaming
from qwen3_asr_tpu.pipeline.asr import Qwen3ASR, TranscribeParams
from qwen3_asr_tpu.runtime.params import init_asr_params

from helpers import make_byte_vocab


def test_streaming_matches_while_loop(rng):
    cfg = tiny_asr_config()
    dcfg = cfg.decoder
    dec = init_asr_params(cfg, seed=13, dtype=jnp.float32)["decoder"]

    n_audio = 4
    audio = rng.standard_normal((n_audio, dcfg.hidden_size)).astype(np.float32)
    prompt = [5, 6] + [dcfg.audio_pad_token_id] * n_audio + [7]
    P = 16
    toks = np.zeros(P, np.int32)
    toks[: len(prompt)] = prompt
    max_tokens = 8

    out, n_kept = generate_greedy(
        dec, dcfg, jnp.asarray(toks), jnp.int32(len(prompt)),
        jnp.asarray(audio), jnp.int32(n_audio), 2, max_tokens,
        cache_dtype=jnp.float32,
    )
    expected = list(np.asarray(out)[: int(n_kept)])

    seen = []
    got = generate_greedy_streaming(
        dec, dcfg, jnp.asarray(toks), jnp.int32(len(prompt)),
        jnp.asarray(audio), jnp.int32(n_audio), 2, max_tokens,
        on_token=lambda i, total: seen.append((i, total)),
        cache_dtype=jnp.float32,
    )
    assert got == expected
    assert seen == [(i + 1, max_tokens) for i in range(len(got))]


def test_pipeline_progress_callback(rng):
    cfg = tiny_asr_config()
    asr = Qwen3ASR(dtype=jnp.float32)
    asr.load_random(cfg, seed=13, vocab=make_byte_vocab(cfg.decoder.vocab_size, {}))

    t = np.arange(16000) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    params = TranscribeParams(max_tokens=5, print_timing=False, prompt_bucket=32)

    base = asr.transcribe(audio, params)
    calls = []
    asr.set_progress_callback(lambda i, total: calls.append(i))
    streamed = asr.transcribe(audio, params)
    assert streamed.tokens == base.tokens
    assert calls and calls[-1] == len(streamed.tokens)


def test_streaming_chunk_sizes(rng):
    """Chunked streaming (k tokens per dispatch) matches the while_loop
    decode for chunk sizes that straddle the generation length, including
    forced-EOS mid-chunk."""
    import dataclasses

    cfg = tiny_asr_config()
    dcfg = cfg.decoder
    dec = init_asr_params(cfg, seed=17, dtype=jnp.float32)["decoder"]
    n_audio = 4
    audio = rng.standard_normal((n_audio, dcfg.hidden_size)).astype(np.float32)
    prompt = [5, 6] + [dcfg.audio_pad_token_id] * n_audio + [7]
    P = 16
    toks = np.zeros(P, np.int32)
    toks[: len(prompt)] = prompt
    max_tokens = 7

    for eos_override in (dcfg.eos_token_id, -1):
        cfg_v = dataclasses.replace(dcfg, eos_token_id=eos_override)
        out, n_kept = generate_greedy(
            dec, cfg_v, jnp.asarray(toks), jnp.int32(len(prompt)),
            jnp.asarray(audio), jnp.int32(n_audio), 2, max_tokens,
            cache_dtype=jnp.float32,
        )
        expected = list(np.asarray(out)[: int(n_kept)])
        for chunk in (1, 2, 3, 8, 16):
            got = generate_greedy_streaming(
                dec, cfg_v, jnp.asarray(toks), jnp.int32(len(prompt)),
                jnp.asarray(audio), jnp.int32(n_audio), 2, max_tokens,
                cache_dtype=jnp.float32, chunk=chunk,
            )
            assert got == expected, (eos_override, chunk)


def test_streaming_mega_i8_matches_while_loop(rng):
    """`--kv-int8 --progress` config: the streaming path rides the int8-KV
    megakernel (decode_chunk_mega_i8, interpret mode on CPU) and must emit
    the same greedy tokens as the single-jit while_loop decode with the
    same int8 cache (VERDICT r2 weak-3 regression)."""
    import jax

    from qwen3_asr_tpu.ops.megakernel import pack_megakernel_params
    from qwen3_asr_tpu.runtime.params import (
        fuse_decoder_params,
        quantize_decoder_params,
    )

    cfg = tiny_asr_config()
    dcfg = cfg.decoder
    dec = init_asr_params(cfg, seed=3, dtype=jnp.bfloat16)["decoder"]
    dec = jax.tree.map(lambda x: np.asarray(x), dec)
    dec = fuse_decoder_params(quantize_decoder_params(dec, "int8pc"))
    dec["mega"] = pack_megakernel_params(dec, dcfg)

    n_audio = 4
    audio = rng.standard_normal((n_audio, dcfg.hidden_size)).astype(np.float32)
    prompt = [5, 6] + [dcfg.audio_pad_token_id] * n_audio + [7]
    P = 16
    toks = np.zeros(P, np.int32)
    toks[: len(prompt)] = prompt
    max_tokens = 8

    out, n_kept = generate_greedy(
        dec, dcfg, jnp.asarray(toks), jnp.int32(len(prompt)),
        jnp.asarray(audio), jnp.int32(n_audio), 2, max_tokens,
        cache_dtype=jnp.int8,
    )
    expected = list(np.asarray(out)[: int(n_kept)])

    for chunk in (3, 8):
        got = generate_greedy_streaming(
            dec, dcfg, jnp.asarray(toks), jnp.int32(len(prompt)),
            jnp.asarray(audio), jnp.int32(n_audio), 2, max_tokens,
            cache_dtype=jnp.int8, chunk=chunk, _force_mega_interpret=True,
        )
        assert got == expected, chunk


def test_mega_vmem_guard_falls_back_to_xla(rng, monkeypatch):
    """Long-context guard: when S exceeds the megakernel's VMEM budget
    (forced here by shrinking the budget), the streaming path must fall
    back to the XLA decode step and still emit the exact greedy tokens
    (this is what keeps 300+ s audio working instead of a Mosaic VMEM
    compile failure)."""
    import jax

    from qwen3_asr_tpu.ops import megakernel as MK
    from qwen3_asr_tpu.ops.megakernel import (
        mega_max_context,
        pack_megakernel_params,
    )
    from qwen3_asr_tpu.runtime.params import (
        fuse_decoder_params,
        quantize_decoder_params,
    )

    cfg = tiny_asr_config()
    dcfg = cfg.decoder
    dec = init_asr_params(cfg, seed=3, dtype=jnp.bfloat16)["decoder"]
    dec = jax.tree.map(lambda x: np.asarray(x), dec)
    dec = fuse_decoder_params(quantize_decoder_params(dec, "int8pc"))
    dec["mega"] = pack_megakernel_params(dec, dcfg)

    # sanity on the budget arithmetic at tiny hparams
    s8 = mega_max_context(dec["mega"], dcfg, kv_i8=True)
    s4 = mega_max_context(dec["mega"], dcfg, kv_i8=True, kv_i4=True)
    sb = mega_max_context(dec["mega"], dcfg, kv_i8=False)
    assert s8 % 128 == 0 and s8 > 0
    assert s4 >= s8 >= sb  # int4 cache fits the most rows, bf16 the fewest

    n_audio = 4
    audio = rng.standard_normal((n_audio, dcfg.hidden_size)).astype(np.float32)
    prompt = [5, 6] + [dcfg.audio_pad_token_id] * n_audio + [7]
    toks = np.zeros(16, np.int32)
    toks[: len(prompt)] = prompt
    max_tokens = 8

    out, n_kept = generate_greedy(
        dec, dcfg, jnp.asarray(toks), jnp.int32(len(prompt)),
        jnp.asarray(audio), jnp.int32(n_audio), 2, max_tokens,
        cache_dtype=jnp.int8,
    )
    expected = list(np.asarray(out)[: int(n_kept)])

    monkeypatch.setattr(MK, "_VMEM_BUDGET", 1)  # nothing fits -> XLA path
    assert mega_max_context(dec["mega"], dcfg, kv_i8=True) == 0
    got = generate_greedy_streaming(
        dec, dcfg, jnp.asarray(toks), jnp.int32(len(prompt)),
        jnp.asarray(audio), jnp.int32(n_audio), 2, max_tokens,
        cache_dtype=jnp.int8, _force_mega_interpret=True,
    )
    assert got == expected

    # spec refuses cleanly past the budget instead of a Mosaic crash
    import pytest

    from qwen3_asr_tpu.models.generate import generate_greedy_spec

    with pytest.raises(ValueError, match="VMEM"):
        generate_greedy_spec(
            dec, dcfg, jnp.asarray(toks), jnp.int32(len(prompt)),
            jnp.asarray(audio), jnp.int32(n_audio), 2, max_tokens, k=4,
            interpret=True)


def test_pipeline_fused_param(rng):
    """TranscribeParams(fused=True) == staged pipeline tokens/text."""
    cfg = tiny_asr_config()
    asr = Qwen3ASR(dtype=jnp.float32)
    asr.load_random(cfg, seed=13, vocab=make_byte_vocab(cfg.decoder.vocab_size, {}))
    t = np.arange(int(1.3 * 16000)) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 523 * t)).astype(np.float32)
    staged = asr.transcribe(audio, TranscribeParams(
        max_tokens=5, print_timing=False, prompt_bucket=32))
    fused = asr.transcribe(audio, TranscribeParams(
        max_tokens=5, print_timing=False, prompt_bucket=32, fused=True))
    assert fused.success
    assert fused.tokens == staged.tokens
    assert fused.text == staged.text


def test_fused_matches_staged(rng):
    """Single-dispatch fused transcription == staged pipeline."""
    from qwen3_asr_tpu.models.e2e import transcribe_fused
    from qwen3_asr_tpu.audio import generate_mel_filters

    cfg = tiny_asr_config()
    asr = Qwen3ASR(dtype=jnp.float32)
    asr.load_random(cfg, seed=13, vocab=make_byte_vocab(cfg.decoder.vocab_size, {}))

    t = np.arange(int(1.3 * 16000)) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 523 * t)).astype(np.float32)
    params = TranscribeParams(max_tokens=5, print_timing=False, prompt_bucket=32)
    staged = asr.transcribe(audio, params)

    out, n_kept = transcribe_fused(
        asr.params, cfg, audio, generate_mel_filters(), max_tokens=5
    )
    assert list(out[:n_kept]) == staged.tokens

    # int16 PCM input path too
    pcm = (audio * 32768.0).clip(-32768, 32767).astype(np.int16)
    out2, n_kept2 = transcribe_fused(
        asr.params, cfg, pcm, generate_mel_filters(), max_tokens=5
    )
    # int16/f32 differ by <1 LSB of PCM; greedy tokens should agree here
    assert list(out2[:n_kept2]) == staged.tokens


def test_streaming_rides_int4_megakernel(rng):
    """The int4 weight-stream pack is transparent to the streaming path:
    generate_greedy_streaming (int8 KV, interpret megakernel) must produce
    the same tokens as the batched int4 megakernel loop at B=1 — both ride
    the same nibble-packed stream, so divergence is a glue bug."""
    import jax

    from qwen3_asr_tpu.models.generate import generate_greedy_batch_mega
    from qwen3_asr_tpu.ops.megakernel import pack_megakernel_params
    from qwen3_asr_tpu.runtime.params import (
        fuse_decoder_params,
        quantize_decoder_params,
    )

    cfg = tiny_asr_config()
    dcfg = cfg.decoder
    dec = init_asr_params(cfg, seed=3, dtype=jnp.bfloat16)["decoder"]
    dec = jax.tree.map(lambda x: np.asarray(x), dec)
    dec = fuse_decoder_params(quantize_decoder_params(dec, "int8pc"))
    dec["mega"] = pack_megakernel_params(dec, dcfg, int4=True)

    n_audio = 4
    audio = rng.standard_normal((n_audio, dcfg.hidden_size)).astype(np.float32)
    prompt = [5, 6] + [dcfg.audio_pad_token_id] * n_audio + [7]
    P = 16
    toks = np.zeros(P, np.int32)
    toks[: len(prompt)] = prompt
    max_tokens = 6

    out_b, nk_b = generate_greedy_batch_mega(
        dec, dcfg, jnp.asarray(toks)[None], jnp.asarray([len(prompt)],
                                                        jnp.int32),
        jnp.asarray(audio)[None], jnp.asarray([n_audio], jnp.int32),
        2, max_tokens, interpret=True)
    expected = list(np.asarray(out_b)[0][: int(nk_b[0])])

    for chunk in (3, 8):
        got = generate_greedy_streaming(
            dec, dcfg, jnp.asarray(toks), jnp.int32(len(prompt)),
            jnp.asarray(audio), jnp.int32(n_audio), 2, max_tokens,
            cache_dtype=jnp.int8, chunk=chunk, _force_mega_interpret=True,
        )
        assert got == expected, chunk
