"""Bucketed (bounded-compile-count) serving path == exact path.

The padded mel/encoder/decode chain (mel_bucket > 0) must reproduce the
exact-shape pipeline: same encoder features on the valid rows, same greedy
tokens. Covers the gap-closing gather (partial tail chunk), the attention
valid-length mask, and the zero-fill of mel padding frames.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.audio import generate_mel_filters, log_mel_spectrogram
from qwen3_asr_tpu.audio.mel import log_mel_spectrogram_padded, num_mel_frames
from qwen3_asr_tpu.config import tiny_asr_config
from qwen3_asr_tpu.models.encoder import encode_audio, encode_audio_padded
from qwen3_asr_tpu.pipeline.asr import Qwen3ASR, TranscribeParams
from qwen3_asr_tpu.runtime.params import init_asr_params

from helpers import make_byte_vocab


def _tone(seconds, freq=440):
    t = np.arange(int(seconds * 16000)) / 16000
    return (0.3 * np.sin(2 * np.pi * freq * t)
            + 0.01 * np.sin(2 * np.pi * 3 * freq * t)).astype(np.float32)


@pytest.mark.parametrize("seconds", [0.73, 1.0, 1.61])
def test_padded_mel_matches_exact(seconds):
    audio = _tone(seconds)
    filters = generate_mel_filters()
    exact = log_mel_spectrogram(audio, filters)                # [128, N]
    padded, n_true = log_mel_spectrogram_padded(audio, filters, bucket=200)
    assert n_true == num_mel_frames(len(audio)) == exact.shape[1]
    assert padded.shape[1] % 200 == 0 and padded.shape[1] >= n_true
    np.testing.assert_allclose(np.asarray(padded[:, :n_true]), exact,
                               atol=1e-6)
    # padding frames are exactly zero (the encoder's chunk conv reads them)
    assert np.all(np.asarray(padded[:, n_true:]) == 0.0)


@pytest.mark.parametrize("seconds", [0.73, 1.0, 2.4])
def test_padded_encoder_matches_exact(rng, seconds):
    cfg = tiny_asr_config()
    params = init_asr_params(cfg, seed=5, dtype=jnp.float32)
    audio = _tone(seconds)
    filters = generate_mel_filters()

    exact = np.asarray(encode_audio(
        params["encoder"], cfg.encoder,
        log_mel_spectrogram(audio, filters)
    ))
    mel_p, n_true = log_mel_spectrogram_padded(audio, filters, bucket=200)
    feats, n_audio = encode_audio_padded(
        params["encoder"], cfg.encoder, mel_p, n_true
    )
    assert n_audio == exact.shape[0]
    np.testing.assert_allclose(np.asarray(feats)[:n_audio], exact,
                               atol=2e-4, rtol=1e-4)


def test_bucketed_align_matches_exact(rng):
    """Bucketed FA path (block-diagonal windows + dynamic valid length)
    reproduces the exact alignment word-for-word."""
    from qwen3_asr_tpu.config import tiny_aligner_config
    from qwen3_asr_tpu.pipeline.aligner import ForcedAligner

    cfg = tiny_aligner_config()
    fa = ForcedAligner(dtype=jnp.float32)
    fa.load_random(cfg, seed=23,
                   vocab=make_byte_vocab(cfg.decoder.vocab_size, {}))
    audio = _tone(1.23)
    exact = fa.align(audio, "hello bucketed world")
    bucketed = fa.align(audio, "hello bucketed world", mel_bucket=200)
    assert bucketed.success, bucketed.error_msg
    assert [(w.word, w.start, w.end) for w in bucketed.words] == \
           [(w.word, w.start, w.end) for w in exact.words]


def test_fused_align_matches_exact(rng):
    """Single-dispatch fused alignment == staged alignment word-for-word."""
    from qwen3_asr_tpu.config import tiny_aligner_config
    from qwen3_asr_tpu.pipeline.aligner import ForcedAligner

    cfg = tiny_aligner_config()
    fa = ForcedAligner(dtype=jnp.float32)
    fa.load_random(cfg, seed=47,
                   vocab=make_byte_vocab(cfg.decoder.vocab_size, {}))
    audio = _tone(1.17)
    exact = fa.align(audio, "one two three")
    fused = fa.align(audio, "one two three", fused=True)
    assert fused.success
    assert ([(w.word, w.start, w.end) for w in fused.words]
            == [(w.word, w.start, w.end) for w in exact.words])


def test_align_batch_matches_single(rng):
    """align_batch (batched frontend + ONE NAR dispatch) reproduces the
    single-pair alignments word-for-word, including mixed lengths."""
    from qwen3_asr_tpu.config import tiny_aligner_config
    from qwen3_asr_tpu.pipeline.aligner import ForcedAligner

    cfg = tiny_aligner_config()
    fa = ForcedAligner(dtype=jnp.float32)
    fa.load_random(cfg, seed=43,
                   vocab=make_byte_vocab(cfg.decoder.vocab_size, {}))
    pairs = [(_tone(1.1, 440), "alpha beta"),
             (_tone(0.8, 330), "gamma delta epsilon"),
             (_tone(1.1, 550), "zeta")]
    singles = [fa.align(a, t, mel_bucket=200) for a, t in pairs]
    batched = fa.align_batch([a for a, _ in pairs], [t for _, t in pairs],
                             mel_bucket=200)
    for i, (s, b) in enumerate(zip(singles, batched)):
        assert b.success
        assert ([(w.word, w.start, w.end) for w in b.words]
                == [(w.word, w.start, w.end) for w in s.words])
        # per-item timing surface (VERDICT r2 weak-7): stage times are
        # whole-batch dispatch times + batch provenance per result
        assert b.batch_size == len(pairs) and b.batch_index == i
        assert b.t_decode_ms > 0 and b.t_encode_ms > 0 and b.t_mel_ms > 0
        assert b.t_total_ms >= b.t_decode_ms


def test_quantized_bucketed_pipeline_runs(rng):
    """Serving combo: int8 modes x mel bucketing through the full pipeline
    (q8_0 exercises the Pallas fallbacks on CPU; int8pc the XLA int8 dots;
    int4 packs the megakernel stream and falls back to int8pc off-TPU)."""
    for mode in ("q8_0", "int8pc", "int4"):
        cfg = tiny_asr_config()
        asr = Qwen3ASR(dtype=jnp.float32, quantize=mode)
        asr.load_random(cfg, seed=11,
                        vocab=make_byte_vocab(cfg.decoder.vocab_size, {}))
        out = asr.transcribe(_tone(1.1), TranscribeParams(
            max_tokens=4, print_timing=False, prompt_bucket=32,
            mel_bucket=200))
        assert out.success, (mode, out.error_msg)
        assert len(out.tokens) <= 4


def test_bucketed_transcribe_matches_exact(rng):
    cfg = tiny_asr_config()
    asr = Qwen3ASR(dtype=jnp.float32)
    asr.load_random(cfg, seed=11,
                    vocab=make_byte_vocab(cfg.decoder.vocab_size, {}))
    audio = _tone(1.37)

    exact = asr.transcribe(audio, TranscribeParams(
        max_tokens=5, print_timing=False, prompt_bucket=32))
    bucketed = asr.transcribe(audio, TranscribeParams(
        max_tokens=5, print_timing=False, prompt_bucket=32, mel_bucket=200))
    assert bucketed.success
    assert bucketed.tokens == exact.tokens

    # batch path with bucketing
    outs = asr.transcribe_batch(
        [audio, _tone(0.9, 330)],
        TranscribeParams(max_tokens=5, print_timing=False, prompt_bucket=32,
                         mel_bucket=200),
    )
    assert outs[0].success and outs[0].tokens == exact.tokens


def test_batched_flash_encoder_core_matches_vmapped(rng):
    """The natively-batched encoder core (batched flash kernel, batch =
    grid axis) == vmap of the single-item core on the valid rows. This is
    the TPU serving path's math, run here in interpret mode."""
    import jax

    from qwen3_asr_tpu.models.encoder import (
        _encode_padded_core,
        _encode_padded_core_batch,
        _gap_params,
    )

    cfg = tiny_asr_config()
    params = init_asr_params(cfg, seed=9, dtype=jnp.float32)["encoder"]
    filters = generate_mel_filters()
    mels, gaps = [], []
    for sec, f0 in ((1.31, 440), (0.77, 330), (2.0, 550)):
        mel_p, n_true = log_mel_spectrogram_padded(_tone(sec, f0), filters,
                                                   bucket=200)
        mels.append(np.asarray(mel_p))
        gaps.append(_gap_params(cfg.encoder, n_true))
    F_b = max(m.shape[1] for m in mels)
    mel_b = jnp.asarray(np.stack(
        [np.pad(m, ((0, 0), (0, F_b - m.shape[1]))) for m in mels]))
    gp = jnp.asarray([g[0] for g in gaps], jnp.int32)
    gs = jnp.asarray([g[1] for g in gaps], jnp.int32)
    nv = jnp.asarray([g[2] for g in gaps], jnp.int32)

    got = np.asarray(_encode_padded_core_batch(
        params, cfg.encoder, mel_b, gp, gs, nv, interpret=True))
    want = np.asarray(jax.vmap(
        lambda m, a, b, c: _encode_padded_core(params, cfg.encoder, m,
                                               a, b, c, allow_flash=False)
    )(mel_b, gp, gs, nv))
    for b, g in enumerate(gaps):
        n_audio = g[2]
        np.testing.assert_allclose(got[b, :n_audio], want[b, :n_audio],
                                   atol=2e-4, rtol=1e-4)
