"""Batched multi-file transcription == per-file transcription."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.config import tiny_asr_config
from qwen3_asr_tpu.pipeline.asr import Qwen3ASR, TranscribeParams
from qwen3_asr_tpu.runtime.params import init_asr_params

from helpers import make_byte_vocab


def make_audio(freq, seconds):
    t = np.arange(int(seconds * 16000)) / 16000
    return (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_batch_matches_sequential():
    cfg = tiny_asr_config()
    asr = Qwen3ASR(dtype=jnp.float32)
    vocab = make_byte_vocab(cfg.decoder.vocab_size, {})
    asr.load_random(cfg, seed=11, vocab=vocab)

    audios = [make_audio(440, 1.0), make_audio(880, 1.3), make_audio(220, 0.7)]
    params = TranscribeParams(max_tokens=5, print_timing=False, prompt_bucket=32)

    seq = [asr.transcribe(a, params) for a in audios]
    batch = asr.transcribe_batch(audios, params)

    for s, b in zip(seq, batch):
        assert s.success and b.success
        assert b.tokens == s.tokens


def test_batch_reports_bad_file_and_continues(tmp_path):
    from qwen3_asr_tpu.audio import write_wav

    cfg = tiny_asr_config()
    asr = Qwen3ASR(dtype=jnp.float32)
    asr.load_random(cfg, seed=11, vocab=make_byte_vocab(cfg.decoder.vocab_size, {}))

    bad = str(tmp_path / "bad.wav")
    write_wav(bad, make_audio(440, 0.5), sample_rate=8000)
    params = TranscribeParams(max_tokens=4, print_timing=False, prompt_bucket=32)
    results = asr.transcribe_batch([make_audio(440, 1.0), bad], params)
    assert results[0].success
    assert not results[1].success and "16kHz" in results[1].error_msg
