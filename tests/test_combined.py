"""Combined transcribe+align flow and its JSON output."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.config import tiny_aligner_config, tiny_asr_config
from qwen3_asr_tpu.pipeline.aligner import ForcedAligner
from qwen3_asr_tpu.pipeline.asr import Qwen3ASR, TranscribeParams
from qwen3_asr_tpu.pipeline.combined import alignment_to_json, transcribe_and_align

from helpers import make_byte_vocab


def test_combined_pipeline(rng):
    asr_cfg = tiny_asr_config()
    asr = Qwen3ASR(dtype=jnp.float32)
    asr.load_random(asr_cfg, seed=31,
                    vocab=make_byte_vocab(asr_cfg.decoder.vocab_size, {}))

    fa_cfg = tiny_aligner_config()
    fa = ForcedAligner(dtype=jnp.float32)
    fa.load_random(fa_cfg, seed=32,
                   vocab=make_byte_vocab(fa_cfg.decoder.vocab_size, {}))

    t = np.arange(16000) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    params = TranscribeParams(max_tokens=4, print_timing=False, prompt_bucket=32)

    out = transcribe_and_align(asr, fa, audio, params)
    # with random weights the transcript may be empty; the flow must still
    # succeed and produce a (possibly empty) word list
    assert out.success, out.error_msg
    assert out.asr.success and out.alignment.success
    # language detection ran on the raw ASR text
    assert isinstance(out.detected_language, str)

    js = alignment_to_json(out.alignment)
    data = json.loads(js)
    assert "words" in data
    for w in data["words"]:
        assert set(w) == {"word", "start", "end"}


def test_combined_fused_staged_pcm_matches_unfused(rng):
    """fused=True stages the PCM on device ONCE (models/e2e.py::
    prepare_pcm) and both legs reuse the buffer; results must match the
    per-leg-upload (unfused) flow exactly."""
    asr_cfg = tiny_asr_config()
    asr = Qwen3ASR(dtype=jnp.float32)
    asr.load_random(asr_cfg, seed=31,
                    vocab=make_byte_vocab(asr_cfg.decoder.vocab_size, {}))
    fa_cfg = tiny_aligner_config()
    fa = ForcedAligner(dtype=jnp.float32)
    fa.load_random(fa_cfg, seed=32,
                   vocab=make_byte_vocab(fa_cfg.decoder.vocab_size, {}))

    t = np.arange(16000) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    base = transcribe_and_align(
        asr, fa, audio,
        TranscribeParams(max_tokens=4, print_timing=False, prompt_bucket=32))
    fused = transcribe_and_align(
        asr, fa, audio,
        TranscribeParams(max_tokens=4, print_timing=False, prompt_bucket=32,
                         fused=True))
    assert fused.success, fused.error_msg
    assert fused.asr.tokens == base.asr.tokens
    assert [(w.word, w.start, w.end) for w in fused.alignment.words] == [
        (w.word, w.start, w.end) for w in base.alignment.words]

    # int16 PCM path (the WAV loader's dtype) through the staged buffer
    pcm16 = (audio * 32767).astype(np.int16)
    fused16 = transcribe_and_align(
        asr, fa, pcm16,
        TranscribeParams(max_tokens=4, print_timing=False, prompt_bucket=32,
                         fused=True))
    assert fused16.success, fused16.error_msg


def test_combined_fused_wav_error_surface(tmp_path):
    """fused combined mode loads the WAV itself (to stage one upload); the
    error strings must match the ASR leg's surface exactly."""
    from qwen3_asr_tpu.audio import write_wav

    asr_cfg = tiny_asr_config()
    asr = Qwen3ASR(dtype=jnp.float32)
    asr.load_random(asr_cfg, seed=31,
                    vocab=make_byte_vocab(asr_cfg.decoder.vocab_size, {}))
    fa_cfg = tiny_aligner_config()
    fa = ForcedAligner(dtype=jnp.float32)
    fa.load_random(fa_cfg, seed=32,
                   vocab=make_byte_vocab(fa_cfg.decoder.vocab_size, {}))
    params = TranscribeParams(max_tokens=4, print_timing=False, fused=True)

    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"garbage")
    out = transcribe_and_align(asr, fa, str(bad), params)
    assert not out.success
    assert out.error_msg.startswith("ASR failed: Failed to load audio file")

    w8k = tmp_path / "s8k.wav"
    write_wav(str(w8k), np.zeros(800, np.float32), sample_rate=8000)
    out = transcribe_and_align(asr, fa, str(w8k), params)
    assert not out.success
    assert out.error_msg == "ASR failed: Audio must be 16kHz, got 8000 Hz"


def test_combined_korean_dict_autoload(rng):
    """language_override='korean' auto-loads the vendored dictionary into
    the aligner inside transcribe_and_align."""
    asr_cfg = tiny_asr_config()
    asr = Qwen3ASR(dtype=jnp.float32)
    asr.load_random(asr_cfg, seed=31,
                    vocab=make_byte_vocab(asr_cfg.decoder.vocab_size, {}))
    fa_cfg = tiny_aligner_config()
    fa = ForcedAligner(dtype=jnp.float32)
    fa.load_random(fa_cfg, seed=32,
                   vocab=make_byte_vocab(fa_cfg.decoder.vocab_size, {}))

    t = np.arange(16000) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    params = TranscribeParams(max_tokens=4, print_timing=False,
                              prompt_bucket=32)
    assert not fa.ko_dict
    out = transcribe_and_align(asr, fa, audio, params,
                               language_override="korean")
    assert out.success, out.error_msg
    assert len(fa.ko_dict) > 15000  # vendored assets/korean_words.txt


def test_alignment_json_escaping():
    from qwen3_asr_tpu.pipeline.aligner import AlignedWord, AlignmentResult

    r = AlignmentResult(success=True, words=[
        AlignedWord(word='quo"te\\back', start=0.0, end=0.5),
        AlignedWord(word="한글", start=0.5, end=1.0),
    ])
    data = json.loads(alignment_to_json(r))
    assert data["words"][0]["word"] == 'quo"te\\back'
    assert data["words"][1]["word"] == "한글"
