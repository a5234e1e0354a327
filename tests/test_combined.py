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
