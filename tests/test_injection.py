"""Audio-injection unit tests (the reference's only no-model-needed tier,
tests/test_injection.cpp) — plus equivalence with the on-device splice."""

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.models.audio_injection import (
    embed_tokens,
    find_audio_positions,
    inject_audio,
    inject_audio_embeddings,
    validate_audio_injection,
)
from qwen3_asr_tpu.models.decoder import embed_with_audio


PAD = 99


def test_find_positions():
    toks = np.array([1, PAD, PAD, 2, PAD, 3])
    assert list(find_audio_positions(toks, PAD)) == [1, 2, 4]
    assert list(find_audio_positions(np.array([1, 2, 3]), PAD)) == []


def test_embed_and_inject(rng):
    embd = rng.standard_normal((100, 8)).astype(np.float32)
    toks = np.array([5, PAD, PAD, 7], dtype=np.int32) % 100
    audio = rng.standard_normal((2, 8)).astype(np.float32)

    emb = embed_tokens(embd, toks)
    np.testing.assert_array_equal(emb[0], embd[5])

    pos = find_audio_positions(toks, PAD % 100)
    out = inject_audio_embeddings(emb, audio, pos)
    np.testing.assert_array_equal(out[1], audio[0])
    np.testing.assert_array_equal(out[2], audio[1])
    np.testing.assert_array_equal(out[0], embd[5])  # untouched
    assert validate_audio_injection(out, audio, pos)
    # original not mutated
    np.testing.assert_array_equal(emb[1], embd[PAD % 100])


def test_inject_count_mismatch_raises(rng):
    emb = rng.standard_normal((4, 8)).astype(np.float32)
    audio = rng.standard_normal((3, 8)).astype(np.float32)
    with pytest.raises(ValueError):
        inject_audio_embeddings(emb, audio, np.array([1, 2]))


def test_matches_device_splice(rng):
    """The numpy reference and the decoder's on-device where-gather splice
    must agree (contiguous pad run, as both prompts guarantee)."""
    embd = rng.standard_normal((50, 8)).astype(np.float32)
    toks = np.array([3, 4, PAD % 50, PAD % 50, PAD % 50, 6], dtype=np.int32)
    audio = rng.standard_normal((3, 8)).astype(np.float32)

    ref = inject_audio(embd, toks, audio, PAD % 50)
    dev = np.asarray(embed_with_audio(
        {"token_embd": jnp.asarray(embd)}, jnp.asarray(toks),
        jnp.asarray(audio), jnp.int32(3), 2,
    ))
    np.testing.assert_allclose(dev, ref, atol=1e-6)
