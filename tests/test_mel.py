"""Mel frontend parity: JAX device path vs float64 numpy oracle.

Mirrors the reference's test_mel.cpp contract (tolerance 1e-4 on the
normalized spectrogram, reference run_all_tests.sh:122) with the f64
portable-path implementation as the oracle.
"""

import numpy as np
import pytest

from qwen3_asr_tpu.audio import (
    generate_mel_filters,
    load_wav,
    log_mel_spectrogram,
    log_mel_spectrogram_ref,
    write_wav,
)
from qwen3_asr_tpu.audio.mel import num_mel_frames, reflect_pad


def make_audio(rng, seconds=2.0, sr=16000):
    n = int(seconds * sr)
    t = np.arange(n) / sr
    sig = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1333 * t)
        + 0.05 * rng.standard_normal(n)
    )
    return sig.astype(np.float32)


def test_filterbank_shape_and_norm():
    filters = generate_mel_filters()
    assert filters.shape == (128, 201)
    assert np.all(filters >= 0)
    # most filters have support (very narrow low-frequency triangles can
    # fall between integer FFT bins — faithful to the reference's integer-k
    # sampling, mel_spectrogram.cpp:392-406)
    assert (filters.sum(axis=1) > 0).mean() > 0.9
    # triangles should peak near their center and be unimodal-ish
    assert filters[0, 0] >= 0


def test_reflect_pad_matches_reference_semantics():
    x = np.arange(1, 6, dtype=np.float32)  # [1,2,3,4,5]
    out = reflect_pad(x, pad=3)
    # left: out[i] = x[pad - i] = x[3],x[2],x[1] = 4,3,2
    assert list(out[:3]) == [4, 3, 2]
    # right: x[n-2-i] = x[3],x[2],x[1] = 4,3,2
    assert list(out[-3:]) == [4, 3, 2]
    # short signal: out-of-range reflections are zero (not an error)
    short = np.array([1.0, 2.0], dtype=np.float32)
    out = reflect_pad(short, pad=4)
    assert list(out[:4]) == [0, 0, 0, 2]  # x[4],x[3],x[2] invalid, x[1]=2
    assert list(out[-4:]) == [1, 0, 0, 0]  # x[0]=1, rest invalid


def test_frame_count():
    # 2s of audio: padded = 32000 + 400; total = (32400-400)/160+1 = 201
    assert num_mel_frames(32000) == 200
    assert num_mel_frames(16000) == 100


@pytest.mark.parametrize("seconds", [0.5, 2.0, 3.17])
def test_mel_device_vs_oracle(rng, seconds):
    audio = make_audio(rng, seconds)
    ref = log_mel_spectrogram_ref(audio)
    out = log_mel_spectrogram(audio)
    assert out.shape == ref.shape
    assert out.shape[0] == 128
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=0)


def test_mel_bucketed_matches_exact(rng):
    audio = make_audio(rng, 1.3)
    exact = log_mel_spectrogram(audio)
    bucketed = log_mel_spectrogram(audio, bucket=100)
    np.testing.assert_allclose(bucketed, exact, atol=1e-6, rtol=0)


def test_wav_roundtrip(tmp_path, rng):
    audio = make_audio(rng, 0.25)
    path = str(tmp_path / "t.wav")
    write_wav(path, audio, 16000)
    loaded, sr = load_wav(path)
    assert sr == 16000
    assert loaded.shape == audio.shape
    np.testing.assert_allclose(loaded, audio, atol=1.0 / 32768)


def test_mel_int16_input_matches_float(rng):
    pcm = (make_audio(rng, 1.0) * 32768.0).clip(-32768, 32767).astype(np.int16)
    as_float = pcm.astype(np.float32) / 32768.0
    out_i16 = log_mel_spectrogram(pcm)
    out_f32 = log_mel_spectrogram(as_float)
    np.testing.assert_allclose(out_i16, out_f32, atol=1e-6, rtol=0)


def test_mel_device_filterbank_either_orientation(rng):
    """filters_t_device accepts a device-resident filterbank in either
    orientation: [n_mels, 201] (the public host contract) or the
    pre-transposed [201, n_mels], disambiguated by shape."""
    import jax.numpy as jnp

    audio = make_audio(rng, 0.5)
    filters = generate_mel_filters()
    base = log_mel_spectrogram(audio, filters)
    untransposed = log_mel_spectrogram(audio, jnp.asarray(filters))
    pretransposed = log_mel_spectrogram(
        audio, jnp.asarray(np.ascontiguousarray(filters.T)))
    np.testing.assert_allclose(untransposed, base, atol=1e-6, rtol=0)
    np.testing.assert_allclose(pretransposed, base, atol=1e-6, rtol=0)
