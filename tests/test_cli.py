"""CLI smoke tests (reference contract: main.cpp modes, stdout data,
stderr diagnostics, exit 1 on error)."""

import json
import subprocess
import sys
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.audio import write_wav
from qwen3_asr_tpu.cli import build_parser, find_korean_dict, main
from qwen3_asr_tpu.config import tiny_aligner_config, tiny_asr_config
from qwen3_asr_tpu.runtime.params import init_aligner_params, init_asr_params

from helpers import make_byte_vocab, write_tiny_gguf


def make_models(tmp_path):
    cfg = tiny_asr_config()
    params = jax.tree.map(np.asarray, init_asr_params(cfg, 3, jnp.float32))
    vocab = make_byte_vocab(cfg.decoder.vocab_size, {
        cfg.decoder.eos_token_id: "<|im_end|>",
        cfg.decoder.audio_pad_token_id: "<|audio_pad|>",
    })
    asr_path = str(tmp_path / "asr.gguf")
    write_tiny_gguf(asr_path, cfg, params, vocab=vocab, merges=[])

    fcfg = tiny_aligner_config()
    fparams = jax.tree.map(np.asarray, init_aligner_params(fcfg, 4, jnp.float32))
    fvocab = make_byte_vocab(fcfg.decoder.vocab_size, {
        fcfg.timestamp_token_id: "<|ts|>",
    })
    fa_path = str(tmp_path / "fa.gguf")
    write_tiny_gguf(fa_path, fcfg, fparams, aligner=True, vocab=fvocab, merges=[])
    return asr_path, fa_path


def test_arg_validation():
    # --align without --text
    assert main(["-f", "x.wav", "--align"]) == 1
    # --transcribe-align without aligner model
    assert main(["-f", "x.wav", "--transcribe-align"]) == 1
    # --align + --transcribe-align
    assert main(["-f", "x.wav", "--align", "--text", "t",
                 "--transcribe-align"]) == 1


def test_missing_audio_file(tmp_path):
    asr_path, _ = make_models(tmp_path)
    rc = main(["-m", asr_path, "-f", str(tmp_path / "nope.wav"),
               "--dtype", "float32", "--no-timing"])
    assert rc == 1


def test_transcribe_mode(tmp_path, capsys):
    asr_path, _ = make_models(tmp_path)
    wav = str(tmp_path / "a.wav")
    t = np.arange(16000) / 16000
    write_wav(wav, (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))

    rc = main(["-m", asr_path, "-f", wav, "--max-tokens", "4",
               "--dtype", "float32", "--no-timing", "--tokens"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.endswith("\n")


def test_transcribe_quantize_int4_plumbing(tmp_path, capsys):
    """--quantize int4 through the CLI: XLA paths resolve it to int8pc,
    the megakernel pack carries the nibble stream (CPU: pack happens,
    decode rides the XLA int8pc path) — the mode must load and
    transcribe, not crash in the quantize resolution."""
    asr_path, _ = make_models(tmp_path)
    wav = str(tmp_path / "a.wav")
    t = np.arange(16000) / 16000
    write_wav(wav, (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))

    rc = main(["-m", asr_path, "-f", wav, "--max-tokens", "4",
               "--dtype", "float32", "--no-timing", "--tokens",
               "--quantize", "int4", "--kv-int8"])
    assert rc == 0
    assert capsys.readouterr().out.endswith("\n")


def test_transcribe_temperature_sampling(tmp_path, capsys):
    """--temperature plumbing: sampled decoding loads and transcribes;
    the same seed reproduces the same stdout transcript."""
    asr_path, _ = make_models(tmp_path)
    wav = str(tmp_path / "a.wav")
    t = np.arange(16000) / 16000
    write_wav(wav, (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))

    args = ["-m", asr_path, "-f", wav, "--max-tokens", "4",
            "--dtype", "float32", "--no-timing",
            "--temperature", "0.9", "--top-p", "0.95", "--seed", "7"]
    assert main(args) == 0
    first = capsys.readouterr().out
    assert main(args) == 0
    assert capsys.readouterr().out == first


def test_align_mode_json_output(tmp_path, capsys):
    _, fa_path = make_models(tmp_path)
    wav = str(tmp_path / "a.wav")
    t = np.arange(16000) / 16000
    write_wav(wav, (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))

    out_file = str(tmp_path / "out.json")
    rc = main(["-m", fa_path, "-f", wav, "--align", "--text", "hello world",
               "--dtype", "float32", "--no-timing", "-o", out_file])
    assert rc == 0
    with open(out_file) as f:
        data = json.load(f)
    assert "words" in data
    assert [w["word"] for w in data["words"]] == ["hello", "world"]
    for w in data["words"]:
        assert set(w) == {"word", "start", "end"}

    # --output-format srt renders the same alignment as subtitles (the
    # aligner programs are already compiled, so this leg is cheap)
    srt_file = str(tmp_path / "out.srt")
    rc = main(["-m", fa_path, "-f", wav, "--align", "--text", "hello world",
               "--dtype", "float32", "--no-timing", "-o", srt_file,
               "--output-format", "srt"])
    assert rc == 0
    srt = open(srt_file, encoding="utf-8").read()
    assert srt.startswith("1\n")
    assert "-->" in srt and "hello world" in srt


def test_transcribe_align_mode(tmp_path, capsys):
    """CLI -a/--transcribe-align runs both models through the shared
    pipeline.combined.transcribe_and_align and emits alignment JSON."""
    asr_path, fa_path = make_models(tmp_path)
    wav = str(tmp_path / "a.wav")
    t = np.arange(16000) / 16000
    write_wav(wav, (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))

    rc = main(["-m", asr_path, "--aligner-model", fa_path, "-f", wav,
               "--transcribe-align", "--max-tokens", "4",
               "--dtype", "float32"])
    assert rc == 0
    captured = capsys.readouterr()
    data = json.loads(captured.out)
    assert "words" in data
    for w in data["words"]:
        assert set(w) == {"word", "start", "end"}
    # combined timing block goes to stderr, not stdout
    assert "Combined Timing" in captured.err
    assert "Combined Timing" not in captured.out


def test_find_korean_dict(tmp_path):
    model_dir = tmp_path / "models"
    assets = tmp_path / "assets"
    model_dir.mkdir()
    assets.mkdir()
    (assets / "korean_dict_jieba.dict").write_text("word 1 N\n")
    found = find_korean_dict(str(model_dir / "m.gguf"))
    assert found.endswith("korean_dict_jieba.dict")


def test_find_korean_dict_vendored():
    # with no model-side dict, the vendored assets/korean_words.txt is found
    found = find_korean_dict("/nonexistent/dir/model.gguf")
    assert found.endswith("korean_words.txt")
    assert os.path.isfile(found)


def test_align_mode_korean_dict_loads(tmp_path, capsys):
    """-l korean wires the vendored dictionary into the aligner."""
    _, fa_path = make_models(tmp_path)
    wav = str(tmp_path / "a.wav")
    t = np.arange(16000) / 16000
    write_wav(wav, (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))

    rc = main(["-m", fa_path, "-f", wav, "--align", "--text", "안녕하세요",
               "-l", "korean", "--dtype", "float32", "--no-timing"])
    assert rc == 0
    captured = capsys.readouterr()
    assert "Korean dictionary loaded" in captured.err
    data = json.loads(captured.out)
    assert len(data["words"]) >= 1


def test_save_mel_debug_hook(tmp_path, capsys):
    """--save-mel writes the golden-layout [n_mels, n_frames] f32 .npy
    (mel_spectrogram.h:34-65 save_npy parity) matching the oracle mel,
    then the selected mode still runs."""
    from qwen3_asr_tpu.audio import log_mel_spectrogram_ref

    asr_path, _ = make_models(tmp_path)
    wav = str(tmp_path / "a.wav")
    t = np.arange(16000) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    write_wav(wav, audio)
    mel_path = str(tmp_path / "mel.npy")

    rc = main(["-m", asr_path, "-f", wav, "--max-tokens", "2",
               "--dtype", "float32", "--no-timing", "--save-mel", mel_path])
    assert rc == 0
    got = np.load(mel_path)
    # oracle on the WAV's stored samples (the float->int16 write is lossy;
    # the 1e-4 gate is about the mel math, not the container quantization)
    from qwen3_asr_tpu.audio import load_wav

    stored, sr = load_wav(wav)
    assert sr == 16000
    want = log_mel_spectrogram_ref(stored)
    assert got.shape == want.shape and got.dtype == np.float32
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)
    assert capsys.readouterr().out.endswith("\n")  # mode output intact
