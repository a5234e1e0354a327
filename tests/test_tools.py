"""Tools: compare + WER utilities (reference contracts)."""

import numpy as np
import pytest

from qwen3_asr_tpu.tools.compare import compare_arrays, main as compare_main
from qwen3_asr_tpu.tools.compute_wer import (
    char_error_rate,
    levenshtein,
    main as wer_main,
    word_error_rate,
)


def test_levenshtein():
    assert levenshtein(list("kitten"), list("sitting")) == 3
    assert levenshtein([], list("ab")) == 2
    assert levenshtein(list("same"), list("same")) == 0


def test_wer_cer():
    assert word_error_rate("the cat sat", "the cat sat") == 0
    assert word_error_rate("the cat sat", "the dog sat") == pytest.approx(1 / 3)
    assert char_error_rate("abcd", "abce") == pytest.approx(0.25)


def test_wer_cli_threshold(tmp_path):
    ref = tmp_path / "ref.txt"
    hyp = tmp_path / "hyp.txt"
    ref.write_text("hello world how are you")
    hyp.write_text("hello world how are you")
    assert wer_main(["--ref", str(ref), "--hyp", str(hyp),
                     "--threshold", "0.05"]) == 0
    hyp.write_text("hello word how is you")
    assert wer_main(["--ref", str(ref), "--hyp", str(hyp),
                     "--threshold", "0.05"]) == 1


def test_compare_arrays(capsys, rng):
    a = rng.standard_normal((4, 5)).astype(np.float32)
    assert compare_arrays(a, a.copy(), atol=1e-6, rtol=0, name="x")
    b = a.copy()
    b[1, 2] += 1.0
    assert not compare_arrays(a, b, atol=1e-6, rtol=0, name="x")
    out = capsys.readouterr().out
    assert "FAIL" in out and "(1, 2)" in out


def test_compare_cli_dirs(tmp_path, rng):
    a_dir = tmp_path / "a"
    b_dir = tmp_path / "b"
    a_dir.mkdir()
    b_dir.mkdir()
    x = rng.standard_normal((3, 3)).astype(np.float32)
    np.save(a_dir / "t.npy", x)
    np.save(b_dir / "t.npy", x)
    assert compare_main([str(a_dir), str(b_dir), "--atol", "1e-6"]) == 0
    np.save(b_dir / "t.npy", x + 1)
    assert compare_main([str(a_dir), str(b_dir), "--atol", "1e-6"]) == 1


def test_validate_real_weights_recipe(tmp_path, rng):
    """The one-command real-checkpoint validation harness runs turn-key:
    synthetic HF checkpoint -> convert -> dump -> tolerance gates ->
    end-to-end transcript + WER gate, all through the real subprocess
    entry points. With self-consistent goldens every gate must pass."""
    import json
    import subprocess
    import sys

    import jax
    import jax.numpy as jnp

    pytest.importorskip("safetensors")
    from qwen3_asr_tpu.audio import write_wav
    from qwen3_asr_tpu.config import tiny_asr_config
    from qwen3_asr_tpu.runtime.params import init_asr_params
    from test_convert import _hf_checkpoint

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    cfg = tiny_asr_config()
    params = jax.tree.map(np.asarray, init_asr_params(cfg, 11, jnp.float32))
    _hf_checkpoint(hf_dir, cfg, params)

    wav = tmp_path / "s.wav"
    t = np.arange(8000) / 16000
    write_wav(str(wav), (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))

    # self-consistent goldens: dump from the converted model itself,
    # transcribe once for the transcript golden
    goldens = tmp_path / "goldens"
    gguf = tmp_path / "g.gguf"
    run = lambda argv: subprocess.run(  # noqa: E731
        [sys.executable, "-m"] + argv, cwd="/root/repo").returncode
    assert run(["qwen3_asr_tpu.tools.convert_hf_to_gguf",
                "-i", str(hf_dir), "-o", str(gguf), "-t", "f32"]) == 0
    assert run(["qwen3_asr_tpu.tools.dump_intermediates", "-m", str(gguf),
                "-f", str(wav), "-o", str(goldens),
                "--platform", "cpu"]) == 0
    assert run(["qwen3_asr_tpu.cli", "-m", str(gguf), "-f", str(wav),
                "--max-tokens", "3", "--no-timing", "--platform", "cpu",
                "-o", str(goldens / "transcript.txt")]) == 0

    out = subprocess.run(
        [sys.executable, "-m", "qwen3_asr_tpu.tools.validate_real_weights",
         "--hf-dir", str(hf_dir), "--goldens", str(goldens),
         "--audio", str(wav), "--workdir", str(tmp_path / "work"),
         "--type", "f32", "--platform", "cpu", "--max-tokens", "3"],
        cwd="/root/repo", capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    verdict = json.loads(out.stdout.strip().splitlines()[-1])
    assert verdict["passed"] is True
    # every reference gate actually ran (nothing silently skipped)
    for gate in ("mel.npy", "audio_features.npy", "decoder_logits.npy",
                 "transcript_exact", "wer"):
        assert verdict["results"][gate] is True, gate
