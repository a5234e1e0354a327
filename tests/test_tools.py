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
         "--type", "f32", "--platform", "cpu", "--max-tokens", "3",
         "--quantize", "int4", "--kv-int4"],
        cwd="/root/repo", capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    verdict = json.loads(out.stdout.strip().splitlines()[-1])
    assert verdict["passed"] is True
    # every reference gate actually ran (nothing silently skipped),
    # including the quantized-config WER leg (int4 = the bench default)
    for gate in ("mel.npy", "audio_features.npy", "decoder_logits.npy",
                 "transcript_exact", "wer", "transcribe_int4", "wer_int4"):
        assert verdict["results"][gate] is True, gate


def test_validate_real_weights_fa_leg(tmp_path, rng):
    """The forced-aligner leg of the validation harness runs turn-key
    (VERDICT r2 next-3): synthetic FA HF checkpoint -> convert -> FA
    intermediate dumps -> tolerance gates -> end-to-end alignment ->
    word-timestamp gate, one command together with the ASR leg."""
    import json
    import subprocess
    import sys

    import jax
    import jax.numpy as jnp

    pytest.importorskip("safetensors")
    from qwen3_asr_tpu.audio import write_wav
    from qwen3_asr_tpu.config import tiny_aligner_config, tiny_asr_config
    from qwen3_asr_tpu.runtime.params import (
        init_aligner_params,
        init_asr_params,
    )
    from test_convert import _hf_checkpoint

    # ASR checkpoint (the harness requires the ASR leg)
    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    cfg = tiny_asr_config()
    params = jax.tree.map(np.asarray, init_asr_params(cfg, 11, jnp.float32))
    _hf_checkpoint(hf_dir, cfg, params)

    # FA checkpoint: same fixture + the FA config/tensor patch
    fa_dir = tmp_path / "fa_hf"
    fa_dir.mkdir()
    fa_cfg = tiny_aligner_config()
    fa_params = jax.tree.map(np.asarray,
                             init_aligner_params(fa_cfg, 37, jnp.float32))
    _hf_checkpoint(fa_dir, fa_cfg, fa_params)
    config = json.loads((fa_dir / "config.json").read_text())
    config["thinker_config"]["model_type"] = "qwen3_forced_aligner"
    config["thinker_config"]["classify_num"] = fa_cfg.decoder.classify_num
    config["timestamp_token_id"] = fa_cfg.timestamp_token_id
    (fa_dir / "config.json").write_text(json.dumps(config))
    from safetensors.numpy import load_file, save_file

    t = load_file(str(fa_dir / "model.safetensors"))
    t["thinker.classify_head.weight"] = np.ascontiguousarray(
        np.asarray(fa_params["decoder"]["classify_w"]).T)
    t["thinker.classify_head.bias"] = np.asarray(
        fa_params["decoder"]["classify_b"])
    save_file(t, str(fa_dir / "model.safetensors"))

    wav = tmp_path / "s.wav"
    tt = np.arange(8000) / 16000
    write_wav(str(wav), (0.3 * np.sin(2 * np.pi * 440 * tt)).astype(np.float32))
    text = "alpha beta"

    run = lambda argv: subprocess.run(  # noqa: E731
        [sys.executable, "-m"] + argv, cwd="/root/repo").returncode

    # self-consistent goldens for BOTH legs
    goldens = tmp_path / "goldens"
    gguf = tmp_path / "g.gguf"
    fa_gguf = tmp_path / "fa.gguf"
    assert run(["qwen3_asr_tpu.tools.convert_hf_to_gguf",
                "-i", str(hf_dir), "-o", str(gguf), "-t", "f32"]) == 0
    assert run(["qwen3_asr_tpu.tools.dump_intermediates", "-m", str(gguf),
                "-f", str(wav), "-o", str(goldens),
                "--platform", "cpu"]) == 0
    assert run(["qwen3_asr_tpu.cli", "-m", str(gguf), "-f", str(wav),
                "--max-tokens", "3", "--no-timing", "--platform", "cpu",
                "-o", str(goldens / "transcript.txt")]) == 0
    assert run(["qwen3_asr_tpu.tools.convert_hf_to_gguf",
                "-i", str(fa_dir), "-o", str(fa_gguf), "-t", "f32"]) == 0
    assert run(["qwen3_asr_tpu.tools.dump_intermediates", "-m", str(fa_gguf),
                "-f", str(wav), "-o", str(goldens), "--aligner",
                "--text", text, "--platform", "cpu"]) == 0
    assert run(["qwen3_asr_tpu.cli", "-m", str(fa_gguf), "-f", str(wav),
                "--align", "--text", text, "--no-timing",
                "--platform", "cpu", "-o", str(goldens / "words.json")]) == 0
    (goldens / "text.txt").write_text(text)

    out = subprocess.run(
        [sys.executable, "-m", "qwen3_asr_tpu.tools.validate_real_weights",
         "--hf-dir", str(hf_dir), "--fa-hf-dir", str(fa_dir),
         "--goldens", str(goldens),
         "--audio", str(wav), "--workdir", str(tmp_path / "work"),
         "--type", "f32", "--platform", "cpu", "--max-tokens", "3"],
        cwd="/root/repo", capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    verdict = json.loads(out.stdout.strip().splitlines()[-1])
    assert verdict["passed"] is True
    for gate in ("fa_convert", "fa_dump", "fa_audio_features.npy",
                 "fa_ts_logits.npy", "fa_align", "fa_words"):
        assert verdict["results"][gate] is True, gate
