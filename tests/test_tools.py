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
