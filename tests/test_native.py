"""Native C++ host library vs pure-Python implementations."""

import numpy as np
import pytest

from qwen3_asr_tpu.runtime import native
from qwen3_asr_tpu.runtime.gguf import dequantize_q8_0_py, quantize_q8_0
from qwen3_asr_tpu.text.bpe import BPETokenizer, _byte_to_unicode
from qwen3_asr_tpu.text.timestamps import fix_timestamp_classes_py

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_q8_dequant_matches_python(rng):
    x = (rng.standard_normal(32 * 100) * 2).astype(np.float32)
    raw = np.frombuffer(quantize_q8_0(x), dtype=np.uint8)
    py = dequantize_q8_0_py(raw, x.size)
    nat = native.q8_0_dequant(raw, x.size)
    np.testing.assert_allclose(nat, py, atol=1e-7, rtol=0)


def test_lis_matches_python(rng):
    for _ in range(50):
        n = int(rng.integers(0, 40))
        data = [int(x) for x in rng.integers(0, 100, size=n)]
        assert native.lis_repair(data) == fix_timestamp_classes_py(data)


def test_native_bpe_matches_python(rng):
    table = _byte_to_unicode()
    vocab = [table[b] for b in range(256)]
    # add some merged tokens + merges
    g = table[ord(" ")]
    vocab += ["he", "ll", "hell", "hello", "lo", g + "w", "안녕".encode().decode()]
    merges = ["h e", "l l", "he ll", "hell o", "l o", g + " w"]
    # map the Korean piece through the byte table
    from qwen3_asr_tpu.text.bpe import bytes_to_bpe_string
    vocab.append(bytes_to_bpe_string("안".encode()))
    vocab.append(bytes_to_bpe_string("녕".encode()))

    py = BPETokenizer(vocab, merges)
    nat = native.NativeBPE(vocab, merges)

    pieces = ["hello", " world", "hellohello", "abc xyz", "안녕", "", "h",
              "x" * 200]
    for piece in pieces:
        assert nat.encode_piece(piece) == py.encode_piece(piece), piece

    # fuzz: random byte strings
    for _ in range(30):
        raw = bytes(rng.integers(0, 256, size=int(rng.integers(1, 50))))
        text = raw.decode("latin-1")
        assert nat.encode_piece(text) == py.encode_piece(text)
