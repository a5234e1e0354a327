"""GGUF reader/writer round trips, including Q8_0 quantization."""

import numpy as np
import pytest

from qwen3_asr_tpu.runtime.gguf import (
    GGML_TYPE_F16,
    GGML_TYPE_F32,
    GGML_TYPE_Q8_0,
    GGUFFile,
    GGUFWriter,
    dequantize_q8_0,
    quantize_q8_0,
)


def test_metadata_roundtrip(tmp_path):
    path = str(tmp_path / "m.gguf")
    w = GGUFWriter(path)
    w.add("general.architecture", "qwen3-asr")
    w.add_u32("qwen3-asr.block_count", 28)
    w.add_f32("qwen3-asr.rope.freq_base", 1e6)
    w.add("some.bool", True)
    w.add_str_array("tokenizer.ggml.tokens", ["a", "b", "<|im_end|>", "한글"])
    w.add_tensor("t", np.zeros((2, 3), np.float32))
    w.write()

    g = GGUFFile(path)
    assert g.metadata["general.architecture"] == "qwen3-asr"
    assert g.metadata["qwen3-asr.block_count"] == 28
    assert g.metadata["qwen3-asr.rope.freq_base"] == pytest.approx(1e6)
    assert g.metadata["some.bool"] is True
    assert g.metadata["tokenizer.ggml.tokens"] == ["a", "b", "<|im_end|>", "한글"]
    g.close()


def test_tensor_roundtrip_f32_f16(tmp_path, rng):
    path = str(tmp_path / "t.gguf")
    a = rng.standard_normal((5, 7)).astype(np.float32)
    b = rng.standard_normal((3, 4, 2)).astype(np.float32)
    w = GGUFWriter(path)
    w.add_tensor("a", a, GGML_TYPE_F32)
    w.add_tensor("b16", b, GGML_TYPE_F16)
    w.write()

    g = GGUFFile(path)
    # GGUF dims are reversed from numpy
    assert g.tensors["a"].shape == (7, 5)
    np.testing.assert_array_equal(g.get("a"), a)
    np.testing.assert_allclose(g.get("b16"), b, atol=2e-3)
    assert g.get("b16").shape == b.shape
    g.close()


def test_q8_0_roundtrip(rng):
    x = (rng.standard_normal(256) * 3).astype(np.float32)
    raw = np.frombuffer(quantize_q8_0(x), dtype=np.uint8)
    y = dequantize_q8_0(raw, 256)
    # Q8_0: max error = scale/2 + f16-rounding of the scale (~2^-11 * 127*d)
    # = d * (0.5 + 0.062) ~= amax/200 per block
    blocks = x.reshape(-1, 32)
    for bi in range(blocks.shape[0]):
        tol = np.abs(blocks[bi]).max() / 200 + 1e-8
        np.testing.assert_allclose(y[bi * 32 : (bi + 1) * 32], blocks[bi], atol=tol)


def test_q8_0_tensor_in_file(tmp_path, rng):
    path = str(tmp_path / "q.gguf")
    x = rng.standard_normal((4, 64)).astype(np.float32)
    w = GGUFWriter(path)
    w.add_tensor("q", x, GGML_TYPE_Q8_0)
    w.write()
    g = GGUFFile(path)
    assert g.tensors["q"].type_name == "q8_0"
    y = g.get("q")
    np.testing.assert_allclose(y, x, atol=np.abs(x).max() / 100)
    qs, scales = g.get_q8_0("q")
    assert qs.dtype == np.int8 and qs.shape == (256,)
    assert scales.dtype == np.float16 and scales.shape == (8,)
    g.close()


def test_alignment_of_tensor_offsets(tmp_path, rng):
    # odd-sized first tensor forces padding before the second
    path = str(tmp_path / "align.gguf")
    w = GGUFWriter(path)
    w.add_tensor("odd", rng.standard_normal((3,)).astype(np.float32))
    second = rng.standard_normal((8, 8)).astype(np.float32)
    w.add_tensor("second", second)
    w.write()
    g = GGUFFile(path)
    assert g.tensors["second"].offset % 32 == 0
    np.testing.assert_array_equal(g.get("second"), second)
    g.close()
