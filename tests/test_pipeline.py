"""End-to-end pipeline tests on a tiny synthetic GGUF model:
file -> loader -> mel -> encoder -> prompt -> jitted greedy decode -> BPE,
validated against the composed float64 torch oracle."""

import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.config import tiny_aligner_config, tiny_asr_config
from qwen3_asr_tpu.audio import log_mel_spectrogram_ref, write_wav
from qwen3_asr_tpu.pipeline.aligner import ForcedAligner
from qwen3_asr_tpu.pipeline.asr import Qwen3ASR, TranscribeParams
from qwen3_asr_tpu.runtime.params import (
    init_aligner_params,
    init_asr_params,
    load_asr_model,
)
from qwen3_asr_tpu.text.prompt import audio_start_pos, build_asr_prompt

from helpers import make_byte_vocab, write_tiny_gguf
from oracles import torch_ref


def np_tree(tree):
    return jax.tree.map(lambda a: np.asarray(a, dtype=np.float64), tree)


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    cfg = tiny_asr_config()
    params = init_asr_params(cfg, seed=3, dtype=jnp.float32)
    params_np = jax.tree.map(np.asarray, params)
    vocab = make_byte_vocab(
        cfg.decoder.vocab_size,
        {
            cfg.decoder.eos_token_id: "<|im_end|>",
            cfg.decoder.audio_start_token_id: "<|audio_start|>",
            cfg.decoder.audio_end_token_id: "<|audio_end|>",
            cfg.decoder.audio_pad_token_id: "<|audio_pad|>",
        },
    )
    path = str(tmp_path_factory.mktemp("model") / "tiny-asr.gguf")
    write_tiny_gguf(path, cfg, params_np, vocab=vocab, merges=[])
    return path, cfg, params_np


def test_loader_roundtrip(tiny_gguf):
    path, cfg, params_np = tiny_gguf
    loaded_cfg, loaded, vocab, merges = load_asr_model(path, dtype=jnp.float32)
    import dataclasses
    for f in dataclasses.fields(cfg.decoder):
        a = getattr(loaded_cfg.decoder, f.name)
        b = getattr(cfg.decoder, f.name)
        if isinstance(b, float):
            assert a == pytest.approx(b, rel=1e-6), f.name  # f32 round trip
        else:
            assert a == b, f.name
    assert loaded_cfg.encoder.n_layers == cfg.encoder.n_layers
    assert loaded_cfg.encoder.d_model == cfg.encoder.d_model
    assert len(vocab) == cfg.decoder.vocab_size

    flat_a = jax.tree_util.tree_leaves_with_path(params_np)
    flat_b = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(loaded)}
    for k, v in flat_a:
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_b[key], np.float32), v, atol=1e-6, rtol=0,
            err_msg=key,
        )


def make_audio(seconds=1.5):
    t = np.arange(int(seconds * 16000)) / 16000
    return (0.4 * np.sin(2 * np.pi * 523 * t)).astype(np.float32)


def test_transcribe_matches_oracle(tiny_gguf):
    path, cfg, params_np = tiny_gguf
    asr = Qwen3ASR(dtype=jnp.float32)
    assert asr.load_model(path)

    audio = make_audio()
    params = TranscribeParams(max_tokens=6, print_timing=False, prompt_bucket=32)
    result = asr.transcribe(audio, params)
    assert result.success, result.error_msg

    # compose the float64 oracle over the same mel
    mel = log_mel_spectrogram_ref(audio)
    feats = torch_ref.encoder_forward(params_np["encoder"], cfg.encoder,
                                      mel.astype(np.float64))
    prompt = build_asr_prompt(feats.shape[0], cfg.decoder)
    off = audio_start_pos(prompt, cfg.decoder)
    ref_tokens = torch_ref.generate_greedy(
        params_np["decoder"], cfg.decoder, prompt, feats, off, 6
    )
    assert result.tokens == ref_tokens


def test_transcribe_from_wav_file(tiny_gguf, tmp_path):
    path, cfg, _ = tiny_gguf
    asr = Qwen3ASR(dtype=jnp.float32)
    assert asr.load_model(path)
    wav = str(tmp_path / "a.wav")
    write_wav(wav, make_audio(1.0))
    r = asr.transcribe(wav, TranscribeParams(max_tokens=4, print_timing=False,
                                             prompt_bucket=32))
    assert r.success
    # byte-level vocab: every non-special token decodes to something
    assert isinstance(r.text, str)

    # wrong sample rate is rejected (reference: qwen3_asr.cpp:61-64)
    wav2 = str(tmp_path / "b.wav")
    write_wav(wav2, make_audio(0.5), sample_rate=8000)
    r2 = asr.transcribe(wav2)
    assert not r2.success and "16kHz" in r2.error_msg


def test_aligner_quantized_matches_dense(tmp_path):
    """int8pc forced aligner (VERDICT r3 #4): the NAR classify pass runs
    on per-output-channel int8 layer matmuls (pc_matmul — the same leaves
    the ASR prefill gates) with the classify head dense. Gate: word
    timestamps within one 80 ms class of the dense run on the synthetic
    model, and the int8 tree must NOT carry a (dead) quantized lm head."""
    cfg = tiny_aligner_config()
    params = init_aligner_params(cfg, seed=4, dtype=jnp.float32)
    params_np = jax.tree.map(np.asarray, params)
    vocab = make_byte_vocab(
        cfg.decoder.vocab_size,
        {
            cfg.timestamp_token_id: "<|ts|>",
            cfg.decoder.audio_start_token_id: "<|audio_start|>",
            cfg.decoder.audio_end_token_id: "<|audio_end|>",
            cfg.decoder.audio_pad_token_id: "<|audio_pad|>",
        },
    )
    path = str(tmp_path / "tiny-fa.gguf")
    write_tiny_gguf(path, cfg, params_np, aligner=True, vocab=vocab, merges=[])

    dense = ForcedAligner(dtype=jnp.float32)
    assert dense.load_model(path), dense.error_msg
    quant = ForcedAligner(dtype=jnp.float32, quantize="int8pc")
    assert quant.load_model(path), quant.error_msg

    # int8pc leaves present on the layer matmuls, no dead lm head copy
    layers = quant.params["decoder"]["layers"]
    assert isinstance(layers["wqkv"], dict) and "i8pc:q" in layers["wqkv"]
    assert "lm_head_pc" not in quant.params["decoder"]
    assert "lm_head_q8" not in quant.params["decoder"]

    audio = make_audio(1.2)
    text = "hello world test"
    rd = dense.align(audio, text, language="")
    rq = quant.align(audio, text, language="")
    assert rd.success and rq.success, (rd.error_msg, rq.error_msg)
    assert [w.word for w in rq.words] == [w.word for w in rd.words]
    for wd, wq in zip(rd.words, rq.words):
        # int8pc perturbs logits at ~0.2% relative; argmax class may move
        # at most one 80 ms segment on the synthetic gate
        assert abs(wq.start - wd.start) <= 0.08 + 1e-6, (wd, wq)
        assert abs(wq.end - wd.end) <= 0.08 + 1e-6, (wd, wq)

    # "auto" resolves to int8pc for dense GGUFs (CLI/serve default), and
    # "int4" maps onto int8pc (no decode loop to ride the int4 stream)
    auto = ForcedAligner(dtype=jnp.float32, quantize="auto")
    assert auto.load_model(path), auto.error_msg
    assert isinstance(auto.params["decoder"]["layers"]["wqkv"], dict)
    assert ForcedAligner(dtype=jnp.float32, quantize="int4").quantize == \
        "int8pc"


def test_aligner_end_to_end(tmp_path):
    cfg = tiny_aligner_config()
    params = init_aligner_params(cfg, seed=4, dtype=jnp.float32)
    params_np = jax.tree.map(np.asarray, params)
    vocab = make_byte_vocab(
        cfg.decoder.vocab_size,
        {
            cfg.timestamp_token_id: "<|ts|>",
            cfg.decoder.audio_start_token_id: "<|audio_start|>",
            cfg.decoder.audio_end_token_id: "<|audio_end|>",
            cfg.decoder.audio_pad_token_id: "<|audio_pad|>",
        },
    )
    path = str(tmp_path / "tiny-fa.gguf")
    write_tiny_gguf(path, cfg, params_np, aligner=True, vocab=vocab, merges=[])

    fa = ForcedAligner(dtype=jnp.float32)
    assert fa.load_model(path), fa.error_msg
    assert fa.cfg.decoder.classify_num == cfg.decoder.classify_num

    audio = make_audio(1.2)
    result = fa.align(audio, "hello world test", language="")
    assert result.success, result.error_msg
    assert [w.word for w in result.words] == ["hello", "world", "test"]
    dur = 1.2
    for w in result.words:
        assert 0.0 <= w.start <= dur + 1e-6
        assert 0.0 <= w.end <= dur + 1e-6

    # classify head on device must match the oracle end-to-end: recompute
    # timestamp classes from the oracle pipeline
    mel = log_mel_spectrogram_ref(audio)
    feats = torch_ref.encoder_forward(
        params_np["encoder"], cfg.encoder, mel.astype(np.float64)
    )
    from qwen3_asr_tpu.text import get_feat_extract_output_lengths
    from qwen3_asr_tpu.text.prompt import build_aligner_prompt

    n_pads = get_feat_extract_output_lengths(mel.shape[1])
    assert n_pads == feats.shape[0]  # formula must equal encoder output len

    text_tokens, words = fa.tokenize_with_timestamps("hello world test", "")
    prompt = build_aligner_prompt(text_tokens, n_pads, cfg.decoder)
    h = torch_ref.decoder_forward(
        params_np["decoder"], cfg.decoder, np.asarray(prompt, np.int32),
        feats, 1,
    )
    logits = torch_ref.classify_logits(params_np["decoder"], cfg.decoder, h)
    ts_pos = [i for i, t in enumerate(prompt) if t == cfg.timestamp_token_id]
    ref_classes = [int(np.argmax(logits[i])) for i in ts_pos]

    from qwen3_asr_tpu.text import classes_to_timestamps, fix_timestamp_classes, pair_words
    ref_ts = classes_to_timestamps(
        fix_timestamp_classes(ref_classes), cfg.timestamp_segment_time_ms
    )
    ref_words = pair_words(words, ref_ts, dur)
    got = [(w.word, w.start, w.end) for w in result.words]
    want = [(w["word"], w["start"], w["end"]) for w in ref_words]
    for (gw, gs, ge), (ww, ws, we) in zip(got, want):
        assert gw == ww
        # argmax over random logits can flip under f32 noise; allow one
        # 80 ms class of slack
        assert abs(gs - ws) <= 0.08 + 1e-6
        assert abs(ge - we) <= 0.08 + 1e-6


# ---------------------------------------------------------------------------
# weight residency (round-4 regression: a bare target-less jax.device_put
# does NOT move committed arrays off the CPU staging backend — every
# dispatch then re-ships ~0.5 GB of weights over the host link)
# ---------------------------------------------------------------------------

def test_ship_to_device_moves_staged_tree():
    import jax
    import jax.numpy as jnp

    from qwen3_asr_tpu.runtime.params import (
        assert_resident,
        host_staging,
        ship_to_device,
    )

    with host_staging():
        tree = {"w": jnp.ones((4, 4)), "b": np.zeros(3, np.float32)}
    shipped = ship_to_device(tree)
    target = jax.devices()[0]
    for leaf in jax.tree.leaves(shipped):
        assert target in leaf.devices()
    assert_resident(shipped)  # must not raise


def test_assert_resident_catches_misplaced_leaf():
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from qwen3_asr_tpu.runtime.params import assert_resident

    devs = jax.devices()
    if len(devs) < 2:
        _pytest.skip("needs >=2 devices (conftest forces 8 virtual CPUs)")
    tree = {"good": jax.device_put(jnp.ones(2), devs[0]),
            "bad": jax.device_put(jnp.ones(2), devs[1])}
    with _pytest.raises(RuntimeError, match="NOT resident"):
        assert_resident(tree, devs[0])


def test_load_random_params_are_device_resident():
    """The pipeline load paths must end with every leaf on the primary
    device (pipeline/asr.py load_model/load_random -> ship_to_device)."""
    import jax

    from qwen3_asr_tpu.runtime.params import assert_resident

    asr = Qwen3ASR(dtype=jnp.bfloat16)
    asr.load_random(tiny_asr_config())
    assert_resident(asr.params, jax.devices()[0])
