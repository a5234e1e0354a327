"""Greedy self-speculation (models/generate.py::generate_greedy_spec):
draft k tokens through the megakernel's int4 stream, verify the block in
one pass over the int8pc contract weights. The output contract is exact
equality with the XLA int8-KV greedy path REGARDLESS of draft quality —
drafts only decide how many verified tokens each round yields."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.config import tiny_asr_config
from qwen3_asr_tpu.models.generate import generate_greedy, generate_greedy_spec
from qwen3_asr_tpu.ops.megakernel import pack_megakernel_params
from qwen3_asr_tpu.runtime.params import (
    fuse_decoder_params,
    init_asr_params,
    quantize_decoder_params,
)

MAX = 7


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_asr_config()
    dcfg = cfg.decoder
    dec = init_asr_params(cfg, seed=3, dtype=jnp.bfloat16)["decoder"]
    dec = jax.tree.map(np.asarray, dec)
    dec = fuse_decoder_params(quantize_decoder_params(dec, "int8pc"))
    mega = pack_megakernel_params(dec, dcfg, int4=True)

    rng = np.random.default_rng(7)
    n_audio = 4
    audio = rng.standard_normal((n_audio, dcfg.hidden_size)).astype(np.float32)
    prompt = [5, 6] + [dcfg.audio_pad_token_id] * n_audio + [7]
    toks = np.zeros(16, np.int32)
    toks[: len(prompt)] = prompt
    args = (jnp.asarray(toks), jnp.int32(len(prompt)), jnp.asarray(audio),
            jnp.int32(n_audio), 2, MAX)
    out_b, nk_b = generate_greedy(dec, dcfg, *args, cache_dtype=jnp.int8)
    base = [int(t) for t in np.asarray(out_b)[: int(nk_b)]]
    return dcfg, dec, mega, args, base


@pytest.mark.parametrize("k", [1, 3, 8])
def test_spec_matches_xla_int8_greedy(setup, k):
    """Token-for-token equality with the XLA int8-KV greedy path for any
    draft length (k=1 is bitwise: a 1-row verify block IS the decode
    step's shapes)."""
    dcfg, dec, mega, args, base = setup
    dm = dict(dec)
    dm["mega"] = mega
    out, n, stats = generate_greedy_spec(dm, dcfg, *args, k=k,
                                         interpret=True)
    got = [int(t) for t in np.asarray(out)[: int(n)]]
    assert got == base, (k, stats)
    assert int(stats["accepted"]) >= int(stats["rounds"])  # >=1 per round


def test_spec_exact_under_corrupted_drafts(setup):
    """Sign-flip every int8 leaf of the draft pack: acceptance collapses
    to the forced 1-correction-per-round floor, but the emitted tokens
    must still equal the baseline exactly — the verify pass, not the
    draft, owns the output."""
    dcfg, dec, mega, args, base = setup
    bad = {}
    for kk, vv in mega.items():
        if getattr(vv, "dtype", None) == jnp.int8 and getattr(
                vv, "ndim", 0) >= 2:
            bad[kk] = (-np.asarray(vv)).astype(np.int8)
        else:
            bad[kk] = vv
    dm = dict(dec)
    dm["mega"] = bad
    out, n, stats = generate_greedy_spec(dm, dcfg, *args, k=4,
                                         interpret=True)
    got = [int(t) for t in np.asarray(out)[: int(n)]]
    assert got == base
    # every round accepted exactly the one corrected token
    assert int(stats["accepted"]) == int(stats["rounds"])


def test_spec_eos_immediately(setup):
    """EOS as the model's constant output: both paths keep zero tokens."""
    dcfg, dec, mega, args, base = setup
    eos_cfg = dataclasses.replace(dcfg, eos_token_id=base[0])
    dm = dict(dec)
    dm["mega"] = mega
    out_b, nk_b = generate_greedy(dec, eos_cfg, *args, cache_dtype=jnp.int8)
    out, n, _ = generate_greedy_spec(dm, eos_cfg, *args, k=4, interpret=True)
    assert int(nk_b) == int(n) == 0


def test_pipeline_spec_k_clean_error_off_tpu(tmp_path):
    """Pipeline surface: spec_k on a CPU backend (no Pallas) must fail
    with a clear message, not a kernel crash. Also covers the
    TranscribeParams/CLI plumbing of spec_k."""
    import sys

    sys.path.insert(0, str((__import__("pathlib").Path(__file__).parent)))
    from helpers import make_byte_vocab, write_tiny_gguf

    from qwen3_asr_tpu.config import tiny_asr_config
    from qwen3_asr_tpu.pipeline.asr import Qwen3ASR, TranscribeParams
    from qwen3_asr_tpu.runtime.params import init_asr_params

    cfg = tiny_asr_config()
    p = jax.tree.map(np.asarray,
                     init_asr_params(cfg, 3, jnp.float32))
    vocab = make_byte_vocab(cfg.decoder.vocab_size,
                            {cfg.decoder.eos_token_id: "<|im_end|>"})
    path = str(tmp_path / "m.gguf")
    write_tiny_gguf(path, cfg, p, vocab=vocab, merges=[])
    asr = Qwen3ASR(dtype=jnp.float32, quantize="int8pc")
    assert asr.load_model(path)
    audio = np.zeros(16000, np.float32)
    res = asr.transcribe(audio, TranscribeParams(
        max_tokens=4, spec_k=4, print_timing=False))
    assert not res.success
    assert "spec_k" in res.error_msg and "Pallas" in res.error_msg


def test_pipeline_spec_k_long_audio_demotes_to_plain(tmp_path, monkeypatch):
    """Past the megakernel's VMEM budget, spec_k must DEGRADE to the plain
    decode path (same int8pc greedy output) instead of failing the
    transcription (review r3: every other path auto-falls back)."""
    import sys

    sys.path.insert(0, str((__import__("pathlib").Path(__file__).parent)))
    from helpers import make_byte_vocab, write_tiny_gguf

    from qwen3_asr_tpu.config import tiny_asr_config
    from qwen3_asr_tpu.ops import support
    from qwen3_asr_tpu.ops import megakernel as MK
    from qwen3_asr_tpu.pipeline.asr import Qwen3ASR, TranscribeParams
    from qwen3_asr_tpu.runtime.params import init_asr_params

    cfg = tiny_asr_config()
    p = jax.tree.map(np.asarray, init_asr_params(cfg, 3, jnp.float32))
    vocab = make_byte_vocab(cfg.decoder.vocab_size,
                            {cfg.decoder.eos_token_id: "<|im_end|>"})
    path = str(tmp_path / "m.gguf")
    write_tiny_gguf(path, cfg, p, vocab=vocab, merges=[])
    asr = Qwen3ASR(dtype=jnp.float32, quantize="int8pc")
    assert asr.load_model(path)
    audio = np.zeros(16000, np.float32)

    plain = asr.transcribe(audio, TranscribeParams(
        max_tokens=4, print_timing=False))
    assert plain.success

    # pretend a Pallas TPU is present but the context never fits: the
    # spec pre-check demotes, generate_greedy's own guard keeps it on
    # the XLA step, and the output matches the plain run exactly
    monkeypatch.setattr(support, "has_pallas_tpu", lambda: True)
    monkeypatch.setattr(MK, "_VMEM_BUDGET", 1)
    res = asr.transcribe(audio, TranscribeParams(
        max_tokens=4, spec_k=4, print_timing=False))
    assert res.success
    assert res.tokens == plain.tokens
