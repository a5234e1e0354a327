"""HF(safetensors) -> GGUF converter round-trip: synthesize a tiny HF
checkpoint from our init params, convert, load, and require exact (f32)
weight equality through the full converter -> GGUF writer -> GGUF loader
chain."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("safetensors")

from qwen3_asr_tpu.config import tiny_asr_config
from qwen3_asr_tpu.runtime.params import init_asr_params, load_asr_model
from qwen3_asr_tpu.tools.convert_hf_to_gguf import convert

from helpers import make_byte_vocab


def _hf_checkpoint(tmp_path, cfg, params):
    """Write a synthetic HF checkpoint dir in the converter's expected
    layout (Qwen3-ASR safetensors names; linear weights [out, in])."""
    from safetensors.numpy import save_file

    enc, dec = params["encoder"], params["decoder"]
    t = {}

    # audio tower
    for i in (1, 2, 3):
        t[f"thinker.audio_tower.conv2d{i}.weight"] = np.asarray(enc[f"conv{i}_w"])
        t[f"thinker.audio_tower.conv2d{i}.bias"] = np.asarray(enc[f"conv{i}_b"])
    t["thinker.audio_tower.conv_out.weight"] = np.asarray(enc["conv_out_w"]).T
    t["thinker.audio_tower.conv_out.bias"] = np.zeros(
        enc["conv_out_w"].shape[1], np.float32)
    t["thinker.audio_tower.ln_post.weight"] = np.asarray(enc["ln_post_w"])
    t["thinker.audio_tower.ln_post.bias"] = np.asarray(enc["ln_post_b"])
    t["thinker.audio_tower.proj1.weight"] = np.asarray(enc["proj1_w"]).T
    t["thinker.audio_tower.proj1.bias"] = np.asarray(enc["proj1_b"])
    t["thinker.audio_tower.proj2.weight"] = np.asarray(enc["proj2_w"]).T
    t["thinker.audio_tower.proj2.bias"] = np.asarray(enc["proj2_b"])
    lyr = enc["layers"]
    hf_enc = {
        "self_attn.q_proj": ("wq", "bq"), "self_attn.k_proj": ("wk", "bk"),
        "self_attn.v_proj": ("wv", "bv"), "self_attn.out_proj": ("wo", "bo"),
        "self_attn_layer_norm": ("attn_norm_w", "attn_norm_b"),
        "final_layer_norm": ("ffn_norm_w", "ffn_norm_b"),
        "fc1": ("w_up", "b_up"), "fc2": ("w_down", "b_down"),
    }
    for il in range(cfg.encoder.n_layers):
        for hf, (wk, bk) in hf_enc.items():
            w = np.asarray(lyr[wk][il])
            t[f"thinker.audio_tower.layers.{il}.{hf}.weight"] = (
                w.T if w.ndim == 2 else w)
            t[f"thinker.audio_tower.layers.{il}.{hf}.bias"] = (
                np.asarray(lyr[bk][il]))

    # text decoder
    t["thinker.model.embed_tokens.weight"] = np.asarray(dec["token_embd"])
    t["thinker.model.norm.weight"] = np.asarray(dec["output_norm"])
    t["thinker.lm_head.weight"] = np.asarray(dec["token_embd"])  # tied
    dl = dec["layers"]
    hf_dec = {
        "input_layernorm.weight": "attn_norm",
        "self_attn.q_proj.weight": "wq", "self_attn.k_proj.weight": "wk",
        "self_attn.v_proj.weight": "wv", "self_attn.o_proj.weight": "wo",
        "self_attn.q_norm.weight": "q_norm",
        "self_attn.k_norm.weight": "k_norm",
        "post_attention_layernorm.weight": "ffn_norm",
        "mlp.gate_proj.weight": "w_gate", "mlp.up_proj.weight": "w_up",
        "mlp.down_proj.weight": "w_down",
    }
    for il in range(cfg.decoder.n_layers):
        for hf, ours in hf_dec.items():
            w = np.asarray(dl[ours][il])
            t[f"thinker.model.layers.{il}.{hf}"] = w.T if w.ndim == 2 else w

    t = {k: np.ascontiguousarray(v) for k, v in t.items()}  # .T views:
    # safetensors requires C-contiguous buffers
    save_file(t, str(tmp_path / "model.safetensors"))

    e, d = cfg.encoder, cfg.decoder
    config = {
        "thinker_config": {
            "model_type": "qwen3_asr",
            "audio_config": {
                "encoder_layers": e.n_layers, "d_model": e.d_model,
                "encoder_attention_heads": e.n_heads,
                "encoder_ffn_dim": e.ffn_dim, "num_mel_bins": e.n_mel_bins,
                "downsample_hidden_size": e.conv_channels,
            },
            "text_config": {
                "num_hidden_layers": d.n_layers, "hidden_size": d.hidden_size,
                "intermediate_size": d.intermediate_size,
                "num_attention_heads": d.n_heads,
                "num_key_value_heads": d.n_kv_heads, "head_dim": d.head_dim,
                "rope_theta": d.rope_theta, "rms_norm_eps": d.rms_norm_eps,
                "vocab_size": d.vocab_size,
            },
            "audio_start_token_id": d.audio_start_token_id,
            "audio_end_token_id": d.audio_end_token_id,
            "audio_token_id": d.audio_pad_token_id,
        },
    }
    (tmp_path / "config.json").write_text(json.dumps(config))
    vocab = make_byte_vocab(cfg.decoder.vocab_size, {})
    (tmp_path / "vocab.json").write_text(
        json.dumps({tok: i for i, tok in enumerate(vocab)}))
    (tmp_path / "merges.txt").write_text("#version\n")


def test_convert_roundtrip_exact(tmp_path, rng):
    cfg = tiny_asr_config()
    params = jax.tree.map(np.asarray, init_asr_params(cfg, 29, jnp.float32))
    _hf_checkpoint(tmp_path, cfg, params)

    out = tmp_path / "m.gguf"
    convert(tmp_path, out, "f32")

    cfg2, loaded, vocab, merges = load_asr_model(str(out), jnp.float32)
    assert cfg2.decoder.n_layers == cfg.decoder.n_layers
    assert cfg2.encoder.d_model == cfg.encoder.d_model
    assert len(vocab) == cfg.decoder.vocab_size

    loaded = jax.tree.map(np.asarray, loaded)
    for side in ("encoder", "decoder"):
        ours, theirs = params[side], loaded[side]
        for key, val in ours.items():
            if key == "layers":
                for lk, lv in val.items():
                    np.testing.assert_allclose(
                        np.asarray(theirs["layers"][lk]), np.asarray(lv),
                        atol=0, err_msg=f"{side}.layers.{lk}")
            elif theirs.get(key) is not None:
                np.testing.assert_allclose(
                    np.asarray(theirs[key]), np.asarray(val), atol=0,
                    err_msg=f"{side}.{key}")


def test_convert_tokenizer_metadata(tmp_path, rng):
    """token_type + special-token/chat-template keys: the reference
    converter writes control-token typing (:462-512); files must carry the
    same on-disk tokenizer contract to load in the reference binary."""
    from qwen3_asr_tpu.runtime.gguf import GGUFFile

    cfg = tiny_asr_config()
    params = jax.tree.map(np.asarray, init_asr_params(cfg, 29, jnp.float32))
    _hf_checkpoint(tmp_path, cfg, params)

    # short vocab (forces [PADn]/UNUSED fill) with a control token
    n_short = cfg.decoder.vocab_size - 3
    vocab = make_byte_vocab(n_short, {0: "<|im_end|>", 1: "<|audio_pad|>"})
    (tmp_path / "vocab.json").write_text(
        json.dumps({tok: i for i, tok in enumerate(vocab)}))
    (tmp_path / "tokenizer_config.json").write_text(json.dumps({
        "eos_token": {"content": "<|im_end|>"},
        "pad_token": "<|audio_pad|>",
        "chat_template": "{{ messages }}",
    }))

    out = tmp_path / "m.gguf"
    convert(tmp_path, out, "f32")
    g = GGUFFile(str(out))
    md = g.metadata
    types = md["tokenizer.ggml.token_type"]
    tokens = md["tokenizer.ggml.tokens"]
    assert len(types) == len(tokens) == cfg.decoder.vocab_size
    assert types[0] == 3 and types[1] == 3          # CONTROL <|...|>
    assert types[2] == 1                            # NORMAL
    assert types[-1] == 5                           # UNUSED [PADn] fill
    assert tokens[-1] == f"[PAD{cfg.decoder.vocab_size - 1}]"
    assert md["tokenizer.ggml.eos_token_id"] == 0
    assert md["tokenizer.ggml.padding_token_id"] == 1
    assert md["tokenizer.chat_template"] == "{{ messages }}"


def test_convert_forced_aligner(tmp_path, rng):
    """FA variant: classify head + FA metadata keys survive the round trip
    and load as an aligner model."""
    from qwen3_asr_tpu.config import tiny_aligner_config
    from qwen3_asr_tpu.runtime.params import (
        init_aligner_params,
        load_aligner_model,
    )

    cfg = tiny_aligner_config()
    params = jax.tree.map(np.asarray,
                          init_aligner_params(cfg, 37, jnp.float32))
    _hf_checkpoint(tmp_path, cfg, params)

    # overwrite config.json with the FA variant + classify head tensors
    config = json.loads((tmp_path / "config.json").read_text())
    config["thinker_config"]["model_type"] = "qwen3_forced_aligner"
    config["thinker_config"]["classify_num"] = cfg.decoder.classify_num
    config["timestamp_token_id"] = cfg.timestamp_token_id
    (tmp_path / "config.json").write_text(json.dumps(config))

    from safetensors.numpy import load_file, save_file
    t = load_file(str(tmp_path / "model.safetensors"))
    t["thinker.classify_head.weight"] = np.ascontiguousarray(
        np.asarray(params["decoder"]["classify_w"]).T)
    t["thinker.classify_head.bias"] = np.asarray(
        params["decoder"]["classify_b"])
    save_file(t, str(tmp_path / "model.safetensors"))

    out = tmp_path / "fa.gguf"
    convert(tmp_path, out, "f32")

    cfg2, loaded, _, _ = load_aligner_model(str(out), jnp.float32)
    assert cfg2.decoder.classify_num == cfg.decoder.classify_num
    assert cfg2.timestamp_token_id == cfg.timestamp_token_id
    np.testing.assert_allclose(
        np.asarray(loaded["decoder"]["classify_w"]),
        np.asarray(params["decoder"]["classify_w"]), atol=0)
    np.testing.assert_allclose(
        np.asarray(loaded["decoder"]["classify_b"]),
        np.asarray(params["decoder"]["classify_b"]), atol=0)


def test_convert_q8_0_within_quant_error(tmp_path, rng):
    cfg = tiny_asr_config()
    params = jax.tree.map(np.asarray, init_asr_params(cfg, 31, jnp.float32))
    _hf_checkpoint(tmp_path, cfg, params)
    out = tmp_path / "m_q8.gguf"
    convert(tmp_path, out, "q8_0")

    from qwen3_asr_tpu.ops.q8_matmul import dequantize_q8_weights, is_quant_leaf

    _, loaded, _, _ = load_asr_model(str(out), jnp.float32)
    lw = loaded["decoder"]["layers"]["w_down"]
    assert is_quant_leaf(lw)
    back = np.asarray(dequantize_q8_weights(lw["q8:q"][0], lw["q8:s"][0]))
    ref = np.asarray(params["decoder"]["layers"]["w_down"][0])
    # Q8_0 error bound: half a scale step per element
    assert np.abs(back - ref).max() <= np.abs(ref).max() / 127.0 + 1e-7