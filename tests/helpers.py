"""Test helpers: write a tiny synthetic ASR/FA model as a GGUF file.

Emits the same tensor names and GGUF metadata keys as the reference
converter (scripts/convert_hf_to_gguf.py) so the loader path is exercised
end-to-end against files with the real on-disk contract.
"""

from __future__ import annotations

import numpy as np

from qwen3_asr_tpu.runtime.gguf import (
    GGML_TYPE_F16,
    GGML_TYPE_F32,
    GGML_TYPE_Q8_0,
    GGUFWriter,
)


def make_byte_vocab(vocab_size: int, specials: dict[int, str]) -> list[str]:
    """256 byte-level tokens + [PADn] fillers + special tokens at given ids."""
    from qwen3_asr_tpu.text.bpe import _byte_to_unicode

    table = _byte_to_unicode()
    vocab = [table[b] for b in range(256)]
    while len(vocab) < vocab_size:
        vocab.append(f"[PAD{len(vocab)}]")
    for tid, name in specials.items():
        vocab[tid] = name
    return vocab


def write_tiny_gguf(
    path: str,
    cfg,
    params_np: dict,
    aligner: bool = False,
    vocab: list[str] | None = None,
    merges: list[str] | None = None,
    weight_type: int = GGML_TYPE_F32,
):
    """params_np: numpy pytree in OUR layout ([in,out] matrices, stacked
    layers); this function transposes back to GGUF layout, mimicking what
    the HF converter produces."""
    enc_cfg, dec_cfg = cfg.encoder, cfg.decoder
    w = GGUFWriter(path)

    w.add("general.architecture", "qwen3-asr")
    w.add_u32("qwen3-asr.block_count", dec_cfg.n_layers)
    w.add_u32("qwen3-asr.embedding_length", dec_cfg.hidden_size)
    w.add_u32("qwen3-asr.feed_forward_length", dec_cfg.intermediate_size)
    w.add_u32("qwen3-asr.attention.head_count", dec_cfg.n_heads)
    w.add_u32("qwen3-asr.attention.head_count_kv", dec_cfg.n_kv_heads)
    w.add_u32("qwen3-asr.attention.key_length", dec_cfg.head_dim)
    w.add_f32("qwen3-asr.rope.freq_base", dec_cfg.rope_theta)
    w.add_f32("qwen3-asr.attention.layer_norm_rms_epsilon", dec_cfg.rms_norm_eps)
    w.add_u32("qwen3-asr.vocab_size", dec_cfg.vocab_size)
    w.add_u32("qwen3-asr.audio.encoder.layer_count", enc_cfg.n_layers)
    w.add_u32("qwen3-asr.audio.encoder.embedding_length", enc_cfg.d_model)
    w.add_u32("qwen3-asr.audio.encoder.attention.head_count", enc_cfg.n_heads)
    w.add_u32("qwen3-asr.audio.encoder.feed_forward_length", enc_cfg.ffn_dim)
    w.add_u32("qwen3-asr.audio.num_mel_bins", enc_cfg.n_mel_bins)
    w.add_u32("qwen3-asr.audio.conv_channels", enc_cfg.conv_channels)
    w.add_u32("qwen3-asr.audio.start_token_id", dec_cfg.audio_start_token_id)
    w.add_u32("qwen3-asr.audio.end_token_id", dec_cfg.audio_end_token_id)
    w.add_u32("qwen3-asr.audio.pad_token_id", dec_cfg.audio_pad_token_id)
    if aligner:
        w.add_u32("qwen3-asr.classify_num", dec_cfg.classify_num)
        w.add_u32("qwen3-asr.timestamp_token_id", cfg.timestamp_token_id)
        w.add_u32("qwen3-asr.timestamp_segment_time", cfg.timestamp_segment_time_ms)

    w.add_u32("tokenizer.ggml.eos_token_id", dec_cfg.eos_token_id)
    w.add_u32("tokenizer.ggml.padding_token_id", dec_cfg.pad_token_id)
    w.add_u32("qwen3-asr.chat.im_start_token_id", dec_cfg.im_start_token_id)
    w.add_u32("qwen3-asr.chat.im_end_token_id", dec_cfg.im_end_token_id)
    w.add_u32("qwen3-asr.chat.system_token_id", dec_cfg.system_token_id)
    w.add_u32("qwen3-asr.chat.user_token_id", dec_cfg.user_token_id)
    w.add_u32("qwen3-asr.chat.assistant_token_id", dec_cfg.assistant_token_id)
    w.add_u32("qwen3-asr.chat.newline_token_id", dec_cfg.newline_token_id)
    if vocab is not None:
        w.add_str_array("tokenizer.ggml.tokens", vocab)
    if merges is not None:
        w.add_str_array("tokenizer.ggml.merges", merges)

    enc = params_np["encoder"]
    # conv weights: OIHW, stored as-is (converter keeps torch layout)
    for i in (1, 2, 3):
        w.add_tensor(f"audio.encoder.conv{i}.weight", enc[f"conv{i}_w"], GGML_TYPE_F32)
        w.add_tensor(f"audio.encoder.conv{i}.bias", enc[f"conv{i}_b"], GGML_TYPE_F32)
    # 2-D weights: GGUF numpy layout is (out, in) = our (in, out).T
    w.add_tensor("audio.encoder.conv_out.weight", enc["conv_out_w"].T, weight_type)
    L = enc["layers"]["wq"].shape[0]
    for i in range(L):
        p = f"audio.encoder.blk.{i}."
        lw = {k: v[i] for k, v in enc["layers"].items()}
        w.add_tensor(p + "attn_norm.weight", lw["attn_norm_w"], GGML_TYPE_F32)
        w.add_tensor(p + "attn_norm.bias", lw["attn_norm_b"], GGML_TYPE_F32)
        w.add_tensor(p + "attn_q.weight", lw["wq"].T, weight_type)
        w.add_tensor(p + "attn_q.bias", lw["bq"], GGML_TYPE_F32)
        w.add_tensor(p + "attn_k.weight", lw["wk"].T, weight_type)
        w.add_tensor(p + "attn_k.bias", lw["bk"], GGML_TYPE_F32)
        w.add_tensor(p + "attn_v.weight", lw["wv"].T, weight_type)
        w.add_tensor(p + "attn_v.bias", lw["bv"], GGML_TYPE_F32)
        w.add_tensor(p + "attn_out.weight", lw["wo"].T, weight_type)
        w.add_tensor(p + "attn_out.bias", lw["bo"], GGML_TYPE_F32)
        w.add_tensor(p + "ffn_norm.weight", lw["ffn_norm_w"], GGML_TYPE_F32)
        w.add_tensor(p + "ffn_norm.bias", lw["ffn_norm_b"], GGML_TYPE_F32)
        w.add_tensor(p + "ffn_up.weight", lw["w_up"].T, weight_type)
        w.add_tensor(p + "ffn_up.bias", lw["b_up"], GGML_TYPE_F32)
        w.add_tensor(p + "ffn_down.weight", lw["w_down"].T, weight_type)
        w.add_tensor(p + "ffn_down.bias", lw["b_down"], GGML_TYPE_F32)
    w.add_tensor("audio.encoder.ln_post.weight", enc["ln_post_w"], GGML_TYPE_F32)
    w.add_tensor("audio.encoder.ln_post.bias", enc["ln_post_b"], GGML_TYPE_F32)
    w.add_tensor("audio.encoder.proj1.weight", enc["proj1_w"].T, weight_type)
    w.add_tensor("audio.encoder.proj1.bias", enc["proj1_b"], GGML_TYPE_F32)
    w.add_tensor("audio.encoder.proj2.weight", enc["proj2_w"].T, weight_type)
    w.add_tensor("audio.encoder.proj2.bias", enc["proj2_b"], GGML_TYPE_F32)

    dec = params_np["decoder"]
    w.add_tensor("token_embd.weight", dec["token_embd"], weight_type)
    w.add_tensor("output_norm.weight", dec["output_norm"], GGML_TYPE_F32)
    L = dec["layers"]["wq"].shape[0]
    for i in range(L):
        p = f"blk.{i}."
        lw = {k: v[i] for k, v in dec["layers"].items()}
        w.add_tensor(p + "attn_norm.weight", lw["attn_norm"], GGML_TYPE_F32)
        w.add_tensor(p + "attn_q.weight", lw["wq"].T, weight_type)
        w.add_tensor(p + "attn_k.weight", lw["wk"].T, weight_type)
        w.add_tensor(p + "attn_v.weight", lw["wv"].T, weight_type)
        w.add_tensor(p + "attn_output.weight", lw["wo"].T, weight_type)
        w.add_tensor(p + "attn_q_norm.weight", lw["q_norm"], GGML_TYPE_F32)
        w.add_tensor(p + "attn_k_norm.weight", lw["k_norm"], GGML_TYPE_F32)
        w.add_tensor(p + "ffn_norm.weight", lw["ffn_norm"], GGML_TYPE_F32)
        w.add_tensor(p + "ffn_gate.weight", lw["w_gate"].T, weight_type)
        w.add_tensor(p + "ffn_up.weight", lw["w_up"].T, weight_type)
        w.add_tensor(p + "ffn_down.weight", lw["w_down"].T, weight_type)
    if aligner:
        w.add_tensor("classify_head.weight", dec["classify_w"].T, weight_type)
        if dec.get("classify_b") is not None:
            w.add_tensor("classify_head.bias", dec["classify_b"], GGML_TYPE_F32)

    w.write()
