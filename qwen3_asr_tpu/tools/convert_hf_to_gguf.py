#!/usr/bin/env python3
"""Convert HuggingFace Qwen3-ASR / Qwen3-ForcedAligner checkpoints to GGUF.

Same CLI and on-disk contract as the reference converter
(scripts/convert_hf_to_gguf.py): tensor-name map HF->GGML, f16/f32/q8_0
output (Q8_0 skips embeddings/norms/biases), `qwen3-asr.*` metadata keys,
tokenizer (vocab.json + merges.txt with [PADn] fill), FA extras — but built
on this repo's own GGUF writer instead of gguf-py, with no torch dependency
beyond reading safetensors.

Usage:
    python -m qwen3_asr_tpu.tools.convert_hf_to_gguf \
        --input /path/to/Qwen3-ASR-0.6B \
        --output models/qwen3-asr-0.6b-f16.gguf --type f16
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

import numpy as np

from qwen3_asr_tpu.runtime.gguf import (
    GGML_TYPE_F16,
    GGML_TYPE_F32,
    GGML_TYPE_Q8_0,
    GGUFWriter,
)

# direct name map (reference: convert_hf_to_gguf.py:50-79)
TENSOR_MAP = {
    "thinker.audio_tower.conv2d1.weight": "audio.encoder.conv1.weight",
    "thinker.audio_tower.conv2d1.bias": "audio.encoder.conv1.bias",
    "thinker.audio_tower.conv2d2.weight": "audio.encoder.conv2.weight",
    "thinker.audio_tower.conv2d2.bias": "audio.encoder.conv2.bias",
    "thinker.audio_tower.conv2d3.weight": "audio.encoder.conv3.weight",
    "thinker.audio_tower.conv2d3.bias": "audio.encoder.conv3.bias",
    "thinker.audio_tower.conv_out.weight": "audio.encoder.conv_out.weight",
    "thinker.audio_tower.conv_out.bias": "audio.encoder.conv_out.bias",
    "thinker.audio_tower.layer_norm.weight": "audio.encoder.ln.weight",
    "thinker.audio_tower.layer_norm.bias": "audio.encoder.ln.bias",
    "thinker.audio_tower.ln_post.weight": "audio.encoder.ln_post.weight",
    "thinker.audio_tower.ln_post.bias": "audio.encoder.ln_post.bias",
    "thinker.audio_tower.embed_positions.weight": "audio.encoder.pos_embd.weight",
    "thinker.audio_tower.proj1.weight": "audio.encoder.proj1.weight",
    "thinker.audio_tower.proj1.bias": "audio.encoder.proj1.bias",
    "thinker.audio_tower.proj2.weight": "audio.encoder.proj2.weight",
    "thinker.audio_tower.proj2.bias": "audio.encoder.proj2.bias",
    "thinker.model.embed_tokens.weight": "token_embd.weight",
    "thinker.model.norm.weight": "output_norm.weight",
    "thinker.lm_head.weight": "output.weight",
    "thinker.classify_head.weight": "classify_head.weight",
    "thinker.classify_head.bias": "classify_head.bias",
}

AUDIO_LAYER_PATTERNS = [
    (r"thinker\.audio_tower\.layers\.(\d+)\.self_attn\.q_proj\.(weight|bias)",
     "audio.encoder.blk.{}.attn_q.{}"),
    (r"thinker\.audio_tower\.layers\.(\d+)\.self_attn\.k_proj\.(weight|bias)",
     "audio.encoder.blk.{}.attn_k.{}"),
    (r"thinker\.audio_tower\.layers\.(\d+)\.self_attn\.v_proj\.(weight|bias)",
     "audio.encoder.blk.{}.attn_v.{}"),
    (r"thinker\.audio_tower\.layers\.(\d+)\.self_attn\.out_proj\.(weight|bias)",
     "audio.encoder.blk.{}.attn_out.{}"),
    (r"thinker\.audio_tower\.layers\.(\d+)\.self_attn_layer_norm\.(weight|bias)",
     "audio.encoder.blk.{}.attn_norm.{}"),
    (r"thinker\.audio_tower\.layers\.(\d+)\.final_layer_norm\.(weight|bias)",
     "audio.encoder.blk.{}.ffn_norm.{}"),
    (r"thinker\.audio_tower\.layers\.(\d+)\.fc1\.(weight|bias)",
     "audio.encoder.blk.{}.ffn_up.{}"),
    (r"thinker\.audio_tower\.layers\.(\d+)\.fc2\.(weight|bias)",
     "audio.encoder.blk.{}.ffn_down.{}"),
]

TEXT_LAYER_PATTERNS = [
    (r"thinker\.model\.layers\.(\d+)\.input_layernorm\.weight", "blk.{}.attn_norm.weight"),
    (r"thinker\.model\.layers\.(\d+)\.self_attn\.q_proj\.weight", "blk.{}.attn_q.weight"),
    (r"thinker\.model\.layers\.(\d+)\.self_attn\.k_proj\.weight", "blk.{}.attn_k.weight"),
    (r"thinker\.model\.layers\.(\d+)\.self_attn\.v_proj\.weight", "blk.{}.attn_v.weight"),
    (r"thinker\.model\.layers\.(\d+)\.self_attn\.o_proj\.weight", "blk.{}.attn_output.weight"),
    (r"thinker\.model\.layers\.(\d+)\.self_attn\.q_norm\.weight", "blk.{}.attn_q_norm.weight"),
    (r"thinker\.model\.layers\.(\d+)\.self_attn\.k_norm\.weight", "blk.{}.attn_k_norm.weight"),
    (r"thinker\.model\.layers\.(\d+)\.post_attention_layernorm\.weight", "blk.{}.ffn_norm.weight"),
    (r"thinker\.model\.layers\.(\d+)\.mlp\.gate_proj\.weight", "blk.{}.ffn_gate.weight"),
    (r"thinker\.model\.layers\.(\d+)\.mlp\.up_proj\.weight", "blk.{}.ffn_up.weight"),
    (r"thinker\.model\.layers\.(\d+)\.mlp\.down_proj\.weight", "blk.{}.ffn_down.weight"),
]


def map_tensor_name(hf_name: str) -> str | None:
    if hf_name in TENSOR_MAP:
        return TENSOR_MAP[hf_name]
    for pattern, template in AUDIO_LAYER_PATTERNS:
        m = re.match(pattern, hf_name)
        if m:
            return template.format(*m.groups())
    for pattern, template in TEXT_LAYER_PATTERNS:
        m = re.match(pattern, hf_name)
        if m:
            return template.format(m.group(1))
    return None


def should_quantize(name: str) -> bool:
    """Q8_0 skips embeddings/norms/biases (reference :231-252)."""
    if any(x in name for x in ("token_embd", "output.weight", "pos_embd")):
        return False
    if any(x in name for x in ("_norm", ".ln", "ln_post")):
        return False
    if ".bias" in name:
        return False
    return True


def iter_safetensors(input_dir: Path):
    from safetensors import safe_open

    files = sorted(input_dir.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"No safetensors files found in {input_dir}")
    for sf in files:
        with safe_open(str(sf), framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


# gguf token types (gguf-py TokenType values; reference converter :330-342)
TOKTYPE_NORMAL = 1
TOKTYPE_CONTROL = 3
TOKTYPE_UNUSED = 5


def load_tokenizer(input_dir: Path, vocab_size: int):
    """-> (tokens, toktypes, merges) with the reference's control-token
    typing: <|...|> tokens are CONTROL, [PADn] vocab fill is UNUSED
    (reference converter :313-353)."""
    with open(input_dir / "vocab.json", encoding="utf-8") as f:
        vocab_dict = json.load(f)
    tokens = [t for t, _ in sorted(vocab_dict.items(), key=lambda x: x[1])]
    toktypes = [
        TOKTYPE_CONTROL if t.startswith("<|") and t.endswith("|>")
        else TOKTYPE_NORMAL
        for t in tokens
    ]
    while len(tokens) < vocab_size:
        tokens.append(f"[PAD{len(tokens)}]")
        toktypes.append(TOKTYPE_UNUSED)
    merges = []
    merges_path = input_dir / "merges.txt"
    if merges_path.exists():
        with open(merges_path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line and not line.startswith("#"):
                    merges.append(line)
    return tokens, toktypes, merges


def _special_token_kv(input_dir: Path) -> dict:
    """EOS/PAD ids + chat template from tokenizer_config.json (reference
    converter :476-511)."""
    out: dict = {}
    cfg_path = input_dir / "tokenizer_config.json"
    if not cfg_path.exists():
        return out
    with open(cfg_path, encoding="utf-8") as f:
        tok_cfg = json.load(f)
    vocab = None

    def token_id(key):
        nonlocal vocab
        tok = tok_cfg.get(key)
        if isinstance(tok, dict):
            tok = tok.get("content")
        if not tok:
            return None
        if vocab is None:
            with open(input_dir / "vocab.json", encoding="utf-8") as f:
                vocab = json.load(f)
        return vocab.get(tok)

    eos = token_id("eos_token")
    if eos is not None:
        out["tokenizer.ggml.eos_token_id"] = eos
    pad = token_id("pad_token")
    if pad is not None:
        out["tokenizer.ggml.padding_token_id"] = pad
    if tok_cfg.get("chat_template"):
        out["tokenizer.chat_template"] = tok_cfg["chat_template"]
    return out


def convert(input_dir: Path, output_path: Path, output_type: str) -> None:
    with open(input_dir / "config.json", encoding="utf-8") as f:
        config = json.load(f)
    thinker = config.get("thinker_config", {})
    audio_cfg = thinker.get("audio_config", {})
    text_cfg = thinker.get("text_config", {})
    is_fa = thinker.get("model_type") == "qwen3_forced_aligner"
    vocab_size = text_cfg.get("vocab_size", 152064 if is_fa else 151936)

    w = GGUFWriter(str(output_path))
    w.add("general.architecture", "qwen3-asr")
    w.add("general.name",
          "Qwen3-ForcedAligner-0.6B" if is_fa else "Qwen3-ASR-0.6B")
    w.add_u32("qwen3-asr.block_count", text_cfg.get("num_hidden_layers", 28))
    w.add_u32("qwen3-asr.embedding_length", text_cfg.get("hidden_size", 1024))
    w.add_u32("qwen3-asr.feed_forward_length", text_cfg.get("intermediate_size", 3072))
    w.add_u32("qwen3-asr.attention.head_count", text_cfg.get("num_attention_heads", 16))
    w.add_u32("qwen3-asr.attention.head_count_kv", text_cfg.get("num_key_value_heads", 8))
    w.add_u32("qwen3-asr.attention.key_length", text_cfg.get("head_dim", 128))
    w.add_f32("qwen3-asr.rope.freq_base", float(text_cfg.get("rope_theta", 1e6)))
    w.add_f32("qwen3-asr.attention.layer_norm_rms_epsilon",
              float(text_cfg.get("rms_norm_eps", 1e-6)))
    w.add_u32("qwen3-asr.vocab_size", vocab_size)
    w.add_u32("qwen3-asr.audio.encoder.layer_count",
              audio_cfg.get("encoder_layers", audio_cfg.get("num_hidden_layers", 18)))
    w.add_u32("qwen3-asr.audio.encoder.embedding_length", audio_cfg.get("d_model", 896))
    w.add_u32("qwen3-asr.audio.encoder.attention.head_count",
              audio_cfg.get("encoder_attention_heads", 14))
    w.add_u32("qwen3-asr.audio.encoder.feed_forward_length",
              audio_cfg.get("encoder_ffn_dim", 3584))
    w.add_u32("qwen3-asr.audio.num_mel_bins", audio_cfg.get("num_mel_bins", 128))
    w.add_u32("qwen3-asr.audio.conv_channels",
              audio_cfg.get("downsample_hidden_size", 480))
    w.add_u32("qwen3-asr.audio.start_token_id",
              thinker.get("audio_start_token_id", 151669))
    w.add_u32("qwen3-asr.audio.end_token_id",
              thinker.get("audio_end_token_id", 151670))
    w.add_u32("qwen3-asr.audio.pad_token_id", thinker.get("audio_token_id", 151676))
    if is_fa:
        w.add_u32("qwen3-asr.classify_num", thinker.get("classify_num", 5000))
        w.add_u32("qwen3-asr.timestamp_token_id",
                  config.get("timestamp_token_id", 151705))
        w.add_u32("qwen3-asr.timestamp_segment_time", 80)

    tokens, toktypes, merges = load_tokenizer(input_dir, vocab_size)
    w.add("tokenizer.ggml.model", "gpt2")
    w.add("tokenizer.ggml.pre", "qwen2")
    w.add_str_array("tokenizer.ggml.tokens", tokens)
    w.add_i32_array("tokenizer.ggml.token_type", toktypes)
    if merges:
        w.add_str_array("tokenizer.ggml.merges", merges)
    for key, value in _special_token_kv(input_dir).items():
        w.add(key, value)

    count = skipped = 0
    for hf_name, data in iter_safetensors(input_dir):
        ggml_name = map_tensor_name(hf_name)
        if ggml_name is None:
            print(f"Skipping unmapped tensor: {hf_name}", file=sys.stderr)
            skipped += 1
            continue
        if data.dtype == np.uint16:  # bfloat16 raw: upcast via int shift
            data = (data.astype(np.uint32) << 16).view(np.float32)
        data = np.ascontiguousarray(data, dtype=np.float32)
        if data.ndim <= 1:
            ttype = GGML_TYPE_F32
        elif output_type == "f32":
            ttype = GGML_TYPE_F32
        elif output_type == "q8_0" and should_quantize(ggml_name) \
                and data.shape[-1] % 32 == 0:
            ttype = GGML_TYPE_Q8_0
        else:
            ttype = GGML_TYPE_F16
        w.add_tensor(ggml_name, data, ttype)
        count += 1

    w.write()
    print(f"Converted {count} tensors, skipped {skipped} -> {output_path}",
          file=sys.stderr)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--input", "-i", type=Path, required=True)
    p.add_argument("--output", "-o", type=Path, required=True)
    p.add_argument("--type", "-t", choices=["f16", "f32", "q8_0"], default="f16")
    args = p.parse_args(argv)
    args.output.parent.mkdir(parents=True, exist_ok=True)
    convert(args.input, args.output, args.type)


if __name__ == "__main__":
    main()
