"""Independent torch oracle for the audio encoder and Qwen3 decoder.

Implements the model math the way the HF reference does (chunked padded
convs + cu_seqlens windows per tests/generate_reference.py:51-126; Qwen3
attention with QK-RMSNorm + NEOX RoPE per the HF modeling code the GGML
reference was validated against). Written against numpy parameter dicts in
the SAME layout as qwen3_asr_tpu.runtime.params ([in, out] matrices,
stacked layers) so tests can share one set of random weights.

Runs in float64 for a tight tolerance against the JAX float32 path.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def _t(a) -> torch.Tensor:
    return torch.from_numpy(np.asarray(a, dtype=np.float64))


def _layer_norm(x, w, b, eps):
    return F.layer_norm(x, (x.shape[-1],), weight=w, bias=b, eps=eps)


def _rms_norm(x, w, eps):
    y = x * torch.rsqrt((x * x).mean(-1, keepdim=True) + eps)
    return y * w


def chunk_output_len(n):
    for _ in range(3):
        n = (n - 1) // 2 + 1
    return n


def encoder_forward(params: dict, cfg, mel: np.ndarray) -> np.ndarray:
    """mel [n_mel, n_frames] -> [n_ctx, output_dim] float64 numpy."""
    p = {k: (_t(v) if v is not None and not isinstance(v, dict) else v)
         for k, v in params.items()}
    layers = {k: _t(v) for k, v in params["layers"].items()}

    n_mel, n_frames = mel.shape
    chunk = cfg.chunk_size
    n_chunks = -(-n_frames // chunk)
    pad = n_chunks * chunk - n_frames
    mel_p = np.pad(np.asarray(mel, dtype=np.float64), ((0, 0), (0, pad)))
    x = torch.from_numpy(
        mel_p.reshape(n_mel, n_chunks, chunk).transpose(1, 0, 2)[:, None]
    )  # [B, 1, n_mel, chunk]

    for i in (1, 2, 3):
        w, b = p[f"conv{i}_w"], p[f"conv{i}_b"]
        x = F.conv2d(x, w, b, stride=2, padding=1)
        x = F.gelu(x)
    B, C, H, W = x.shape
    x = x.permute(0, 3, 1, 2).reshape(B, W, C * H)
    x = x @ p["conv_out_w"]

    half = cfg.d_model // 2
    i = np.arange(half, dtype=np.float64)
    div = np.exp(-np.log(10000.0) * i / (half - 1))
    pos = np.arange(W, dtype=np.float64)[:, None]
    pe = np.concatenate([np.sin(pos * div), np.cos(pos * div)], axis=1)
    x = x + torch.from_numpy(pe)[None]

    rows = []
    for c in range(n_chunks):
        valid = (
            chunk_output_len(chunk)
            if c < n_chunks - 1
            else chunk_output_len(n_frames - (n_chunks - 1) * chunk)
        )
        rows.append(x[c, :valid])
    h = torch.cat(rows, dim=0)  # [n_ctx, d]
    n_ctx = h.shape[0]

    if cfg.n_window_infer is None:
        mask = None
    else:
        window = chunk_output_len(chunk) * (cfg.n_window_infer // chunk)
        seg = torch.arange(n_ctx) // window
        mask = seg[:, None] == seg[None, :]

    n_heads, head_dim = cfg.n_heads, cfg.head_dim
    for li in range(cfg.n_layers):
        lw = {k: v[li] for k, v in layers.items()}
        x = _layer_norm(h, lw["attn_norm_w"], lw["attn_norm_b"], cfg.layer_norm_eps)
        q = (x @ lw["wq"] + lw["bq"]).reshape(n_ctx, n_heads, head_dim)
        k = (x @ lw["wk"] + lw["bk"]).reshape(n_ctx, n_heads, head_dim)
        v = (x @ lw["wv"] + lw["bv"]).reshape(n_ctx, n_heads, head_dim)
        scores = torch.einsum("thd,shd->hts", q, k) / math.sqrt(head_dim)
        if mask is not None:
            scores = scores.masked_fill(~mask[None], float("-inf"))
        probs = scores.softmax(-1)
        attn = torch.einsum("hts,shd->thd", probs, v).reshape(n_ctx, cfg.d_model)
        h = h + attn @ lw["wo"] + lw["bo"]
        x = _layer_norm(h, lw["ffn_norm_w"], lw["ffn_norm_b"], cfg.layer_norm_eps)
        x = F.gelu(x @ lw["w_up"] + lw["b_up"])
        h = h + x @ lw["w_down"] + lw["b_down"]

    h = _layer_norm(h, p["ln_post_w"], p["ln_post_b"], cfg.layer_norm_eps)
    h = F.gelu(h @ p["proj1_w"] + p["proj1_b"])
    h = h @ p["proj2_w"] + p["proj2_b"]
    return h.numpy()


def _rope_neox(x: torch.Tensor, positions: np.ndarray, theta: float) -> torch.Tensor:
    """[T, H, D] half-split rotary (HF rotate_half convention)."""
    T, H, D = x.shape
    half = D // 2
    inv = 1.0 / (theta ** (np.arange(0, half) * 2.0 / D))
    ang = torch.from_numpy(np.asarray(positions, dtype=np.float64)[:, None] * inv[None])
    cos, sin = torch.cos(ang)[:, None, :], torch.sin(ang)[:, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1)


def decoder_forward(
    params: dict,
    cfg,
    tokens: np.ndarray,
    audio: np.ndarray | None = None,
    audio_offset: int = 0,
    positions: np.ndarray | None = None,
) -> np.ndarray:
    """Full causal forward -> final hidden states [T, hidden] float64."""
    layers = {k: _t(v) for k, v in params["layers"].items()}
    embd = _t(params["token_embd"])
    T = len(tokens)
    h = embd[torch.from_numpy(np.asarray(tokens, dtype=np.int64))]
    if audio is not None:
        a = _t(audio)
        h = h.clone()
        h[audio_offset : audio_offset + a.shape[0]] = a
    if positions is None:
        positions = np.arange(T)

    mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
    nh, nkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    group = nh // nkv

    for li in range(cfg.n_layers):
        lw = {k: v[li] for k, v in layers.items()}
        x = _rms_norm(h, lw["attn_norm"], cfg.rms_norm_eps)
        q = (x @ lw["wq"]).reshape(T, nh, hd)
        k = (x @ lw["wk"]).reshape(T, nkv, hd)
        v = (x @ lw["wv"]).reshape(T, nkv, hd)
        q = _rms_norm(q, lw["q_norm"], cfg.rms_norm_eps)
        k = _rms_norm(k, lw["k_norm"], cfg.rms_norm_eps)
        q = _rope_neox(q, positions, cfg.rope_theta)
        k = _rope_neox(k, positions, cfg.rope_theta)
        k = k.repeat_interleave(group, dim=1)
        v = v.repeat_interleave(group, dim=1)
        scores = torch.einsum("thd,shd->hts", q, k) / math.sqrt(hd)
        scores = scores.masked_fill(~mask[None], float("-inf"))
        attn = torch.einsum("hts,shd->thd", scores.softmax(-1), v)
        h = h + attn.reshape(T, nh * hd) @ lw["wo"]
        x = _rms_norm(h, lw["ffn_norm"], cfg.rms_norm_eps)
        h = h + (F.silu(x @ lw["w_gate"]) * (x @ lw["w_up"])) @ lw["w_down"]
    return h.numpy()


def lm_logits(params: dict, cfg, h_last: np.ndarray) -> np.ndarray:
    x = _rms_norm(_t(h_last), _t(params["output_norm"]), cfg.rms_norm_eps)
    return (x @ _t(params["token_embd"]).T).numpy()


def classify_logits(params: dict, cfg, h: np.ndarray) -> np.ndarray:
    x = _rms_norm(_t(h), _t(params["output_norm"]), cfg.rms_norm_eps)
    out = x @ _t(params["classify_w"])
    if params.get("classify_b") is not None:
        out = out + _t(params["classify_b"])
    return out.numpy()


def generate_greedy(params, cfg, prompt, audio, audio_offset, max_tokens):
    """Naive full-recompute greedy decode (oracle for the jitted loop)."""
    toks = list(prompt)
    out = []
    for _ in range(max_tokens):
        h = decoder_forward(params, cfg, np.asarray(toks), audio, audio_offset)
        logits = lm_logits(params, cfg, h[-1])
        nxt = int(np.argmax(logits))
        if nxt == cfg.eos_token_id:
            break
        out.append(nxt)
        toks.append(nxt)
    return out
