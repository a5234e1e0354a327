"""Debug forward passes exposing named intermediates.

Mirror of the reference's layer-level debug surfaces used by its parity
tests: `TextDecoder::forward_debug` (text_decoder.cpp:686-764, tensor names
:748-749) and the encoder debug variants `encode_conv_only` /
`encode_no_chunk` (audio_encoder.cpp:854-913, :603-852). Consumed by
tools/dump_intermediates.py to produce npy files comparable against the
HF-derived goldens from the reference's tests/generate_decoder_reference.py.

Perf-irrelevant: plain (non-scan) layer loop, float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.config import AudioEncoderConfig, DecoderConfig
from qwen3_asr_tpu.models.decoder import rms_norm, rope_neox
from qwen3_asr_tpu.models.encoder import (
    _conv_frontend,
    _encoder_block,
    _layer_norm,
    sinusoidal_pe,
)
from qwen3_asr_tpu.ops.q8_matmul import matmul_any


def encode_conv_only(params: dict, cfg: AudioEncoderConfig, mel) -> np.ndarray:
    """Conv frontend output for the WHOLE unchunked mel (no positional
    embedding), matching AudioEncoder::encode_conv_only semantics."""
    mel = jnp.asarray(mel, jnp.float32)
    x = mel[None, None]                               # [1, 1, n_mel, T]
    feats = _conv_frontend(params, x)                 # [1, T_out, C*H]
    out = feats[0].astype(params["conv_out_w"].dtype) @ params["conv_out_w"]
    return np.asarray(out, dtype=np.float32)


def encode_no_chunk(params: dict, cfg: AudioEncoderConfig, mel) -> np.ndarray:
    """Full encoder over the WHOLE mel as one chunk — no 100-frame split, no
    per-chunk positional reset (AudioEncoder::encode_no_chunk,
    audio_encoder.cpp:603-852). For inputs <= one chunk this must equal the
    production `encode_audio` exactly; for longer inputs it isolates the
    effect of chunking in parity investigations."""
    mel = jnp.asarray(mel, jnp.float32)
    feats = _conv_frontend(params, mel[None, None])   # [1, T_out, C*H]
    dtype = params["conv_out_w"].dtype
    h = feats[0].astype(dtype) @ params["conv_out_w"]
    h = h + sinusoidal_pe(h.shape[0], cfg.d_model, dtype)

    n_layers = params["layers"]["wq"].shape[0]
    for il in range(n_layers):
        layer = jax.tree.map(lambda a: a[il], params["layers"])
        h = _encoder_block(cfg, h, layer, window=None)

    h = _layer_norm(h, params["ln_post_w"], params["ln_post_b"],
                    cfg.layer_norm_eps)
    if params.get("proj1_w") is not None:
        h = jax.nn.gelu(h @ params["proj1_w"] + params["proj1_b"],
                        approximate=False)
    if params.get("proj2_w") is not None:
        h = h @ params["proj2_w"] + params["proj2_b"]
    return np.asarray(h, dtype=np.float32)


def decoder_debug(
    dec_params: dict,
    cfg: DecoderConfig,
    tokens: np.ndarray,
    audio: np.ndarray | None = None,
    audio_offset: int = 0,
) -> dict[str, np.ndarray]:
    """Single causal forward with layer-0 intermediates + all-position
    logits. Keys follow the reference debug names (text_decoder.cpp:748-749)
    plus the golden-generator extras."""
    T = len(tokens)
    out: dict[str, np.ndarray] = {}

    h = jnp.take(dec_params["token_embd"], jnp.asarray(tokens, jnp.int32), axis=0)
    h = h.astype(jnp.float32)
    if audio is not None:
        h = jax.lax.dynamic_update_slice(
            h, jnp.asarray(audio, jnp.float32), (audio_offset, 0)
        )
    out["embd"] = np.asarray(h)

    positions = jnp.arange(T, dtype=jnp.int32)
    scale = 1.0 / float(np.sqrt(cfg.head_dim))
    mask = jnp.tril(jnp.ones((T, T), bool))

    n_layers = dec_params["layers"]["attn_norm"].shape[0]
    for il in range(n_layers):
        lp = jax.tree.map(lambda a: a[il], dec_params["layers"])
        x = rms_norm(h, lp["attn_norm"], cfg.rms_norm_eps)
        if il == 0:
            out["debug_norm0"] = np.asarray(x)

        q = matmul_any(x, lp["wq"]).reshape(T, cfg.n_heads, cfg.head_dim)
        k = matmul_any(x, lp["wk"]).reshape(T, cfg.n_kv_heads, cfg.head_dim)
        v = matmul_any(x, lp["wv"]).reshape(T, cfg.n_kv_heads, cfg.head_dim)
        if il == 0:
            out["debug_q0_raw"] = np.asarray(q)
            out["debug_k0_raw"] = np.asarray(k)
            out["debug_v0"] = np.asarray(v)

        q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
        if il == 0:
            out["debug_q0_normed"] = np.asarray(q)
            out["debug_k0_normed"] = np.asarray(k)

        q = rope_neox(q, positions, cfg.rope_theta)
        k = rope_neox(k, positions, cfg.rope_theta)
        if il == 0:
            out["debug_q0_rope"] = np.asarray(q)
            out["debug_k0_rope"] = np.asarray(k)

        group = cfg.n_heads // cfg.n_kv_heads
        k_rep = jnp.repeat(k, group, axis=1)
        v_rep = jnp.repeat(v, group, axis=1)
        scores = jnp.einsum("thd,shd->hts", q, k_rep,
                            preferred_element_type=jnp.float32) * scale
        if il == 0:
            out["debug_kq_scaled"] = np.asarray(scores)
        scores = jnp.where(mask[None], scores, -jnp.inf)
        if il == 0:
            out["debug_kq_masked"] = np.asarray(scores)
        probs = jax.nn.softmax(scores, axis=-1)
        if il == 0:
            out["debug_kq_softmax"] = np.asarray(probs)

        attn = jnp.einsum("hts,shd->thd", probs, v_rep,
                          preferred_element_type=jnp.float32)
        attn_out = matmul_any(attn.reshape(T, cfg.n_heads * cfg.head_dim),
                              lp["wo"])
        if il == 0:
            out["debug_attn0_out"] = np.asarray(attn_out)
        h = h + attn_out

        x = rms_norm(h, lp["ffn_norm"], cfg.rms_norm_eps)
        gate = jax.nn.silu(matmul_any(x, lp["w_gate"]))
        ffn = matmul_any(gate * matmul_any(x, lp["w_up"]), lp["w_down"])
        if il == 0:
            out["debug_ffn0_out"] = np.asarray(ffn)
        h = h + ffn

    x = rms_norm(h, dec_params["output_norm"], cfg.rms_norm_eps)
    out["result_norm"] = np.asarray(x)
    if cfg.classify_num is not None and "classify_w" in dec_params:
        logits = jnp.dot(x, dec_params["classify_w"],
                         preferred_element_type=jnp.float32)
        if dec_params.get("classify_b") is not None:
            logits = logits + dec_params["classify_b"].astype(jnp.float32)
    else:
        logits = jnp.dot(x, dec_params["token_embd"].T.astype(x.dtype),
                         preferred_element_type=jnp.float32)
    out["logits"] = np.asarray(logits)
    return out
