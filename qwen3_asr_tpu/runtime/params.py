"""Model parameter pytrees: GGUF -> JAX arrays in TPU-friendly layouts.

Layout decisions (diverging from GGML on purpose):
- all 2-D weights live as [in, out] so forward passes are `y = x @ W`
  (GGUF stores ne=[in, out] which is numpy (out, in); we transpose once at
  load time),
- conv kernels stay OIHW (torch layout, as written by the converter —
  convert_hf_to_gguf.py:267-275) for lax.conv_general_dilated,
- per-layer weights are STACKED along a leading layer axis so the
  transformer stack runs as one `lax.scan` (one compiled layer body instead
  of n_layers unrolled copies),
- the token embedding stays [vocab, hidden] (rows = token vectors); the tied
  lm head is `h @ embd.T` (reference: text_decoder.cpp:264-266).

Tensor names follow the reference converter (scripts/convert_hf_to_gguf.py).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.config import (
    AlignerModelConfig,
    ASRModelConfig,
    AudioEncoderConfig,
    DecoderConfig,
    default_aligner_config,
)
from qwen3_asr_tpu.runtime.gguf import GGUFFile


def _np_f32(a) -> np.ndarray:
    """bf16 (jax or ml_dtypes) -> float32 numpy through an XLA cast.
    numpy-side conversions of bf16 buffers (`np.asarray(x, np.float32)`
    or `.astype`) can take ml_dtypes' per-element fallback (measured
    14-22 MB/s — minutes for the 0.6B decoder); the XLA cast is
    vectorized and multithreaded, and under host_staging() it runs on
    the CPU backend."""
    a = jnp.asarray(a)
    if a.dtype != jnp.float32:
        a = a.astype(jnp.float32)
    return np.asarray(a)


@contextlib.contextmanager
def host_staging():
    """Run load-time param transforms with the CPU backend as the default
    device. GGUF decode, quantization, fusing, and megakernel packing
    allocate many intermediate jnp arrays; with a NETWORK-ATTACHED
    accelerator as the default device every one of those is a tunnel
    round trip (measured on this rig: the 0.6B int8pc quantize spent
    ~4.5 min and the int4 clip-search pack ~6 min shipping intermediates
    that a CPU-staged run computes in seconds-to-a-minute). Stage on the
    host, then `jax.device_put` the finished tree ONCE.

    JAX's threefry PRNG is backend-invariant, so synthetic init under
    this context produces bit-identical weights. No-op when no separate
    CPU backend exists."""
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        yield
        return
    with jax.default_device(cpu):
        yield


def assert_resident(tree, device=None, what: str = "params") -> None:
    """Hard-fail unless every jax.Array leaf of `tree` lives on `device`
    (default: the primary accelerator). Guards against the class of bug
    where host-staged arrays silently stay on the CPU backend and every
    dispatch re-ships them over the host link (round-4 regression:
    ~0.5 GB of weights per call -> 3x realtime instead of 331x)."""
    if device is None:
        device = jax.devices()[0]
    bad = []
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        if isinstance(leaf, jax.Array):
            devs = leaf.devices()
            if device not in devs:
                bad.append((jax.tree_util.keystr(path), sorted(
                    str(d) for d in devs)))
    if bad:
        head = ", ".join(f"{p} on {d}" for p, d in bad[:4])
        raise RuntimeError(
            f"{what}: {len(bad)}/{len(leaves)} leaves NOT resident on "
            f"{device} ({head}{'...' if len(bad) > 4 else ''}). "
            "A target-less jax.device_put does not move committed arrays; "
            "use ship_to_device() after host_staging()."
        )


def ship_to_device(tree, device=None, what: str = "params"):
    """Move a (host-staged) param tree onto the accelerator — the ONLY
    correct way to end a host_staging() block.

    A bare ``jax.device_put(tree)`` (no target) does NOT move existing
    committed ``jax.Array`` leaves: arrays created under
    ``jax.default_device(cpu)`` stay on the CPU backend, and every later
    accelerator dispatch re-uploads them over the host link. Passing the
    explicit device moves them once; the residency assertion makes any
    future regression fail loudly at load time instead of shipping as a
    silent 100x slowdown."""
    if device is None:
        device = jax.devices()[0]
    tree = jax.device_put(tree, device)
    tree = jax.block_until_ready(tree)
    assert_resident(tree, device, what)
    return tree


# ---------------------------------------------------------------------------
# hparams from GGUF metadata (defaults per reference parse functions)
# ---------------------------------------------------------------------------

def _get(md: dict, key: str, default):
    v = md.get(key, default)
    return type(default)(v)


def decoder_config_from_gguf(g: GGUFFile, classify: bool) -> DecoderConfig:
    """Keys per text_decoder.cpp:116-147 / forced_aligner.cpp:158-172."""
    md = g.metadata
    vocab_default = 152064 if classify else 151936
    return DecoderConfig(
        vocab_size=_get(md, "qwen3-asr.vocab_size", vocab_default),
        hidden_size=_get(md, "qwen3-asr.embedding_length", 1024),
        n_layers=_get(md, "qwen3-asr.block_count", 28),
        n_heads=_get(md, "qwen3-asr.attention.head_count", 16),
        n_kv_heads=_get(md, "qwen3-asr.attention.head_count_kv", 8),
        intermediate_size=_get(md, "qwen3-asr.feed_forward_length", 3072),
        head_dim=_get(md, "qwen3-asr.attention.key_length", 128),
        rms_norm_eps=_get(md, "qwen3-asr.attention.layer_norm_rms_epsilon", 1e-6),
        rope_theta=_get(md, "qwen3-asr.rope.freq_base", 1000000.0),
        audio_start_token_id=_get(md, "qwen3-asr.audio.start_token_id", 151669),
        audio_end_token_id=_get(md, "qwen3-asr.audio.end_token_id", 151670),
        audio_pad_token_id=_get(md, "qwen3-asr.audio.pad_token_id", 151676),
        # the reference hardcodes these (text_decoder.cpp:140-141); we read
        # the converter's tokenizer keys when present, defaulting identically
        eos_token_id=_get(md, "tokenizer.ggml.eos_token_id", 151645),
        pad_token_id=_get(md, "tokenizer.ggml.padding_token_id", 151643),
        # chat-template ids: hardcoded in the reference (qwen3_asr.cpp:170-175),
        # stored under extension keys by our writer for non-Qwen vocabs
        im_start_token_id=_get(md, "qwen3-asr.chat.im_start_token_id", 151644),
        im_end_token_id=_get(md, "qwen3-asr.chat.im_end_token_id", 151645),
        system_token_id=_get(md, "qwen3-asr.chat.system_token_id", 8948),
        user_token_id=_get(md, "qwen3-asr.chat.user_token_id", 872),
        assistant_token_id=_get(md, "qwen3-asr.chat.assistant_token_id", 77091),
        newline_token_id=_get(md, "qwen3-asr.chat.newline_token_id", 198),
        classify_num=_get(md, "qwen3-asr.classify_num", 5000) if classify else None,
    )


def encoder_config_from_gguf(
    g: GGUFFile, output_dim: int, aligner: bool
) -> AudioEncoderConfig:
    """Keys per forced_aligner.cpp:151-156 (the ASR loader reads `audio.*`
    keys the converter never writes, gguf_loader.cpp:69-85, so ASR encoder
    hparams effectively come from defaults — we read the `qwen3-asr.audio.*`
    keys the converter DOES write, with the same defaults either way)."""
    md = g.metadata
    d = default_aligner_config().encoder if aligner else AudioEncoderConfig()
    return AudioEncoderConfig(
        n_layers=_get(md, "qwen3-asr.audio.encoder.layer_count", d.n_layers),
        d_model=_get(md, "qwen3-asr.audio.encoder.embedding_length", d.d_model),
        n_heads=_get(md, "qwen3-asr.audio.encoder.attention.head_count", d.n_heads),
        ffn_dim=_get(md, "qwen3-asr.audio.encoder.feed_forward_length", d.ffn_dim),
        conv_channels=_get(md, "qwen3-asr.audio.conv_channels", d.conv_channels),
        n_mel_bins=_get(md, "qwen3-asr.audio.num_mel_bins", d.n_mel_bins),
        output_dim=output_dim,
        n_window_infer=800 if aligner else None,
    )


def is_aligner_gguf(g: GGUFFile) -> bool:
    """FA GGUFs carry classify metadata and/or a classify head tensor."""
    if "qwen3-asr.classify_num" in g.metadata:
        return True
    return "classify_head.weight" in g.tensors


# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------

def _to_dev(a: np.ndarray, dtype) -> jax.Array:
    return jnp.asarray(np.asarray(a), dtype=dtype)


def _linear(g: GGUFFile, name: str, dtype) -> jax.Array:
    """2-D GGUF weight -> [in, out] device array."""
    return _to_dev(g.get(name).T, dtype)


def _maybe(g: GGUFFile, name: str, dtype, transpose=False):
    if name not in g.tensors:
        return None
    a = g.get(name)
    return _to_dev(a.T if transpose else a, dtype)


def load_encoder_params(g: GGUFFile, cfg: AudioEncoderConfig, dtype) -> dict:
    p = "audio.encoder."

    def stack_layers(suffix: str, transpose: bool) -> jax.Array:
        mats = []
        for i in range(cfg.n_layers):
            a = g.get(f"{p}blk.{i}.{suffix}")
            mats.append(a.T if transpose else a)
        return _to_dev(np.stack(mats), dtype)

    layers = {
        "attn_norm_w": stack_layers("attn_norm.weight", False),
        "attn_norm_b": stack_layers("attn_norm.bias", False),
        "wq": stack_layers("attn_q.weight", True),
        "bq": stack_layers("attn_q.bias", False),
        "wk": stack_layers("attn_k.weight", True),
        "bk": stack_layers("attn_k.bias", False),
        "wv": stack_layers("attn_v.weight", True),
        "bv": stack_layers("attn_v.bias", False),
        "wo": stack_layers("attn_out.weight", True),
        "bo": stack_layers("attn_out.bias", False),
        "ffn_norm_w": stack_layers("ffn_norm.weight", False),
        "ffn_norm_b": stack_layers("ffn_norm.bias", False),
        "w_up": stack_layers("ffn_up.weight", True),
        "b_up": stack_layers("ffn_up.bias", False),
        "w_down": stack_layers("ffn_down.weight", True),
        "b_down": stack_layers("ffn_down.bias", False),
    }
    return {
        # convs kept f32: tiny, and the front-end is precision-sensitive
        "conv1_w": _to_dev(g.get(p + "conv1.weight"), jnp.float32),
        "conv1_b": _to_dev(g.get(p + "conv1.bias"), jnp.float32),
        "conv2_w": _to_dev(g.get(p + "conv2.weight"), jnp.float32),
        "conv2_b": _to_dev(g.get(p + "conv2.bias"), jnp.float32),
        "conv3_w": _to_dev(g.get(p + "conv3.weight"), jnp.float32),
        "conv3_b": _to_dev(g.get(p + "conv3.bias"), jnp.float32),
        "conv_out_w": _linear(g, p + "conv_out.weight", dtype),
        "layers": layers,
        "ln_post_w": _maybe(g, p + "ln_post.weight", dtype),
        "ln_post_b": _maybe(g, p + "ln_post.bias", dtype),
        "proj1_w": _maybe(g, p + "proj1.weight", dtype, transpose=True),
        "proj1_b": _maybe(g, p + "proj1.bias", dtype),
        "proj2_w": _maybe(g, p + "proj2.weight", dtype, transpose=True),
        "proj2_b": _maybe(g, p + "proj2.bias", dtype),
    }


def load_decoder_params(
    g: GGUFFile, cfg: DecoderConfig, dtype, native_q8: bool = True
) -> dict:
    from qwen3_asr_tpu.runtime.gguf import GGML_TYPE_Q8_0

    def stack_layers(suffix: str, transpose: bool) -> jax.Array:
        mats = []
        for i in range(cfg.n_layers):
            a = g.get(f"blk.{i}.{suffix}")
            mats.append(a.T if transpose else a)
        return _to_dev(np.stack(mats), dtype)

    def stack_matmul_weight(suffix: str):
        """Per-layer matmul weight: Q8_0 tensors load DIRECTLY as stacked
        int8 + scale leaves for the Pallas dequant matmul — GGML's exact
        blocks, zero requantization error. GGUF Q8_0 blocks run along
        ne[0] (the `in` dim), i.e. numpy rows of the (out, in) view, which
        transposes to exactly the kernel's [in, out] / [in//32, out] layout.
        """
        names = [f"blk.{i}.{suffix}" for i in range(cfg.n_layers)]
        if native_q8 and all(
            g.tensors[n].ggml_type == GGML_TYPE_Q8_0 for n in names
        ):
            qs, ss = [], []
            for n in names:
                q_flat, s_flat = g.get_q8_0(n)
                out_dim, in_dim = tuple(reversed(g.tensors[n].shape))[:2]
                qs.append(q_flat.reshape(out_dim, in_dim).T)
                ss.append(s_flat.reshape(out_dim, in_dim // 32).T)
            return {
                "q8:q": jnp.asarray(np.stack(qs)),
                "q8:s": jnp.asarray(np.stack(ss).astype(np.float32)),
            }
        return stack_layers(suffix, True)

    layers = {
        "attn_norm": stack_layers("attn_norm.weight", False),
        "wq": stack_matmul_weight("attn_q.weight"),
        "wk": stack_matmul_weight("attn_k.weight"),
        "wv": stack_matmul_weight("attn_v.weight"),
        "wo": stack_matmul_weight("attn_output.weight"),
        "q_norm": stack_layers("attn_q_norm.weight", False),
        "k_norm": stack_layers("attn_k_norm.weight", False),
        "ffn_norm": stack_layers("ffn_norm.weight", False),
        "w_gate": stack_matmul_weight("ffn_gate.weight"),
        "w_up": stack_matmul_weight("ffn_up.weight"),
        "w_down": stack_matmul_weight("ffn_down.weight"),
    }
    out = {
        "token_embd": _to_dev(g.get("token_embd.weight"), dtype),  # [vocab, h]
        "output_norm": _to_dev(g.get("output_norm.weight"), dtype),
        "layers": layers,
    }
    if cfg.classify_num is not None:
        # the converter writes `classify_head.weight`; the reference loader
        # pattern-matches `output.weight` instead (forced_aligner.cpp:274) —
        # accept both, preferring the explicit name.
        if "classify_head.weight" in g.tensors:
            out["classify_w"] = _linear(g, "classify_head.weight", dtype)
            out["classify_b"] = _maybe(g, "classify_head.bias", dtype)
        else:
            out["classify_w"] = _linear(g, "output.weight", dtype)
            out["classify_b"] = None
    return out


def load_asr_model(path: str, dtype=jnp.bfloat16):
    """-> (ASRModelConfig, {'encoder':..., 'decoder':...}, vocab, merges)."""
    g = GGUFFile(path)
    dec_cfg = decoder_config_from_gguf(g, classify=False)
    enc_cfg = encoder_config_from_gguf(g, output_dim=dec_cfg.hidden_size, aligner=False)
    cfg = ASRModelConfig(encoder=enc_cfg, decoder=dec_cfg)
    params = {
        "encoder": load_encoder_params(g, enc_cfg, dtype),
        "decoder": load_decoder_params(g, dec_cfg, dtype),
    }
    vocab = g.metadata.get("tokenizer.ggml.tokens", [])
    merges = g.metadata.get("tokenizer.ggml.merges", [])
    g.close()
    return cfg, params, vocab, merges


def load_aligner_model(path: str, dtype=jnp.bfloat16):
    g = GGUFFile(path)
    dec_cfg = decoder_config_from_gguf(g, classify=True)
    enc_cfg = encoder_config_from_gguf(g, output_dim=dec_cfg.hidden_size, aligner=True)
    cfg = AlignerModelConfig(
        encoder=enc_cfg,
        decoder=dec_cfg,
        timestamp_token_id=_get(g.metadata, "qwen3-asr.timestamp_token_id", 151705),
        timestamp_segment_time_ms=_get(g.metadata, "qwen3-asr.timestamp_segment_time", 80),
    )
    params = {
        "encoder": load_encoder_params(g, enc_cfg, dtype),
        "decoder": load_decoder_params(g, dec_cfg, dtype),
    }
    vocab = g.metadata.get("tokenizer.ggml.tokens", [])
    merges = g.metadata.get("tokenizer.ggml.merges", [])
    g.close()
    return cfg, params, vocab, merges


# ---------------------------------------------------------------------------
# weight quantization (Q8_0-style int8 + per-32-block scales, on device)
# ---------------------------------------------------------------------------

_DEC_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_decoder_params(dec_params: dict, mode: str = "q8_0",
                            lm_head: bool = True) -> dict:
    """Quantize the decoder's per-layer matmul weights to int8 leaves.
    Embedding/norms stay dense — same policy as the reference converter's
    Q8_0 mode (convert_hf_to_gguf.cpp:231-252).

    mode="q8_0": GGUF Q8_0 semantics (per-32-input-block scales), executed
    by the Pallas dequant kernels (ops/q8_matmul.py). mode="int8pc":
    per-output-channel scales + dynamic int8 activations, executed as
    native int8 MXU dots by XLA (pc_matmul) — keeps XLA's cross-op weight
    prefetching at half the HBM bytes.

    Stacked [L, in, out] weights quantize per layer and restack. The tied
    lm head additionally gets an int8 copy — it is read in full every
    decode step while the embedding gather stays on the dense table.
    lm_head=False skips that copy: the forced aligner's decoder ends in
    the (small, dense) classify head, so an int8 lm head would be ~150 MB
    of dead HBM (forced_aligner.cpp:1073-1076 replaces lm_head there)."""
    from qwen3_asr_tpu.ops.q8_matmul import (
        quantize_pc_weights,
        quantize_q8_weights,
    )

    assert mode in ("q8_0", "int8pc"), mode
    per_layer = quantize_q8_weights if mode == "q8_0" else quantize_pc_weights
    qk, sk = (("q8:q", "q8:s") if mode == "q8_0" else ("i8pc:q", "i8pc:s"))

    out = dict(dec_params)
    layers = dict(dec_params["layers"])
    for key in _DEC_QUANT_KEYS:
        if isinstance(layers[key], dict):
            continue  # already quantized (native Q8_0 GGUF load)
        if mode == "int8pc":
            # vectorized XLA path (same math as quantize_pc_weights,
            # whole [L, in, out] stack in one multithreaded pass — the
            # per-layer numpy loop measured ~40 s for the 0.6B decoder)
            layers[key] = _quantize_pc_stack(layers[key])
            continue
        w = _np_f32(layers[key])                        # [L, in, out]
        qs, ss = [], []
        for l in range(w.shape[0]):
            q, s = per_layer(w[l])
            qs.append(q)
            ss.append(s)
        layers[key] = {qk: jnp.asarray(np.stack(qs)),
                       sk: jnp.asarray(np.stack(ss))}
    out["layers"] = layers
    if not lm_head:
        return out
    if mode == "q8_0" and "lm_head_q8" not in out:
        from qwen3_asr_tpu.ops.q8_matmul import quant_leaf

        head = _np_f32(dec_params["token_embd"]).T      # [hidden, vocab]
        out["lm_head_q8"] = quant_leaf(
            head,
            pad_out_to=4096,  # the wide-output kernel tile (q8_matmul._tile_for)
        )
    elif mode == "int8pc" and "lm_head_pc" not in out:
        out["lm_head_pc"] = _quantize_pc_stack(
            jnp.asarray(dec_params["token_embd"]).astype(jnp.float32).T)
    return out


@jax.jit
def _quantize_pc_stack_jit(w):
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2)                 # [..., out]
    s = amax / 127.0
    inv = jnp.where(s > 0, 1.0 / jnp.where(s == 0, 1.0, s), 0.0)
    q = jnp.clip(jnp.round(wf * inv[..., None, :]), -127, 127)
    return q.astype(jnp.int8), s


def _quantize_pc_stack(w) -> dict:
    """Per-output-channel int8 leaf from a dense [..., in, out] weight —
    q8_matmul.quantize_pc_weights' math (absmax/127 scale per column,
    round-half-even, clip) executed as ONE jitted XLA pass over the whole
    stack instead of a per-layer numpy loop. Runs on the host backend
    under host_staging()."""
    q, s = _quantize_pc_stack_jit(jnp.asarray(w))
    return {"i8pc:q": q, "i8pc:s": s}


def fuse_decoder_params(dec_params: dict) -> dict:
    """Fuse per-layer QKV and gate/up projections into single matmul
    weights (`wqkv`, `w_gate_up`), replacing the separate leaves.

    Bit-identical outputs (the concatenated matmul computes exactly the same
    columns; Q8 block scales run along the shared `in` dim, so int8 leaves
    concatenate losslessly too). The win is decode-step dispatch: 3 GEMVs ->
    1 for attention projections, 2 -> 1 for the SwiGLU input — fewer, larger
    HBM streams per token. `decoder_forward` accepts either layout.

    Note: the tp sharding rules in parallel/mesh.py key on the UNFUSED
    names (a fused out-dim shard would split Q from K/V mid-matrix), so the
    multi-chip path keeps separate leaves; fusion is the single-chip layout.
    """
    layers = dict(dec_params["layers"])

    def _cat(keys):
        vals = [layers[k] for k in keys]
        kinds = [isinstance(v, dict) for v in vals]
        if all(kinds):
            # quant leaves: q8 block scales run along the shared `in` dim and
            # pc scales are per output column — both concat losslessly
            leaf_keys = vals[0].keys()
            if any(v.keys() != leaf_keys for v in vals):
                return None
            return {k: jnp.concatenate([v[k] for v in vals], axis=-1)
                    for k in leaf_keys}
        if any(kinds):
            return None  # mixed quantized/dense: leave unfused
        return jnp.concatenate(vals, axis=-1)

    qkv = _cat(("wq", "wk", "wv"))
    if qkv is not None:
        layers["wqkv"] = qkv
        del layers["wq"], layers["wk"], layers["wv"]
    gate_up = _cat(("w_gate", "w_up"))
    if gate_up is not None:
        layers["w_gate_up"] = gate_up
        del layers["w_gate"], layers["w_up"]
    out = dict(dec_params)
    out["layers"] = layers
    return out


def unfuse_decoder_params(dec_params: dict, cfg) -> dict:
    """Inverse of `fuse_decoder_params`: split `wqkv`/`w_gate_up` back into
    separate leaves (exact inverse — fusion is a pure concat along the out
    axis, for dense and quantized dicts alike).

    Used by the tp sharding path (parallel/mesh.py): a tensor-parallel
    shard of the fused out dim would cut Q from K/V mid-matrix, so tp
    shards the unfused layout."""
    layers = dict(dec_params["layers"])

    def _split(leaf, sizes):
        bounds = np.cumsum(sizes)[:-1].tolist()
        if isinstance(leaf, dict):
            # quantized: every subleaf's LAST axis is the out dim
            # (i8pc:q [L,in,out], i8pc:s [L,out], q8:s [L,in/32,out])
            parts = [
                jnp.split(v, bounds, axis=-1) for v in leaf.values()
            ]
            return [dict(zip(leaf.keys(), p)) for p in zip(*parts)]
        return jnp.split(leaf, bounds, axis=-1)

    if "wqkv" in layers:
        qd = cfg.n_heads * cfg.head_dim
        kvd = cfg.n_kv_heads * cfg.head_dim
        layers["wq"], layers["wk"], layers["wv"] = _split(
            layers.pop("wqkv"), (qd, kvd, kvd))
    if "w_gate_up" in layers:
        i = cfg.intermediate_size
        layers["w_gate"], layers["w_up"] = _split(
            layers.pop("w_gate_up"), (i, i))
    out = dict(dec_params)
    out["layers"] = layers
    return out


# ---------------------------------------------------------------------------
# random init (tests / benchmarks without model files)
# ---------------------------------------------------------------------------

def init_encoder_params(cfg: AudioEncoderConfig, key, dtype) -> dict:
    ks = jax.random.split(key, 8)
    d, f, c = cfg.d_model, cfg.ffn_dim, cfg.conv_channels
    L = cfg.n_layers
    s = lambda *shape: 0.02

    def nrm(k, *shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    layers = {
        "attn_norm_w": jnp.ones((L, d), dtype),
        "attn_norm_b": jnp.zeros((L, d), dtype),
        "wq": nrm(ks[0], L, d, d),
        "bq": jnp.zeros((L, d), dtype),
        "wk": nrm(ks[1], L, d, d),
        "bk": jnp.zeros((L, d), dtype),
        "wv": nrm(ks[2], L, d, d),
        "bv": jnp.zeros((L, d), dtype),
        "wo": nrm(ks[3], L, d, d),
        "bo": jnp.zeros((L, d), dtype),
        "ffn_norm_w": jnp.ones((L, d), dtype),
        "ffn_norm_b": jnp.zeros((L, d), dtype),
        "w_up": nrm(ks[4], L, d, f),
        "b_up": jnp.zeros((L, f), dtype),
        "w_down": nrm(ks[5], L, f, d),
        "b_down": jnp.zeros((L, d), dtype),
    }
    k2 = jax.random.split(ks[6], 8)
    return {
        "conv1_w": jax.random.normal(k2[0], (c, 1, 3, 3), jnp.float32) * 0.1,
        "conv1_b": jnp.zeros((c,), jnp.float32),
        "conv2_w": jax.random.normal(k2[1], (c, c, 3, 3), jnp.float32) * 0.02,
        "conv2_b": jnp.zeros((c,), jnp.float32),
        "conv3_w": jax.random.normal(k2[2], (c, c, 3, 3), jnp.float32) * 0.02,
        "conv3_b": jnp.zeros((c,), jnp.float32),
        "conv_out_w": nrm(k2[3], cfg.conv_out_in_dim, d),
        "layers": layers,
        "ln_post_w": jnp.ones((d,), dtype),
        "ln_post_b": jnp.zeros((d,), dtype),
        "proj1_w": nrm(k2[4], d, d),
        "proj1_b": jnp.zeros((d,), dtype),
        "proj2_w": nrm(k2[5], d, cfg.output_dim),
        "proj2_b": jnp.zeros((cfg.output_dim,), dtype),
    }


def init_decoder_params(cfg: DecoderConfig, key, dtype) -> dict:
    ks = jax.random.split(key, 10)
    h, L = cfg.hidden_size, cfg.n_layers
    qd = cfg.n_heads * cfg.head_dim
    kvd = cfg.n_kv_heads * cfg.head_dim
    inter = cfg.intermediate_size

    def nrm(k, *shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    layers = {
        "attn_norm": jnp.ones((L, h), dtype),
        "wq": nrm(ks[0], L, h, qd),
        "wk": nrm(ks[1], L, h, kvd),
        "wv": nrm(ks[2], L, h, kvd),
        "wo": nrm(ks[3], L, qd, h),
        "q_norm": jnp.ones((L, cfg.head_dim), dtype),
        "k_norm": jnp.ones((L, cfg.head_dim), dtype),
        "ffn_norm": jnp.ones((L, h), dtype),
        "w_gate": nrm(ks[4], L, h, inter),
        "w_up": nrm(ks[5], L, h, inter),
        "w_down": nrm(ks[6], L, inter, h),
    }
    out = {
        "token_embd": nrm(ks[7], cfg.vocab_size, h),
        "output_norm": jnp.ones((h,), dtype),
        "layers": layers,
    }
    if cfg.classify_num is not None:
        out["classify_w"] = nrm(ks[8], h, cfg.classify_num)
        out["classify_b"] = jnp.zeros((cfg.classify_num,), dtype)
    return out


def init_asr_params(cfg: ASRModelConfig, seed: int = 0, dtype=jnp.bfloat16) -> dict:
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return {
        "encoder": init_encoder_params(cfg.encoder, k1, dtype),
        "decoder": init_decoder_params(cfg.decoder, k2, dtype),
    }


def init_aligner_params(
    cfg: AlignerModelConfig, seed: int = 0, dtype=jnp.bfloat16
) -> dict:
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return {
        "encoder": init_encoder_params(cfg.encoder, k1, dtype),
        "decoder": init_decoder_params(cfg.decoder, k2, dtype),
    }
