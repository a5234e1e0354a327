"""Shared Whisper-style audio encoder (ASR tower and FA tower).

One implementation parameterized by `AudioEncoderConfig` — the reference
duplicates this whole module between audio_encoder.cpp and
forced_aligner.cpp:591-924; mask mode (full bidirectional vs block-diagonal
windows) is the only behavioral difference.

TPU-first design decisions:
- ALL conv chunks are batched into one conv program (like the reference's FA
  path, forced_aligner.cpp:633-709, and the HF oracle,
  tests/generate_reference.py:76-95) instead of a per-chunk graph rebuild +
  host round-trip (audio_encoder.cpp:348-409),
- the sinusoidal positional embedding is computed and added on device
  (the reference computes it on the host per chunk, audio_encoder.cpp:398-406),
- chunk-validity gather uses indices that are static at trace time,
- the FA block-diagonal attention uses a position//window predicate instead
  of a materialized n_ctx^2 mask (forced_aligner.cpp:757-766).

Conv semantics: 3x [3x3, stride 2, pad 1] + bias + exact GELU on zero-padded
100-frame chunks, matching the HF oracle. GELU is exact (erf) to match HF's
F.gelu; GGML's tanh-approx gelu differs at ~1e-3, inside the reference's own
2e-2 encoder tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.config import AudioEncoderConfig
from qwen3_asr_tpu.ops.attention import block_diagonal_attention, mha_attention

# Minimum sequence length at which the Pallas flash-attention kernel beats
# XLA's fused attention in the bidirectional encoder (see _encoder_block).
FLASH_MIN_T = 1536


def chunk_output_len(chunk_frames: int) -> int:
    """(len-1)//2+1 applied three times (audio_encoder.cpp:304-310)."""
    n = chunk_frames
    for _ in range(3):
        n = (n - 1) // 2 + 1
    return n


def sinusoidal_pe(n_ctx: int, d_model: int, dtype=jnp.float32) -> jax.Array:
    """Half-split sin/cos positional embedding (audio_encoder.cpp:12-22):
    pe[pos, i] = sin(pos * exp(-log(10000) * i / (half-1))),
    pe[pos, half+i] = cos(same)."""
    half = d_model // 2
    i = np.arange(half, dtype=np.float64)
    div = np.exp(-np.log(10000.0) * i / (half - 1))
    pos = np.arange(n_ctx, dtype=np.float64)[:, None]
    ang = pos * div[None, :]
    pe = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    return jnp.asarray(pe, dtype=dtype)


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.astype(x.dtype)
    if w is not None:
        y = y * w
    if b is not None:
        y = y + b
    return y


def _conv_frontend(params: dict, mel_chunks: jax.Array) -> jax.Array:
    """mel_chunks [B, 1, n_mel, chunk] -> [B, T_out, C*H] features.

    Computed in NHWC (the TPU-native conv layout; NCHW convs lower poorly)
    with float32 accumulation. Kernels are stored OIHW (torch layout, as the
    GGUF converter writes them) and transposed to HWIO at trace time.
    """
    dtype = params["conv_out_w"].dtype
    x = jnp.transpose(mel_chunks, (0, 2, 3, 1)).astype(dtype)  # [B, H, W, 1]
    for i in (1, 2, 3):
        w = jnp.transpose(params[f"conv{i}_w"], (2, 3, 1, 0)).astype(dtype)
        b = params[f"conv{i}_b"].astype(jnp.float32)
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        x = jax.nn.gelu(x + b[None, None, None, :], approximate=False).astype(dtype)
    # [B, H, W, C] -> [B, W, C, H] -> [B, W, C*H]; feature index = c*H + h,
    # matching HF's permute(0,3,1,2).view(b,t,c*f) (generate_reference.py:94-95)
    B, H, W, C = x.shape
    return jnp.transpose(x, (0, 2, 3, 1)).reshape(B, W, C * H)


def _encoder_block(cfg: AudioEncoderConfig, h, layer, window: int | None,
                   n_valid=None, allow_flash: bool = True):
    """One transformer block. `n_valid` (dynamic scalar, bucketed path):
    attention keys/values past it are right-padding and masked out (their
    rows still compute — garbage in, garbage out, discarded by the caller).
    `allow_flash=False` keeps attention on XLA (vmapped batch encode:
    pallas under vmap runs B sequential launches).
    """
    scale = 1.0 / float(np.sqrt(cfg.head_dim))
    T = h.shape[0]

    x = _layer_norm(h, layer["attn_norm_w"], layer["attn_norm_b"], cfg.layer_norm_eps)
    q = (x @ layer["wq"] + layer["bq"]).reshape(T, cfg.n_heads, cfg.head_dim)
    k = (x @ layer["wk"] + layer["bk"]).reshape(T, cfg.n_heads, cfg.head_dim)
    v = (x @ layer["wv"] + layer["bv"]).reshape(T, cfg.n_heads, cfg.head_dim)
    if window is None:
        from qwen3_asr_tpu.ops.support import has_pallas_tpu

        valid = jnp.int32(T) if n_valid is None else n_valid
        # Measured crossover on a v5e (scripts/time_enc_crossover.py):
        # XLA's fused attention wins at T=1196 (10.8 vs 12.4 ms full
        # encode, 18 layers), flash wins 1.5x at T=2392 and 2x at T=4784
        # (the T^2 score materialization overtakes the kernel's fixed
        # overhead). Gate at the interpolated break-even.
        if allow_flash and has_pallas_tpu() and T >= FLASH_MIN_T:
            from qwen3_asr_tpu.ops.pallas_attention import flash_attention

            attn = flash_attention(q, k, v, valid, causal=False,
                                   scale=scale)
        elif n_valid is None:
            attn = mha_attention(q, k, v, None, scale)
        else:
            mask = jnp.broadcast_to(
                (jnp.arange(T) < n_valid)[None, :], (T, T)
            )
            attn = mha_attention(q, k, v, mask, scale)
    else:
        attn = block_diagonal_attention(q, k, v, window, scale,
                                        n_valid=n_valid)
    attn = attn.reshape(T, cfg.d_model)
    h = h + (attn @ layer["wo"] + layer["bo"])

    x = _layer_norm(h, layer["ffn_norm_w"], layer["ffn_norm_b"], cfg.layer_norm_eps)
    x = jax.nn.gelu(x @ layer["w_up"] + layer["b_up"], approximate=False)
    h = h + (x @ layer["w_down"] + layer["b_down"])
    return h


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_frames", "allow_flash"))
def _encode_jit(params: dict, cfg: AudioEncoderConfig, mel: jax.Array,
                n_frames: int, allow_flash: bool = True):
    n_mel = cfg.n_mel_bins
    chunk = cfg.chunk_size
    n_chunks = -(-n_frames // chunk)
    max_out = chunk_output_len(chunk)  # 13

    # zero-pad to whole chunks and batch: [n_chunks, 1, n_mel, chunk]
    pad = n_chunks * chunk - n_frames
    mel_p = jnp.pad(mel.astype(jnp.float32), ((0, 0), (0, pad)))
    chunks = mel_p.reshape(n_mel, n_chunks, chunk).transpose(1, 0, 2)[:, None]

    feats = _conv_frontend(params, chunks)                 # [B, 13, C*H]
    dtype = params["conv_out_w"].dtype
    x = feats.astype(dtype) @ params["conv_out_w"]         # [B, 13, d]
    x = x + sinusoidal_pe(max_out, cfg.d_model, dtype)[None]

    # static valid-frame gather: every chunk yields 13 frames except a
    # shorter tail (audio_encoder.cpp:331-343)
    last_len = n_frames - (n_chunks - 1) * chunk
    last_out = chunk_output_len(last_len)
    idx = []
    for c in range(n_chunks):
        valid = max_out if c < n_chunks - 1 else last_out
        idx.extend(range(c * max_out, c * max_out + valid))
    idx = np.asarray(idx, dtype=np.int32)
    h = x.reshape(n_chunks * max_out, cfg.d_model)[idx]    # [n_ctx, d]
    n_ctx = h.shape[0]

    if cfg.n_window_infer is None:
        window = None
    else:
        window = max_out * (cfg.n_window_infer // chunk)   # 104 for FA

    def body(carry, layer):
        return _encoder_block(cfg, carry, layer, window,
                              allow_flash=allow_flash), None

    h, _ = jax.lax.scan(body, h, params["layers"])

    h = _layer_norm(h, params["ln_post_w"], params["ln_post_b"], cfg.layer_norm_eps)
    if params.get("proj1_w") is not None:
        h = jax.nn.gelu(h @ params["proj1_w"] + params["proj1_b"], approximate=False)
    if params.get("proj2_w") is not None:
        h = h @ params["proj2_w"] + params["proj2_b"]
    return h


def encode_audio(params: dict, cfg: AudioEncoderConfig, mel) -> jax.Array:
    """mel [n_mel, n_frames] -> encoder features [n_ctx, output_dim].

    n_ctx = sum of per-chunk output lengths = 13 per full second of audio.
    """
    mel = jnp.asarray(mel)
    return _encode_jit(params, cfg, mel, int(mel.shape[1]))


def _encode_padded_core(params, cfg: AudioEncoderConfig, mel_p,
                        gap_pos, gap_size, n_valid, allow_flash=True):
    """Bucketed encoder: mel_p is [n_mel, F_b] with F_b a chunk multiple
    and frames past the true count zeroed (audio/mel.py
    ::log_mel_spectrogram_padded). One compiled program per F_b bucket.

    All F_b//chunk chunks run the conv; the exact path's static valid-row
    gather (the tail chunk emits chunk_output_len(tail) < 13 rows) becomes a
    dynamic close-the-gap gather — delete `gap_size` rows at `gap_pos` —
    so the true rows are the contiguous prefix. The transformer masks
    attention to the first `n_valid` rows; rows past that are garbage the
    caller never reads (generate's audio splice stops at its n_audio).
    """
    n_mel, F_b = mel_p.shape
    chunk = cfg.chunk_size
    assert F_b % chunk == 0, (F_b, chunk)
    n_chunks = F_b // chunk
    max_out = chunk_output_len(chunk)

    chunks = (mel_p.astype(jnp.float32)
              .reshape(n_mel, n_chunks, chunk).transpose(1, 0, 2)[:, None])
    feats = _conv_frontend(params, chunks)
    dtype = params["conv_out_w"].dtype
    x = feats.astype(dtype) @ params["conv_out_w"]
    x = x + sinusoidal_pe(max_out, cfg.d_model, dtype)[None]
    x = x.reshape(n_chunks * max_out, cfg.d_model)

    N = x.shape[0]
    pos = jnp.arange(N)
    idx = jnp.minimum(pos + jnp.where(pos >= gap_pos, gap_size, 0), N - 1)
    h = jnp.take(x, idx, axis=0)

    if cfg.n_window_infer is None:
        window = None
    else:
        window = max_out * (cfg.n_window_infer // chunk)   # 104 for FA

    def body(carry, layer):
        return _encoder_block(cfg, carry, layer, window, n_valid=n_valid,
                              allow_flash=allow_flash), None

    h, _ = jax.lax.scan(body, h, params["layers"])

    h = _layer_norm(h, params["ln_post_w"], params["ln_post_b"], cfg.layer_norm_eps)
    if params.get("proj1_w") is not None:
        h = jax.nn.gelu(h @ params["proj1_w"] + params["proj1_b"], approximate=False)
    if params.get("proj2_w") is not None:
        h = h @ params["proj2_w"] + params["proj2_b"]
    return h


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode_padded_jit(params, cfg, mel_p, gap_pos, gap_size, n_valid):
    return _encode_padded_core(params, cfg, mel_p, gap_pos, gap_size, n_valid)


def _encoder_block_batch(cfg: AudioEncoderConfig, h, layer, n_valid,
                         interpret: bool = False):
    """Batched transformer block: h [B, T, d], n_valid [B]. Attention runs
    the batched flash kernel (ONE launch, batch = a real grid axis) — the
    round-3 batched path fell back to masked XLA because pallas-under-vmap
    serializes launches (measured 133 ms/B=8 @ 92 s)."""
    from qwen3_asr_tpu.ops.pallas_attention import flash_attention_batch

    scale = 1.0 / float(np.sqrt(cfg.head_dim))
    B, T, _ = h.shape

    x = _layer_norm(h, layer["attn_norm_w"], layer["attn_norm_b"],
                    cfg.layer_norm_eps)
    q = (x @ layer["wq"] + layer["bq"]).reshape(B, T, cfg.n_heads, cfg.head_dim)
    k = (x @ layer["wk"] + layer["bk"]).reshape(B, T, cfg.n_heads, cfg.head_dim)
    v = (x @ layer["wv"] + layer["bv"]).reshape(B, T, cfg.n_heads, cfg.head_dim)
    attn = flash_attention_batch(q, k, v, n_valid, causal=False, scale=scale,
                                 interpret=interpret)
    attn = attn.reshape(B, T, cfg.d_model)
    h = h + (attn @ layer["wo"] + layer["bo"])

    x = _layer_norm(h, layer["ffn_norm_w"], layer["ffn_norm_b"],
                    cfg.layer_norm_eps)
    x = jax.nn.gelu(x @ layer["w_up"] + layer["b_up"], approximate=False)
    h = h + (x @ layer["w_down"] + layer["b_down"])
    return h


def _encode_padded_core_batch(params, cfg: AudioEncoderConfig, mel_b,
                              gap_pos, gap_size, n_valid,
                              interpret: bool = False):
    """Natively-batched bucketed encoder (bidirectional towers only):
    mel_b [B, n_mel, F_b], per-item gap/valid vectors [B]. Same math as
    vmap(_encode_padded_core) but attention is the batched flash kernel."""
    B, n_mel, F_b = mel_b.shape
    chunk = cfg.chunk_size
    assert F_b % chunk == 0, (F_b, chunk)
    assert cfg.n_window_infer is None, "batched flash path is bidirectional"
    n_chunks = F_b // chunk
    max_out = chunk_output_len(chunk)

    chunks = (mel_b.astype(jnp.float32)
              .reshape(B, n_mel, n_chunks, chunk).transpose(0, 2, 1, 3)
              .reshape(B * n_chunks, 1, n_mel, chunk))
    feats = _conv_frontend(params, chunks)                  # [B*nc, 13, C*H]
    dtype = params["conv_out_w"].dtype
    x = feats.astype(dtype) @ params["conv_out_w"]
    x = x + sinusoidal_pe(max_out, cfg.d_model, dtype)[None]
    x = x.reshape(B, n_chunks * max_out, cfg.d_model)

    N = x.shape[1]
    pos = jnp.arange(N)[None, :]                            # [1, N]
    idx = jnp.minimum(
        pos + jnp.where(pos >= gap_pos[:, None], gap_size[:, None], 0), N - 1)
    h = jnp.take_along_axis(x, idx[:, :, None], axis=1)     # [B, N, d]

    def body(carry, layer):
        return _encoder_block_batch(cfg, carry, layer, n_valid,
                                    interpret=interpret), None

    h, _ = jax.lax.scan(body, h, params["layers"])

    h = _layer_norm(h, params["ln_post_w"], params["ln_post_b"],
                    cfg.layer_norm_eps)
    if params.get("proj1_w") is not None:
        h = jax.nn.gelu(h @ params["proj1_w"] + params["proj1_b"],
                        approximate=False)
    if params.get("proj2_w") is not None:
        h = h @ params["proj2_w"] + params["proj2_b"]
    return h


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode_padded_batch_jit(params, cfg, mel_b, gap_pos, gap_size, n_valid):
    """Batched bucketed encoder: mel_b [B, n_mel, F_b], per-item scalars.
    ONE device dispatch for the whole batch (serving: B files of the same
    length bucket encode together instead of B sequential round trips).

    On TPU at flash-worthy lengths the whole batch goes through
    _encode_padded_core_batch (batched flash kernel, batch = grid axis);
    otherwise vmap the single-item core with XLA attention (pallas under
    vmap would serialize B launches)."""
    from qwen3_asr_tpu.ops.support import has_pallas_tpu

    T = max_encoder_ctx(cfg, mel_b.shape[2])
    if (cfg.n_window_infer is None and has_pallas_tpu()
            and T >= FLASH_MIN_T):
        return _encode_padded_core_batch(params, cfg, mel_b,
                                         gap_pos, gap_size, n_valid)
    return jax.vmap(
        lambda m, gp, gs, nv: _encode_padded_core(params, cfg, m, gp, gs, nv,
                                                  allow_flash=False)
    )(mel_b, gap_pos, gap_size, n_valid)


def max_encoder_ctx(cfg: AudioEncoderConfig, n_frames_bucket: int) -> int:
    """Transformer sequence length for a bucket of n_frames mel frames."""
    return (n_frames_bucket // cfg.chunk_size) * chunk_output_len(
        cfg.chunk_size)


def encode_audio_padded(
    params: dict, cfg: AudioEncoderConfig, mel_p, n_frames_true: int
) -> tuple[jax.Array, int]:
    """Bucketed encode -> (padded feats [13 * F_b/chunk, d], true n_audio).

    The first `n_audio` rows are the exact-path features; the rest is
    padding garbage.
    """
    chunk = cfg.chunk_size
    max_out = chunk_output_len(chunk)
    k_full, tail = divmod(n_frames_true, chunk)
    t_out = chunk_output_len(tail) if tail else max_out
    if tail:
        gap_pos, gap_size = k_full * max_out + t_out, max_out - t_out
        n_audio = k_full * max_out + t_out
    else:
        gap_pos, gap_size = k_full * max_out, 0
        n_audio = k_full * max_out
    feats = _encode_padded_jit(
        params, cfg, jnp.asarray(mel_p),
        jnp.int32(gap_pos), jnp.int32(gap_size), jnp.int32(n_audio),
    )
    return feats, n_audio


def _gap_params(cfg: AudioEncoderConfig, n_frames_true: int):
    chunk = cfg.chunk_size
    max_out = chunk_output_len(chunk)
    k_full, tail = divmod(n_frames_true, chunk)
    if tail:
        t_out = chunk_output_len(tail)
        return k_full * max_out + t_out, max_out - t_out, k_full * max_out + t_out
    return k_full * max_out, 0, k_full * max_out


def encode_audio_padded_batch(
    params: dict, cfg: AudioEncoderConfig, mel_b, n_frames_list
) -> tuple[jax.Array, list[int]]:
    """Batched bucketed encode -> (padded feats [B, N_max, d], n_audio per
    item). All items must share mel_b's F_b bucket."""
    import numpy as np

    gaps = [_gap_params(cfg, n) for n in n_frames_list]
    gp = jnp.asarray(np.asarray([g[0] for g in gaps], np.int32))
    gs = jnp.asarray(np.asarray([g[1] for g in gaps], np.int32))
    nv = jnp.asarray(np.asarray([g[2] for g in gaps], np.int32))
    feats = _encode_padded_batch_jit(params, cfg, jnp.asarray(mel_b),
                                     gp, gs, nv)
    return feats, [g[2] for g in gaps]
