"""Fully-fused end-to-end transcription: ONE jitted program per utterance.

PCM-in -> tokens-out: mel + encoder + prompt splice + prefill + the whole
greedy decode loop compile into a single XLA program, so a transcription is
exactly one device dispatch and one host sync. (The 3-stage pipeline costs
three round trips; the reference costs O(tokens), qwen3_asr.cpp:216-303.)

Shapes are exact per audio length — one compile per distinct mel frame
count. Use for fixed-length workloads (benchmarks, uniform-length serving
buckets); the staged pipeline in pipeline/asr.py handles arbitrary lengths
with bucketed shapes.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.audio.mel import (
    _mel_device,
    filters_t_device as _filters_t_device,
    num_mel_frames,
    reflect_pad,
)
from qwen3_asr_tpu.config import HOP_LENGTH, ASRModelConfig
from qwen3_asr_tpu.models.encoder import _encode_jit, chunk_output_len
from qwen3_asr_tpu.models.generate import generate_greedy
from qwen3_asr_tpu.text.prompt import audio_start_pos, build_asr_prompt


def expected_n_audio(n_frames: int, chunk: int = 100) -> int:
    n_chunks = -(-n_frames // chunk)
    return chunk_output_len(chunk) * (n_chunks - 1) + chunk_output_len(
        n_frames - (n_chunks - 1) * chunk
    )


@dataclasses.dataclass
class PreparedPCM:
    """PCM staged on device once, shared across fused legs.

    Combined transcribe+align runs two fused programs over the SAME audio;
    without staging, each leg re-pads and re-uploads the ~2.9 MB buffer
    (each upload costs 30-90 ms of host-link time on a network-attached
    chip). Both models share the mel front-end contract (16 kHz, hop 160,
    n_fft 400), so one padded buffer serves both."""

    samples: np.ndarray   # original host samples (int16 or float32)
    buf: jax.Array        # device [(n_frames+2)*HOP] padded PCM
    n_frames: int

    def __len__(self) -> int:  # audio duration contract: len(x)/SAMPLE_RATE
        return len(self.samples)


def _pad_pcm(samples: np.ndarray) -> tuple[np.ndarray, int]:
    """Reflect-pad PCM into the fixed mel framing buffer (host)."""
    n_frames = num_mel_frames(len(samples))
    padded = reflect_pad(samples)
    need = (n_frames + 2) * HOP_LENGTH
    buf = np.zeros(need, dtype=samples.dtype)
    n_copy = min((n_frames - 1) * HOP_LENGTH + 400, len(padded), need)
    buf[:n_copy] = padded[:n_copy]
    return buf, n_frames


def prepare_pcm(samples) -> PreparedPCM:
    """Pad + upload PCM once for reuse by transcribe_fused/align_fused."""
    samples = np.asarray(samples)
    if samples.dtype != np.int16:
        samples = samples.astype(np.float32)
    buf, n_frames = _pad_pcm(samples)
    return PreparedPCM(samples, jax.device_put(buf), n_frames)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_frames", "max_tokens", "audio_offset",
                     "cache_dtype"),
)
def _transcribe_fused_jit(
    params: dict,
    cfg: ASRModelConfig,
    pcm_padded: jax.Array,      # [(n_frames+2)*HOP] int16 or f32
    filters_t: jax.Array,       # [201, n_mels]
    prompt: jax.Array,          # [n_prompt] int32 (exact length)
    n_frames: int,
    audio_offset: int,
    max_tokens: int,
    cache_dtype=jnp.bfloat16,
):
    mel = _mel_device(pcm_padded, filters_t, n_frames).T     # [n_mels, N]
    feats = _encode_jit(params["encoder"], cfg.encoder, mel, n_frames)
    n_audio = feats.shape[0]
    n_prompt = prompt.shape[0]
    return generate_greedy(
        params["decoder"], cfg.decoder, prompt, jnp.int32(n_prompt),
        feats, jnp.int32(n_audio), audio_offset, max_tokens,
        cache_dtype=cache_dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_frames", "audio_offset"),
)
def _align_fused_jit(
    params: dict,
    cfg,                        # AlignerModelConfig
    pcm_padded: jax.Array,      # [(n_frames+2)*HOP] int16 or f32
    filters_t: jax.Array,       # [201, n_mels]
    tokens: jax.Array,          # [P] int32 aligner prompt (padded)
    n_valid: jax.Array,         # scalar: real prompt length
    n_frames: int,
    audio_offset: int,
):
    from qwen3_asr_tpu.models.decoder import classify_logits
    from qwen3_asr_tpu.models.generate import nar_forward

    mel = _mel_device(pcm_padded, filters_t, n_frames).T
    feats = _encode_jit(params["encoder"], cfg.encoder, mel, n_frames)
    h = nar_forward(params["decoder"], cfg.decoder, tokens, feats,
                    jnp.int32(feats.shape[0]), audio_offset, n_valid=n_valid)
    return jnp.argmax(classify_logits(params["decoder"], cfg.decoder, h),
                      axis=-1)


def align_fused(
    params: dict,
    cfg,                        # AlignerModelConfig
    samples: np.ndarray,
    filters: np.ndarray,
    input_tokens,               # list[int]: full aligner prompt
    audio_offset: int = 1,
) -> np.ndarray:
    """Fully-fused forced alignment: PCM + prompt -> per-position argmax
    classes in ONE device round trip (mel + FA encoder + NAR classify in a
    single XLA program — the pipeline's 3 dispatches each pay this rig's
    ~30 ms link latency while FA compute is ~0.1 ms). Exact shapes: one
    compile per (mel length, prompt bucket). `samples` may be a
    PreparedPCM to reuse an already-uploaded buffer."""
    prep = samples if isinstance(samples, PreparedPCM) else None
    if prep is None:
        samples = np.asarray(samples)
        if samples.dtype != np.int16:
            samples = samples.astype(np.float32)
        buf, n_frames = _pad_pcm(samples)
    else:
        n_frames = prep.n_frames

    pbucket = 128
    n_real = len(input_tokens)
    P = -(-n_real // pbucket) * pbucket
    toks = np.full(P, cfg.decoder.pad_token_id % cfg.decoder.vocab_size,
                   np.int32)
    toks[:n_real] = input_tokens

    if prep is None:
        buf_d, toks_d = jax.device_put((buf, toks))  # one batched upload
    else:
        buf_d, toks_d = prep.buf, jax.device_put(toks)
    pred = _align_fused_jit(
        params, cfg, buf_d, _filters_t_device(filters),
        toks_d, jnp.int32(n_real), n_frames, audio_offset,
    )
    return np.asarray(pred)[:n_real]


def transcribe_fused(
    params: dict,
    cfg: ASRModelConfig,
    samples: np.ndarray,
    filters: np.ndarray,
    max_tokens: int,
    system_prompt_tokens=None,
    cache_dtype=jnp.bfloat16,
) -> tuple[np.ndarray, int]:
    """-> (tokens [max_tokens], n_kept). One device round trip. `samples`
    may be a PreparedPCM to reuse an already-uploaded buffer."""
    prep = samples if isinstance(samples, PreparedPCM) else None
    if prep is None:
        samples = np.asarray(samples)
        if samples.dtype != np.int16:
            samples = samples.astype(np.float32)
        buf, n_frames = _pad_pcm(samples)
    else:
        n_frames = prep.n_frames

    n_audio = expected_n_audio(n_frames)
    prompt = build_asr_prompt(n_audio, cfg.decoder, system_prompt_tokens)
    offset = audio_start_pos(prompt, cfg.decoder)

    if prep is None:
        # one batched upload for both inputs (separate jnp.asarray calls
        # are separate host-link transfers)
        buf_d, prompt_d = jax.device_put((buf, np.asarray(prompt, np.int32)))
    else:
        buf_d = prep.buf
        prompt_d = jax.device_put(np.asarray(prompt, np.int32))
    out, n_kept = _transcribe_fused_jit(
        params, cfg, buf_d, _filters_t_device(filters),
        prompt_d, n_frames, offset, max_tokens, cache_dtype,
    )
    # one bulk fetch: separate np.asarray(out) + int(n_kept) cost two
    # host-link round trips on a network-attached chip
    out, n_kept = jax.device_get((out, n_kept))
    return out, int(n_kept)
