"""Hyperparameter dataclasses shared by both models.

Single source of truth for the hparams the reference spreads over
gguf_loader.h:15-35, text_decoder.h:15-31 and forced_aligner.h:36-70.
Defaults mirror the reference's compiled-in defaults so a GGUF file with
missing keys loads identically (reference: text_decoder.cpp:116-147,
forced_aligner.cpp:136-175, gguf_loader.cpp:55-88).
"""

from __future__ import annotations

import dataclasses

# Audio frontend constants (reference: mel_spectrogram.h:9-15)
SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 128

# Chat-template token IDs (reference: qwen3_asr.cpp:170-175)
IM_START = 151644
IM_END = 151645
SYSTEM_TOKEN = 8948
USER_TOKEN = 872
ASSISTANT_TOKEN = 77091
NEWLINE_TOKEN = 198


@dataclasses.dataclass(frozen=True)
class AudioEncoderConfig:
    """Whisper-style audio tower (shared between ASR and forced aligner).

    ASR defaults per gguf_loader.h:16-24; the forced aligner uses the larger
    tower (24 layers, d=1024, 16 heads, ffn 4096) per forced_aligner.cpp:151-156.
    """

    n_layers: int = 18
    d_model: int = 896
    n_heads: int = 14
    ffn_dim: int = 3584
    conv_channels: int = 480
    n_mel_bins: int = 128
    output_dim: int = 1024          # text decoder hidden size (proj2 out)
    layer_norm_eps: float = 1e-5
    # chunking: 100 mel frames (1 s) per conv chunk; downsample 8x -> 13
    n_window: int = 50
    # attention windowing: None = full bidirectional (ASR);
    # an int = block-diagonal windows of `n_window_infer` mel frames (FA).
    n_window_infer: int | None = None

    @property
    def chunk_size(self) -> int:
        return self.n_window * 2  # 100 mel frames

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def conv_out_in_dim(self) -> int:
        # 3 conv layers halve the 128 mel bins to 16; features = C*16
        return self.conv_channels * (self.n_mel_bins // 8)


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Qwen3 text decoder (reference: text_decoder.cpp:116-147)."""

    vocab_size: int = 151936
    hidden_size: int = 1024
    n_layers: int = 28
    n_heads: int = 16
    n_kv_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 3072
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1e6

    pad_token_id: int = 151643
    eos_token_id: int = 151645
    audio_start_token_id: int = 151669
    audio_end_token_id: int = 151670
    audio_pad_token_id: int = 151676

    # chat-template token ids (hardcoded in the reference,
    # qwen3_asr.cpp:170-175; parameterized here so tiny test configs can
    # stay within their vocab)
    im_start_token_id: int = IM_START
    im_end_token_id: int = IM_END
    system_token_id: int = SYSTEM_TOKEN
    user_token_id: int = USER_TOKEN
    assistant_token_id: int = ASSISTANT_TOKEN
    newline_token_id: int = NEWLINE_TOKEN

    # layer-scan unroll factor (decode perf knob): lax.scan keeps one layer
    # in flight; unrolling lets XLA overlap the next layer's HBM weight
    # stream with the current layer's compute. Must divide n_layers.
    scan_unroll: int = 1

    # fused decode-attention Pallas kernel (ops/decode_attention.py) for
    # single-token steps. Disabled for vmapped batch decoding: pallas under
    # vmap becomes B sequential launches per layer, whose fixed cost undoes
    # the batching win (parallel/mesh.py::batched_transcribe_step turns it
    # off).
    use_decode_attn_kernel: bool = True

    # forced-aligner head: when set, logits come from a `classify_num`-way
    # classification head over ALL positions instead of the tied lm head on
    # the last position (reference: forced_aligner.cpp:1073-1076).
    classify_num: int | None = None


@dataclasses.dataclass(frozen=True)
class ASRModelConfig:
    encoder: AudioEncoderConfig = dataclasses.field(default_factory=AudioEncoderConfig)
    decoder: DecoderConfig = dataclasses.field(default_factory=DecoderConfig)


def default_aligner_config() -> "AlignerModelConfig":
    return AlignerModelConfig(
        encoder=AudioEncoderConfig(
            n_layers=24,
            d_model=1024,
            n_heads=16,
            ffn_dim=4096,
            n_window_infer=800,
        ),
        decoder=DecoderConfig(vocab_size=152064, classify_num=5000),
    )


@dataclasses.dataclass(frozen=True)
class AlignerModelConfig:
    """Forced aligner = bigger encoder + same decoder backbone + classify head.

    Reference hparams: forced_aligner.cpp:136-175, forced_aligner.h:36-70.
    """

    encoder: AudioEncoderConfig = dataclasses.field(
        default_factory=lambda: AudioEncoderConfig(
            n_layers=24, d_model=1024, n_heads=16, ffn_dim=4096, n_window_infer=800
        )
    )
    decoder: DecoderConfig = dataclasses.field(
        default_factory=lambda: DecoderConfig(vocab_size=152064, classify_num=5000)
    )
    timestamp_token_id: int = 151705
    timestamp_segment_time_ms: int = 80


def tiny_asr_config(vocab_size: int = 512) -> ASRModelConfig:
    """Small config for tests: same structure, tiny dims."""
    return ASRModelConfig(
        encoder=AudioEncoderConfig(
            n_layers=2,
            d_model=32,
            n_heads=4,
            ffn_dim=64,
            conv_channels=8,
            output_dim=64,
        ),
        decoder=DecoderConfig(
            vocab_size=vocab_size,
            hidden_size=64,
            n_layers=2,
            n_heads=4,
            n_kv_heads=2,
            head_dim=16,
            intermediate_size=96,
            pad_token_id=0,
            eos_token_id=vocab_size - 1,
            audio_start_token_id=vocab_size - 4,
            audio_end_token_id=vocab_size - 3,
            audio_pad_token_id=vocab_size - 2,
            im_start_token_id=vocab_size - 6,
            im_end_token_id=vocab_size - 1,   # = eos, like the reference
            system_token_id=vocab_size - 7,
            user_token_id=vocab_size - 8,
            assistant_token_id=vocab_size - 9,
            newline_token_id=vocab_size - 10,
        ),
    )


def tiny_aligner_config(vocab_size: int = 512) -> AlignerModelConfig:
    return AlignerModelConfig(
        encoder=AudioEncoderConfig(
            n_layers=2,
            d_model=32,
            n_heads=4,
            ffn_dim=64,
            conv_channels=8,
            output_dim=64,
            n_window_infer=800,
        ),
        decoder=DecoderConfig(
            vocab_size=vocab_size,
            hidden_size=64,
            n_layers=2,
            n_heads=4,
            n_kv_heads=2,
            head_dim=16,
            intermediate_size=96,
            classify_num=50,
            pad_token_id=0,
            eos_token_id=vocab_size - 1,
            audio_start_token_id=vocab_size - 4,
            audio_end_token_id=vocab_size - 3,
            audio_pad_token_id=vocab_size - 2,
        ),
        timestamp_token_id=vocab_size - 5,
    )
