from qwen3_asr_tpu.audio.wav import load_wav, load_wav_bytes, write_wav
from qwen3_asr_tpu.audio.mel import (
    generate_mel_filters,
    log_mel_spectrogram,
    log_mel_spectrogram_ref,
)

__all__ = [
    "load_wav",
    "load_wav_bytes",
    "write_wav",
    "generate_mel_filters",
    "log_mel_spectrogram",
    "log_mel_spectrogram_ref",
]
