"""qwen3_asr_tpu — TPU-native (JAX/XLA/Pallas) speech stack.

A from-scratch rebuild of the capabilities of qwen3-asr.cpp (reference:
/root/reference) designed TPU-first:

- the mel frontend is a fused framing+DFT+filterbank graph compiled by XLA
  (optionally a Pallas kernel) instead of a per-frame host DFT loop
  (reference: src/mel_spectrogram.cpp:484-628),
- the audio encoder batches all conv chunks in one program and adds the
  sinusoidal positional embedding on device (reference loops chunk-by-chunk
  with a host round-trip per chunk, src/audio_encoder.cpp:312-409),
- the text decoder runs prefill + the entire greedy decode loop inside a
  single jitted program with a device-resident KV cache and on-device argmax
  (reference rebuilds a graph and reads back 151936 logits per token,
  src/text_decoder.cpp:392-684, src/qwen3_asr.cpp:216-303),
- one encoder and one decoder implementation are shared by the ASR and the
  forced-aligner models (the reference duplicates ~1.8k LoC in
  src/forced_aligner.cpp).
"""

__version__ = "0.1.0"

from qwen3_asr_tpu.config import (
    AudioEncoderConfig,
    DecoderConfig,
    ASRModelConfig,
    AlignerModelConfig,
)

__all__ = [
    "AudioEncoderConfig",
    "DecoderConfig",
    "ASRModelConfig",
    "AlignerModelConfig",
]
