from qwen3_asr_tpu.models.encoder import encode_audio, sinusoidal_pe
from qwen3_asr_tpu.models.decoder import decoder_forward, embed_with_audio, init_kv_cache

__all__ = [
    "encode_audio",
    "sinusoidal_pe",
    "decoder_forward",
    "embed_with_audio",
    "init_kv_cache",
]
