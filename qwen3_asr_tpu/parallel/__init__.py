from qwen3_asr_tpu.parallel.mesh import (
    make_mesh,
    shard_decoder_params,
    shard_encoder_params,
    batched_transcribe_step,
)

__all__ = [
    "make_mesh",
    "shard_decoder_params",
    "shard_encoder_params",
    "batched_transcribe_step",
]
