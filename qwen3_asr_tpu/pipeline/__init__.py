from qwen3_asr_tpu.pipeline.asr import Qwen3ASR, TranscribeParams, TranscribeResult
from qwen3_asr_tpu.pipeline.aligner import ForcedAligner, AlignmentResult

__all__ = [
    "Qwen3ASR",
    "TranscribeParams",
    "TranscribeResult",
    "ForcedAligner",
    "AlignmentResult",
]
