from qwen3_asr_tpu.runtime.gguf import GGUFFile, GGUFWriter, Q8_0, dequantize_q8_0
from qwen3_asr_tpu.runtime.profiler import Profiler, profiler, timer

__all__ = [
    "GGUFFile",
    "GGUFWriter",
    "Q8_0",
    "dequantize_q8_0",
    "Profiler",
    "profiler",
    "timer",
]
