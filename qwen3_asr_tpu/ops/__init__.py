from qwen3_asr_tpu.ops.attention import mha_attention

__all__ = ["mha_attention"]
