from qwen3_asr_tpu.text.bpe import BPETokenizer
from qwen3_asr_tpu.text.prompt import (
    build_asr_prompt,
    build_aligner_prompt,
    detect_language,
    extract_transcript,
)
from qwen3_asr_tpu.text.korean import load_korean_dict, tokenize_korean
from qwen3_asr_tpu.text.timestamps import (
    fix_timestamp_classes,
    classes_to_timestamps,
    pair_words,
    get_feat_extract_output_lengths,
)

__all__ = [
    "BPETokenizer",
    "build_asr_prompt",
    "build_aligner_prompt",
    "detect_language",
    "extract_transcript",
    "load_korean_dict",
    "tokenize_korean",
    "fix_timestamp_classes",
    "classes_to_timestamps",
    "pair_words",
    "get_feat_extract_output_lengths",
]
