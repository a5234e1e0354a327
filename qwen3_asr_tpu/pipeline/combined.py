"""Combined transcribe + align pipeline (reference: main.cpp:416-504)."""

from __future__ import annotations

import dataclasses

from qwen3_asr_tpu.pipeline.aligner import AlignmentResult, ForcedAligner
from qwen3_asr_tpu.pipeline.asr import Qwen3ASR, TranscribeParams, TranscribeResult
from qwen3_asr_tpu.text import detect_language, extract_transcript


@dataclasses.dataclass
class TranscribeAlignResult:
    success: bool = False
    error_msg: str = ""
    transcript: str = ""
    detected_language: str = ""
    asr: TranscribeResult | None = None
    alignment: AlignmentResult | None = None


def transcribe_and_align(
    asr: Qwen3ASR,
    aligner: ForcedAligner,
    audio,
    params: TranscribeParams | None = None,
    language_override: str = "",
) -> TranscribeAlignResult:
    """ASR -> language detection from the 'language Xxx' prefix ->
    transcript extraction -> forced alignment with the detected language.

    When the align language resolves to Korean and the aligner has no
    dictionary yet, the vendored asset is located and loaded automatically
    (reference: main.cpp:457-469 does this in the combined driver)."""
    out = TranscribeAlignResult()

    # Fused combined mode runs two fused programs over the SAME audio;
    # stage the padded PCM on device ONCE so the second leg skips the
    # ~2.9 MB re-upload (30-90 ms of host-link time per leg on a
    # network-attached chip). Both models share the mel front-end.
    if params is not None and params.fused and params.mel_bucket == 0:
        from qwen3_asr_tpu.models.e2e import PreparedPCM, prepare_pcm

        if isinstance(audio, str):
            from qwen3_asr_tpu.audio import load_wav
            from qwen3_asr_tpu.config import SAMPLE_RATE

            # same load/validation/error surface the ASR leg would give
            try:
                samples, sr = load_wav(audio, raw_int16=True)
            except Exception as e:
                out.asr = TranscribeResult(
                    error_msg=f"Failed to load audio file: {e}")
                out.error_msg = f"ASR failed: {out.asr.error_msg}"
                return out
            if sr != SAMPLE_RATE:
                out.asr = TranscribeResult(
                    error_msg=f"Audio must be 16kHz, got {sr} Hz")
                out.error_msg = f"ASR failed: {out.asr.error_msg}"
                return out
            audio = prepare_pcm(samples)
        elif not isinstance(audio, PreparedPCM):
            audio = prepare_pcm(audio)

    asr_result = asr.transcribe(audio, params)
    out.asr = asr_result
    if not asr_result.success:
        out.error_msg = f"ASR failed: {asr_result.error_msg}"
        return out

    detected = detect_language(asr_result.text)
    align_lang = language_override or detected
    transcript = extract_transcript(asr_result.text)
    out.detected_language = detected
    out.transcript = transcript

    if align_lang == "korean" and not aligner.ko_dict:
        import sys

        from qwen3_asr_tpu.text.korean import find_korean_dict

        dict_path = find_korean_dict()
        if not dict_path:
            print("Warning: Korean dictionary not found. "
                  "Falling back to whitespace splitting.",
                  file=sys.stderr, flush=True)
        elif not aligner.load_korean_dict(dict_path):
            print(f"Warning: Failed to load Korean dictionary from {dict_path}",
                  file=sys.stderr, flush=True)

    mel_bucket = params.mel_bucket if params else 0
    align_result = aligner.align(
        audio, transcript, align_lang,
        mel_bucket=mel_bucket,
        fused=(params.fused if params else False) and mel_bucket == 0,
    )
    out.alignment = align_result
    if not align_result.success:
        out.error_msg = f"Alignment failed: {align_result.error_msg}"
        return out

    out.success = True
    return out


def alignment_to_json(result: AlignmentResult) -> str:
    """Same JSON shape as the reference CLI (main.cpp:255-273)."""
    import json

    def esc(s: str) -> str:
        return json.dumps(s, ensure_ascii=False)[1:-1]

    lines = ['{\n  "words": [']
    rows = []
    for w in result.words:
        rows.append(
            f'    {{"word": "{esc(w.word)}", "start": {w.start:.3f}, '
            f'"end": {w.end:.3f}}}'
        )
    lines.append(",\n".join(rows))
    lines.append("  ]\n}")
    return "\n".join(lines)
