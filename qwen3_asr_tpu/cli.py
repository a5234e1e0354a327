"""qwen3-asr-cli — command-line interface with the reference's flags/outputs.

Three modes (main.cpp:513-533): transcription (default), --align, and
-a/--transcribe-align. Data output goes to stdout (or -o file), diagnostics
to stderr, exit code 1 on error — same contract as the reference binary.
"""

from __future__ import annotations

import argparse
import os
import sys


def _eprint(*args):
    print(*args, file=sys.stderr, flush=True)


from qwen3_asr_tpu.text.korean import find_korean_dict  # noqa: E402  (CLI re-export)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="qwen3-asr-cli",
        description="Qwen3-ASR speech-to-text and forced alignment (TPU)",
    )
    p.add_argument("-m", "--model", default="models/qwen3-asr-0.6b-f16.gguf",
                   help="Path to GGUF model")
    p.add_argument("-f", "--audio", required=True,
                   help="Path to audio file (WAV, 16kHz mono)")
    p.add_argument("-o", "--output", default="", help="Output file (default stdout)")
    p.add_argument("-l", "--language", "--lang", default="",
                   help="Language code (e.g. 'korean' for Korean word splitting)")
    p.add_argument("-t", "--threads", type=int, default=4,
                   help="Host thread count (accepted for parity; XLA manages threads)")
    p.add_argument("--max-tokens", type=int, default=1024)
    p.add_argument("--progress", action="store_true", dest="print_progress")
    p.add_argument("--no-timing", action="store_false", dest="print_timing")
    p.add_argument("--tokens", action="store_true", dest="print_tokens")
    p.add_argument("--profile", action="store_true")
    p.add_argument("--align", action="store_true", dest="align_mode")
    p.add_argument("--text", default="", dest="align_text",
                   help="Reference transcript for alignment")
    p.add_argument("-a", "--transcribe-align", action="store_true",
                   dest="transcribe_align_mode")
    p.add_argument("--aligner-model", default="",
                   help="Forced aligner GGUF (required with --transcribe-align)")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"],
                   help="On-device compute dtype")
    p.add_argument("--quantize", default="auto",
                   choices=["auto", "none", "q8_0", "int8pc", "int4"],
                   help="Decoder weight quantization. 'auto' (default) picks "
                        "int8pc (per-channel W8A8, the benchmarked-fastest "
                        "exact-ish config) for dense GGUFs and leaves Q8_0 "
                        "files on their native int8 blocks; 'none' forces "
                        "dense; 'int4' additionally nibble-packs the decode "
                        "megakernel's weight stream (half the HBM bytes/"
                        "step — fastest decode; coarser 4-bit weights, "
                        "prefill stays int8)")
    p.add_argument("--kv-int8", action="store_true",
                   help="int8 KV cache (per-row, per-head scales). With "
                        "the decode megakernel this is the fastest decode "
                        "config (931 vs 817 tok/s on a v5e); slightly "
                        "perturbs logits vs the default bf16 cache")
    p.add_argument("--kv-int4", action="store_true",
                   help="int4 KV cache: the decode megakernel streams "
                        "nibble-packed cache rows (quarter of bf16's "
                        "context-proportional HBM bytes). ~4x int8's KV "
                        "quantization error; overrides --kv-int8; runs "
                        "as int8 off the megakernel")
    p.add_argument("--spec-k", type=int, default=0,
                   help="Greedy self-speculation: draft K tokens per round "
                        "through the megakernel weight stream, verify the "
                        "block in one int8pc pass. Output is exactly the "
                        "int8pc greedy sequence; speed follows the "
                        "acceptance rate. Measured SLOWER than the plain "
                        "int4 stream (--quantize int4, the fastest "
                        "config); use only when int8pc-exact output is "
                        "required. 0 = off (default)")
    p.add_argument("--temperature", type=float, default=0.0,
                   help="Sampled decoding temperature (0 = greedy, the "
                        "reference's only mode). >0 draws tokens from the "
                        "softmax — a serving-surface extension mirroring "
                        "the OpenAI transcription API")
    p.add_argument("--top-k", type=int, default=0,
                   help="With --temperature: keep only the K most likely "
                        "tokens before sampling (0 = no filter)")
    p.add_argument("--top-p", type=float, default=1.0,
                   help="With --temperature: nucleus sampling — keep the "
                        "smallest set of tokens whose probability mass "
                        "reaches P (1.0 = no filter)")
    p.add_argument("--seed", type=int, default=0,
                   help="PRNG seed for --temperature sampling (same seed "
                        "=> same transcript)")
    p.add_argument("--fused", action="store_true", default=True,
                   help="Run each pipeline leg as ONE fused device program "
                        "(default; the benchmarked-fastest path)")
    p.add_argument("--no-fused", action="store_false", dest="fused",
                   help="Staged dispatches (mel/encoder/decode separately; "
                        "enables per-stage timing breakdown)")
    p.add_argument("--mel-bucket", type=int, default=0,
                   help="Pad mel frames to this bucket (rounded to the "
                        "100-frame chunk) so different audio lengths reuse "
                        "one compiled program; 0 = exact shapes")
    p.add_argument("--platform", default="",
                   help="Force a JAX platform (e.g. 'cpu', 'tpu'); default: auto")
    p.add_argument("--trace-dir", default="",
                   help="Write a jax.profiler trace (XLA-level timeline) here")
    p.add_argument("--output-format", default="json",
                   choices=["json", "srt", "vtt"],
                   help="Alignment output format (--align / "
                        "--transcribe-align): the reference's words JSON "
                        "(default), or SubRip / WebVTT subtitles built "
                        "from the word timestamps")
    p.add_argument("--save-mel", default="", metavar="PATH",
                   help="Debug hook: also write the input's log-mel "
                        "spectrogram as a .npy ([n_mels, n_frames] f32, "
                        "the golden-file layout of mel_spectrogram.h:34-65 "
                        "/ tests/compare.py) before running the selected "
                        "mode")
    return p


def _write_output(text: str, output_path: str) -> int:
    if not output_path:
        print(text, flush=True)
    else:
        try:
            with open(output_path, "w", encoding="utf-8") as f:
                f.write(text + "\n")
        except OSError:
            _eprint(f"Error: Failed to open output file: {output_path}")
            return 1
        _eprint(f"Output written to: {output_path}")
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    if args.align_mode and not args.align_text:
        _eprint("Error: Reference text is required for alignment mode (--text)")
        return 1
    if args.align_mode and args.transcribe_align_mode:
        _eprint("Error: --align and --transcribe-align cannot be used together")
        return 1
    if args.transcribe_align_mode and not args.aligner_model:
        _eprint("Error: --aligner-model is required for --transcribe-align")
        return 1

    # persistent XLA compile cache: repeat invocations skip compilation
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/qwen3_asr_tpu/xla"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)

    # heavy imports after arg validation
    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.trace_dir:
        import atexit

        jax.profiler.start_trace(args.trace_dir)
        atexit.register(jax.profiler.stop_trace)

    from qwen3_asr_tpu.pipeline.aligner import ForcedAligner
    from qwen3_asr_tpu.pipeline.asr import Qwen3ASR, TranscribeParams
    from qwen3_asr_tpu.pipeline.combined import alignment_to_json
    from qwen3_asr_tpu.runtime.profiler import profiler
    from qwen3_asr_tpu.text.subtitles import words_to_srt, words_to_vtt

    def render_alignment(result) -> str:
        if args.output_format == "srt":
            return words_to_srt(result.words)
        if args.output_format == "vtt":
            return words_to_vtt(result.words)
        return alignment_to_json(result)

    if args.save_mel:
        # debug hook (mel_spectrogram.h:34-65 save_npy parity): dump the
        # input's log-mel as .npy in the golden-file layout
        # ([n_mels, n_frames] f32 — what tests/compare.py diffs against
        # the HF generate_reference.py mel.npy), then continue with the
        # selected mode
        import numpy as np

        from qwen3_asr_tpu.audio import (
            generate_mel_filters,
            load_wav,
            log_mel_spectrogram,
        )
        from qwen3_asr_tpu.config import SAMPLE_RATE

        try:
            samples, sr = load_wav(args.audio, raw_int16=True)
        except Exception as e:
            _eprint(f"Error: Failed to load audio file: {e}")
            return 1
        if sr != SAMPLE_RATE:
            _eprint(f"Error: Audio must be 16kHz, got {sr} Hz")
            return 1
        mel = log_mel_spectrogram(samples, generate_mel_filters())
        np.save(args.save_mel, np.asarray(mel, np.float32))
        _eprint(f"Mel spectrogram saved: {args.save_mel} "
                f"(shape {mel.shape[0]}x{mel.shape[1]})")

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    tp = TranscribeParams(
        max_tokens=args.max_tokens,
        language=args.language,
        print_progress=args.print_progress,
        print_timing=args.print_timing,
        fused=args.fused,
        mel_bucket=args.mel_bucket,
        spec_k=args.spec_k,
        temperature=args.temperature,
        top_k=args.top_k,
        top_p=args.top_p,
        seed=args.seed,
    )
    quantize = "" if args.quantize == "none" else args.quantize

    def maybe_profile():
        if args.profile:
            _eprint(profiler.report())

    if args.transcribe_align_mode:
        _eprint("qwen3-asr-cli (Transcribe + Align Mode)")
        _eprint(f"  ASR Model: {args.model}")
        _eprint(f"  Aligner Model: {args.aligner_model}")
        _eprint(f"  Audio: {args.audio}\n")

        from qwen3_asr_tpu.pipeline.combined import transcribe_and_align

        asr = Qwen3ASR(dtype=dtype, quantize=quantize, kv_int8=args.kv_int8,
                   kv_cache="int4" if args.kv_int4 else None)
        if not asr.load_model(args.model):
            _eprint(f"Error (ASR): {asr.error_msg}")
            return 1
        aligner = ForcedAligner(dtype=dtype, quantize=quantize)
        if not aligner.load_model(args.aligner_model):
            _eprint(f"Error (Aligner): {aligner.error_msg}")
            return 1

        combined = transcribe_and_align(
            asr, aligner, args.audio, tp, language_override=args.language,
        )
        if not combined.success:
            _eprint(f"Error: {combined.error_msg}")
            return 1
        _eprint(f"  Detected language: {combined.detected_language or '(none)'}")
        _eprint(f"  Transcript: {combined.transcript}")

        if args.print_timing:
            asr_ms = combined.asr.t_total_ms
            align_ms = combined.alignment.t_total_ms
            _eprint(
                f"\nCombined Timing:\n"
                f"  ASR:           {asr_ms:.0f} ms\n"
                f"  Alignment:     {align_ms:.0f} ms\n"
                f"  Total:         {asr_ms + align_ms:.0f} ms\n"
                f"  Words aligned: {len(combined.alignment.words)}"
            )
        rc = _write_output(render_alignment(combined.alignment), args.output)
        maybe_profile()
        return rc

    if args.align_mode:
        _eprint("qwen3-asr-cli (Forced Alignment Mode)")
        _eprint(f"  Model: {args.model}")
        _eprint(f"  Audio: {args.audio}")
        _eprint(f"  Text: {args.align_text}")
        if args.language:
            _eprint(f"  Language: {args.language}")
        _eprint("")

        aligner = ForcedAligner(dtype=dtype, quantize=quantize)
        if not aligner.load_model(args.model):
            _eprint(f"Error: {aligner.error_msg}")
            return 1
        if args.language == "korean":
            dict_path = find_korean_dict(args.model)
            if not dict_path:
                _eprint("Warning: Korean dictionary not found. "
                        "Falling back to whitespace splitting.")
            elif not aligner.load_korean_dict(dict_path):
                _eprint(f"Warning: Failed to load Korean dictionary from {dict_path}")

        _eprint("Model loaded. Running alignment...")
        result = aligner.align(
            args.audio, args.align_text, args.language,
            mel_bucket=args.mel_bucket,
            fused=args.fused and args.mel_bucket == 0,
        )
        if not result.success:
            _eprint(f"Error: {result.error_msg}")
            return 1
        if args.print_timing:
            _eprint(
                f"\nTiming:\n"
                f"  Mel spectrogram: {result.t_mel_ms:.0f} ms\n"
                f"  Audio encoding:  {result.t_encode_ms:.0f} ms\n"
                f"  Text decoding:   {result.t_decode_ms:.0f} ms\n"
                f"  Total:           {result.t_total_ms:.0f} ms\n"
                f"  Words aligned:   {len(result.words)}"
            )
        rc = _write_output(render_alignment(result), args.output)
        maybe_profile()
        return rc

    # default: transcription
    _eprint("qwen3-asr-cli")
    _eprint(f"  Model: {args.model}")
    _eprint(f"  Audio: {args.audio}")
    _eprint(f"  Threads: {args.threads}\n")

    asr = Qwen3ASR(dtype=dtype, quantize=quantize, kv_int8=args.kv_int8,
                   kv_cache="int4" if args.kv_int4 else None)
    if not asr.load_model(args.model):
        _eprint(f"Error: {asr.error_msg}")
        return 1
    result = asr.transcribe(args.audio, tp)
    if not result.success:
        _eprint(f"Error: {result.error_msg}")
        return 1
    if args.print_tokens:
        _eprint(f"\nTokens ({len(result.tokens)}):")
        for i, t in enumerate(result.tokens):
            _eprint(f"  [{i}] {t}")
    rc = _write_output(result.text, args.output)
    maybe_profile()
    return rc


if __name__ == "__main__":
    sys.exit(main())
