#!/usr/bin/env python3
"""Dump pipeline intermediates as .npy files for golden-parity checks.

Produces the same artifact set the reference's golden harness compares
(tests/generate_reference.py + generate_decoder_reference.py):
  mel.npy             [n_mels, n_frames]
  audio_features.npy  [n_ctx, hidden]
  decoder_logits.npy  [T, vocab] for a fixed token sequence
  debug_*.npy         layer-0 decoder intermediates

Compare against reference goldens with:
  python -m qwen3_asr_tpu.tools.compare out_dir/ reference_dir/ --atol 1e-2

Usage:
  python -m qwen3_asr_tpu.tools.dump_intermediates \
      -m model.gguf -f sample.wav -o out_dir \
      [--tokens 151669,151676,151676,151676,151670] [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _dump_aligner(args) -> int:
    """Forced-aligner golden artifacts for a (audio, text) pair:

      fa_mel.npy            [n_mels, n_frames]
      fa_audio_features.npy [n_ctx, hidden]   (FA encoder tower)
      fa_ts_logits.npy      [n_ts, classify_num] f32 classify logits at the
                            <ts> prompt positions (2 per word)
      fa_classes.npy        [n_ts] int32 argmax classes (pre-LIS-repair)
      fa_prompt_tokens.npy  [P] int32 the exact prompt used

    The HF golden generator side must build the identical prompt (per-word
    BPE + 2 <ts> per word inside the chat template,
    forced_aligner.cpp:1564-1609) and dump logits at the same positions.
    """
    import jax.numpy as jnp

    from qwen3_asr_tpu.models.decoder import classify_logits
    from qwen3_asr_tpu.models.generate import nar_forward
    from qwen3_asr_tpu.pipeline.aligner import ForcedAligner
    from qwen3_asr_tpu.text import (
        build_aligner_prompt,
        get_feat_extract_output_lengths,
    )

    if not args.audio or not args.text:
        print("Error: --aligner needs -f AUDIO and --text", file=sys.stderr)
        return 1
    os.makedirs(args.output, exist_ok=True)

    fa = ForcedAligner(dtype=jnp.float32)
    if not fa.load_model(args.model):
        print(f"Error: {fa.error_msg}", file=sys.stderr)
        return 1

    from qwen3_asr_tpu.audio import load_wav, log_mel_spectrogram

    samples, sr = load_wav(args.audio)
    if sr != 16000:
        print(f"Error: audio must be 16 kHz, got {sr}", file=sys.stderr)
        return 1
    mel = log_mel_spectrogram(samples, fa.mel_filters)
    np.save(os.path.join(args.output, "fa_mel.npy"), mel)

    from qwen3_asr_tpu.models.encoder import encode_audio

    feats = np.asarray(
        encode_audio(fa.params["encoder"], fa.cfg.encoder, mel), np.float32)
    np.save(os.path.join(args.output, "fa_audio_features.npy"), feats)

    dcfg = fa.cfg.decoder
    text_tokens, _ = fa.tokenize_with_timestamps(args.text, args.language)
    n_pads = get_feat_extract_output_lengths(mel.shape[1])
    prompt = build_aligner_prompt(text_tokens, n_pads, dcfg)
    np.save(os.path.join(args.output, "fa_prompt_tokens.npy"),
            np.asarray(prompt, np.int32))

    h = nar_forward(fa.params["decoder"], dcfg, jnp.asarray(prompt),
                    jnp.asarray(feats, jnp.float32), jnp.int32(feats.shape[0]),
                    audio_offset=1)
    logits = np.asarray(classify_logits(fa.params["decoder"], dcfg, h),
                        np.float32)
    ts_id = fa.cfg.timestamp_token_id
    ts_pos = [i for i, t in enumerate(prompt) if t == ts_id]
    ts_logits = logits[ts_pos]
    np.save(os.path.join(args.output, "fa_ts_logits.npy"), ts_logits)
    np.save(os.path.join(args.output, "fa_classes.npy"),
            np.argmax(ts_logits, axis=-1).astype(np.int32))
    print(f"fa: mel {mel.shape}, features {feats.shape}, "
          f"{len(ts_pos)} ts positions -> {args.output}", file=sys.stderr)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-f", "--audio", help="16 kHz WAV (optional)")
    p.add_argument("--mel-npy", help="precomputed mel.npy instead of audio")
    p.add_argument("-o", "--output", required=True, help="output directory")
    p.add_argument("--tokens", default="",
                   help="comma-separated decoder token ids "
                        "(default: audio_start, 3x audio_pad, audio_end — "
                        "the reference golden sequence)")
    p.add_argument("--aligner", action="store_true",
                   help="forced-aligner GGUF: dump fa_audio_features.npy + "
                        "fa_ts_logits.npy/fa_classes.npy for the --text "
                        "prompt (reference: forced_aligner.cpp:1088-1169)")
    p.add_argument("--text", default="",
                   help="reference transcript for --aligner dumps")
    p.add_argument("--language", default="",
                   help="alignment language ('korean' enables dict split)")
    p.add_argument("--platform", default="")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from qwen3_asr_tpu.audio import generate_mel_filters, load_wav, log_mel_spectrogram
    from qwen3_asr_tpu.models.debug import decoder_debug
    from qwen3_asr_tpu.models.encoder import encode_audio
    from qwen3_asr_tpu.runtime.params import load_asr_model

    if args.aligner:
        return _dump_aligner(args)

    os.makedirs(args.output, exist_ok=True)
    cfg, params, _, _ = load_asr_model(args.model, dtype=jnp.float32)

    if args.mel_npy:
        mel = np.load(args.mel_npy).astype(np.float32)
    elif args.audio:
        samples, sr = load_wav(args.audio)
        if sr != 16000:
            print(f"Error: audio must be 16 kHz, got {sr}", file=sys.stderr)
            return 1
        mel = log_mel_spectrogram(samples, generate_mel_filters())
    else:
        mel = None

    if mel is not None:
        np.save(os.path.join(args.output, "mel.npy"), mel)
        feats = np.asarray(
            encode_audio(params["encoder"], cfg.encoder, mel), np.float32
        )
        np.save(os.path.join(args.output, "audio_features.npy"), feats)
        print(f"mel {mel.shape}, audio_features {feats.shape}", file=sys.stderr)

    if args.tokens:
        tokens = [int(t) for t in args.tokens.split(",")]
    else:
        d = cfg.decoder
        tokens = [d.audio_start_token_id] + [d.audio_pad_token_id] * 3 + [
            d.audio_end_token_id
        ]
    dbg = decoder_debug(params["decoder"], cfg.decoder, np.asarray(tokens))
    np.save(os.path.join(args.output, "decoder_logits.npy"), dbg["logits"])
    for name, arr in dbg.items():
        np.save(os.path.join(args.output, f"{name}.npy"), arr)
    print(f"decoder intermediates for tokens {tokens} -> {args.output}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
