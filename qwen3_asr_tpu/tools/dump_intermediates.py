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
