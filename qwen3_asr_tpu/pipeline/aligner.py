"""Forced-alignment pipeline: audio + transcript -> word timestamps.

API mirrors the reference ForcedAligner (forced_aligner.h:207-211):
load_model, load_korean_dict, align(path|samples, text, language) -> words
with (start, end) seconds.

The decoder pass is a single jitted non-autoregressive causal forward with
the classification head over all positions (reference:
forced_aligner.cpp:1088-1169); timestamp extraction (argmax at <ts>
positions), LIS repair and word pairing run on the host — they are O(words)
string/DP work (forced_aligner.cpp:1280-1306, 1183-1265).
"""

from __future__ import annotations

import dataclasses
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.audio import generate_mel_filters, load_wav, log_mel_spectrogram
from qwen3_asr_tpu.config import SAMPLE_RATE, AlignerModelConfig
from qwen3_asr_tpu.models.decoder import classify_logits
from qwen3_asr_tpu.models.encoder import encode_audio
from qwen3_asr_tpu.models.generate import nar_forward
from qwen3_asr_tpu.runtime.params import init_aligner_params, load_aligner_model
from qwen3_asr_tpu.runtime.profiler import timer
from qwen3_asr_tpu.text import (
    BPETokenizer,
    build_aligner_prompt,
    classes_to_timestamps,
    fix_timestamp_classes,
    get_feat_extract_output_lengths,
    load_korean_dict,
    pair_words,
    tokenize_korean,
)


@dataclasses.dataclass
class AlignedWord:
    word: str
    start: float
    end: float


@dataclasses.dataclass
class AlignmentResult:
    success: bool = False
    words: list = dataclasses.field(default_factory=list)
    error_msg: str = ""
    t_mel_ms: float = 0.0
    t_encode_ms: float = 0.0
    t_decode_ms: float = 0.0
    t_total_ms: float = 0.0
    # batch provenance (align_batch): stage times on a batched result are
    # whole-batch dispatch times (the work is shared — same timing surface
    # as the reference's per-run fields, forced_aligner.h:28-32, with the
    # batch context attached so serving logs keep per-request truth)
    batch_size: int = 1
    batch_index: int = 0


@functools.partial(jax.jit, static_argnames=("cfg", "audio_offset"))
def _nar_classify(dec_params, cfg, tokens, n_valid, audio, n_audio,
                  audio_offset):
    """-> per-position argmax class [P] int32. The argmax runs on device:
    reading back [P, 5000] f32 logits would move ~50 MB per 92 s clip
    through the host link for information worth 4 bytes/position."""
    h = nar_forward(dec_params, cfg, tokens, audio, n_audio, audio_offset,
                    n_valid=n_valid)
    return jnp.argmax(classify_logits(dec_params, cfg, h), axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg", "audio_offset"))
def _nar_classify_batch(dec_params, cfg, tokens, n_valid, audio, n_audio,
                        audio_offset):
    """Batched NAR classify: [B, P] prompts + [B, N, h] features -> [B, P]
    argmax classes, ONE dispatch for the whole batch."""
    return jax.vmap(
        lambda tk, nv, au, na: jnp.argmax(
            classify_logits(
                dec_params, cfg,
                nar_forward(dec_params, cfg, tk, au, na, audio_offset,
                            n_valid=nv),
            ), axis=-1)
    )(tokens, n_valid, audio, n_audio)


class ForcedAligner:
    """Word-level timestamp alignment (model: Qwen3-ForcedAligner-0.6B)."""

    def __init__(self, dtype=jnp.bfloat16, quantize=False):
        # quantize: False (dense bf16), "int8pc"/True (per-output-channel
        # int8 layer matmuls — the NAR classify pass, the reference's
        # single biggest hotspot at 12,998 ms (README.md:137), halves its
        # layer-weight HBM traffic AND rides the v5e's 2x-rate int8 MXU;
        # the classify head and embedding stay dense), "q8_0" (GGUF block
        # semantics via the Pallas kernels), or "auto" (int8pc unless the
        # GGUF already shipped quantized leaves). "int4" maps to int8pc:
        # the int4 stream is a megakernel decode format and the FA is one
        # NAR pass — there is no decode loop to ride it.
        self.dtype = dtype
        if quantize is True:
            quantize = "int8pc"
        if quantize == "int4":
            quantize = "int8pc"
        if quantize not in (False, "", None, "auto", "int8pc", "q8_0"):
            raise ValueError(f"quantize must be int8pc/q8_0/auto, got "
                             f"{quantize!r}")
        self.quantize = quantize or ""
        self.cfg: AlignerModelConfig | None = None
        self.params = None
        self.tokenizer: BPETokenizer | None = None
        self.ko_dict: set[str] = set()
        self.error_msg = ""

    def _resolve_quantize(self) -> str:
        """'auto' -> int8pc for dense weights, no-op when the GGUF already
        shipped int8 blocks (same policy as Qwen3ASR._resolve_quantize)."""
        if self.quantize != "auto":
            return self.quantize
        from qwen3_asr_tpu.runtime.params import _DEC_QUANT_KEYS

        layers = self.params["decoder"]["layers"]
        already = any(isinstance(layers.get(k), dict) for k in _DEC_QUANT_KEYS)
        return "" if already else "int8pc"

    def _prepare_decoder(self) -> None:
        """Quantize (optional) + fuse the decoder tree in place. The NAR
        forward is the ASR decoder's prefill path, so the int8pc leaves are
        executed by the same pc_matmul code the ASR pipeline gates."""
        from qwen3_asr_tpu.runtime.params import (
            fuse_decoder_params,
            quantize_decoder_params,
        )

        quantize = self._resolve_quantize()
        if quantize:
            # lm_head=False: the FA head is `classify_w` (dense, ~10 MB);
            # an int8 copy of the 152k-row tied lm head would be dead HBM
            self.params["decoder"] = quantize_decoder_params(
                self.params["decoder"], quantize, lm_head=False)
        self.params["decoder"] = fuse_decoder_params(self.params["decoder"])

    def load_model(self, model_path: str) -> bool:
        try:
            from qwen3_asr_tpu.runtime.params import host_staging, ship_to_device

            with host_staging():  # transforms on host; ONE device_put
                self.cfg, self.params, vocab, merges = load_aligner_model(
                    model_path, self.dtype
                )
                self.tokenizer = BPETokenizer(vocab, merges)
                self.mel_filters = generate_mel_filters()
                self._prepare_decoder()
            self.params = ship_to_device(self.params)
            return True
        except Exception as e:
            self.error_msg = f"Failed to load model: {e}"
            return False

    def load_random(self, cfg: AlignerModelConfig, seed: int = 0,
                    vocab=None, merges=None) -> None:
        from qwen3_asr_tpu.runtime.params import host_staging, ship_to_device

        self.cfg = cfg
        with host_staging():
            self.params = init_aligner_params(cfg, seed, self.dtype)
            self._prepare_decoder()
        self.params = ship_to_device(self.params)
        self.tokenizer = BPETokenizer(vocab or [], merges or [])
        self.mel_filters = generate_mel_filters()

    def load_korean_dict(self, dict_path: str) -> bool:
        try:
            self.ko_dict = load_korean_dict(dict_path)
            print(f"Korean dictionary loaded: {len(self.ko_dict)} words", file=sys.stderr, flush=True)
            return True
        except OSError:
            return False

    # -- tokenization with timestamp slots ----------------------------------

    def tokenize_with_timestamps(
        self, text: str, language: str
    ) -> tuple[list[int], list[str]]:
        """Per-word BPE + 2 timestamp tokens appended per word
        (forced_aligner.cpp:1564-1609)."""
        if language == "korean" and self.ko_dict:
            raw_words = tokenize_korean(text, self.ko_dict)
        else:
            raw_words = text.split()
        ts_id = self.cfg.timestamp_token_id
        tokens: list[int] = []
        for w in raw_words:
            tokens.extend(self.tokenizer.encode_piece(w))
            tokens.append(ts_id)
            tokens.append(ts_id)
        return tokens, raw_words

    # -- alignment -----------------------------------------------------------

    def align_batch(self, audios: list, texts: list, language: str = "",
                    mel_bucket: int = 500) -> list:
        """Align several (audio, text) pairs as batched device programs:
        one mel+encoder dispatch per length bucket, ONE NAR classify
        dispatch for the whole batch (the TPU-native answer to running
        many CLI alignments; the reference is strictly one-shot)."""
        from qwen3_asr_tpu.audio.mel import (
            log_mel_spectrogram_padded_batch,
            num_mel_frames,
        )
        from qwen3_asr_tpu.models.encoder import encode_audio_padded_batch

        assert len(audios) == len(texts)
        results = [AlignmentResult() for _ in audios]
        if self.params is None:
            for r in results:
                r.error_msg = "Model not loaded"
            return results
        dcfg = self.cfg.decoder
        t_total = time.perf_counter()

        samples_list = []
        for audio in audios:
            if isinstance(audio, str):
                samples, sr = load_wav(audio, raw_int16=True)
                if sr != SAMPLE_RATE:
                    raise ValueError(f"Audio must be 16kHz, got {sr} Hz")
            else:
                samples = np.asarray(audio)
                if samples.dtype != np.int16:
                    samples = samples.astype(np.float32)
            samples_list.append(samples)

        chunk = self.cfg.encoder.chunk_size
        bf = max(chunk, -(-mel_bucket // chunk) * chunk)

        # batched frontend per length bucket
        feats_map: dict[int, tuple] = {}
        true_frames = [num_mel_frames(len(s)) for s in samples_list]
        groups: dict[int, list[int]] = {}
        for i, nf in enumerate(true_frames):
            groups.setdefault(-(-nf // bf) * bf, []).append(i)
        t_mel_ms = t_encode_ms = 0.0
        for idxs in groups.values():
            t0 = time.perf_counter()
            mel_b, n_true = log_mel_spectrogram_padded_batch(
                [samples_list[i] for i in idxs], self.mel_filters, bf)
            jax.block_until_ready(mel_b)
            t_mel_ms += (time.perf_counter() - t0) * 1000
            t0 = time.perf_counter()
            feats_b, n_audio_l = encode_audio_padded_batch(
                self.params["encoder"], self.cfg.encoder, mel_b, n_true)
            jax.block_until_ready(feats_b)
            t_encode_ms += (time.perf_counter() - t0) * 1000
            for j, i in enumerate(idxs):
                feats_map[i] = (feats_b[j], n_audio_l[j])

        # prompts (pad count from the TRUE mel length per item)
        B = len(audios)
        token_lists, word_lists = [], []
        for i, text in enumerate(texts):
            text_tokens, words = self.tokenize_with_timestamps(text, language)
            n_pads = get_feat_extract_output_lengths(true_frames[i])
            token_lists.append(build_aligner_prompt(text_tokens, n_pads, dcfg))
            word_lists.append(words)

        pbucket = 128
        P = -(-max(len(tl) for tl in token_lists) // pbucket) * pbucket
        toks = np.full((B, P), dcfg.pad_token_id % dcfg.vocab_size, np.int32)
        n_valid = np.zeros((B,), np.int32)
        n_audio_arr = np.zeros((B,), np.int32)
        cap = max(int(feats_map[i][0].shape[0]) for i in range(B))
        audio_padded = jnp.zeros((B, cap, dcfg.hidden_size), self.dtype)
        for i in range(B):
            toks[i, : len(token_lists[i])] = token_lists[i]
            n_valid[i] = len(token_lists[i])
            n_audio_arr[i] = feats_map[i][1]
            feats = feats_map[i][0]
            audio_padded = audio_padded.at[i, : feats.shape[0]].set(
                feats.astype(self.dtype))

        t0 = time.perf_counter()
        pred = np.asarray(_nar_classify_batch(
            self.params["decoder"], dcfg, jnp.asarray(toks),
            jnp.asarray(n_valid), audio_padded, jnp.asarray(n_audio_arr), 1,
        ))
        t_decode_ms = (time.perf_counter() - t0) * 1000

        ts_id = self.cfg.timestamp_token_id
        for i, r in enumerate(results):
            ts_positions = [j for j, t in enumerate(token_lists[i])
                            if t == ts_id]
            classes = [int(pred[i, j]) for j in ts_positions]
            fixed = fix_timestamp_classes(classes)
            timestamps = classes_to_timestamps(
                fixed, self.cfg.timestamp_segment_time_ms)
            duration = len(samples_list[i]) / SAMPLE_RATE
            r.words = [AlignedWord(**w) for w in
                       pair_words(word_lists[i], timestamps, duration)]
            r.success = True
            # stage times are whole-batch dispatch times (shared work);
            # t_total_ms = wall time from batch start until THIS item's
            # result is ready (includes its host post-processing)
            r.t_mel_ms = t_mel_ms
            r.t_encode_ms = t_encode_ms
            r.t_decode_ms = t_decode_ms
            r.batch_size = B
            r.batch_index = i
            r.t_total_ms = (time.perf_counter() - t_total) * 1000
        return results

    def align(self, audio, text: str, language: str = "",
              mel_bucket: int = 0, fused: bool = False) -> AlignmentResult:
        """`mel_bucket` > 0 (frames, rounded to the 100-frame chunk): pad
        the mel/encoder shapes to a bucket so arbitrary audio lengths reuse
        a bounded set of compiled programs (serving mode; same contract as
        TranscribeParams.mel_bucket). `fused=True`: mel + encoder + NAR
        classify as ONE device round trip (exact shapes — fixed-length
        workloads; FA compute is tiny, dispatch latency dominates)."""
        from qwen3_asr_tpu.models.e2e import PreparedPCM

        result = AlignmentResult()
        if self.params is None:
            result.error_msg = "Model not loaded"
            return result

        if isinstance(audio, str):
            try:
                samples, sr = load_wav(audio, raw_int16=True)
            except Exception as e:
                result.error_msg = f"Failed to load audio file: {e}"
                return result
            if sr != SAMPLE_RATE:
                result.error_msg = f"Audio must be 16kHz, got {sr} Hz"
                return result
        elif isinstance(audio, PreparedPCM):
            # pre-staged device buffer (combined mode); only the fused
            # exact-shape leg can consume the staged upload
            samples = audio if (fused and not mel_bucket) else audio.samples
        else:
            samples = np.asarray(audio)
            if samples.dtype != np.int16:  # int16 PCM scales on device
                samples = samples.astype(np.float32)

        t_total = time.perf_counter()
        audio_duration = len(samples) / SAMPLE_RATE
        dcfg = self.cfg.decoder

        if fused and not mel_bucket:
            from qwen3_asr_tpu.audio.mel import num_mel_frames
            from qwen3_asr_tpu.models.e2e import align_fused

            n_frames_true = num_mel_frames(len(samples))
            n_pads = get_feat_extract_output_lengths(n_frames_true)
            text_tokens, words = self.tokenize_with_timestamps(text, language)
            input_tokens = build_aligner_prompt(text_tokens, n_pads, dcfg)
            with timer("fa.fused"):
                pred = align_fused(self.params, self.cfg, samples,
                                   self.mel_filters, input_tokens)
            ts_id = self.cfg.timestamp_token_id
            ts_positions = [i for i, t in enumerate(input_tokens)
                            if t == ts_id]
            classes = [int(pred[i]) for i in ts_positions]
            fixed = fix_timestamp_classes(classes)
            timestamps = classes_to_timestamps(
                fixed, self.cfg.timestamp_segment_time_ms)
            result.words = [AlignedWord(**w) for w in
                            pair_words(words, timestamps, audio_duration)]
            result.success = True
            result.t_total_ms = (time.perf_counter() - t_total) * 1000
            result.t_decode_ms = result.t_total_ms
            return result

        bucket = mel_bucket
        if bucket > 0:
            chunk = self.cfg.encoder.chunk_size
            bucket = -(-bucket // chunk) * chunk

        t0 = time.perf_counter()
        with timer("fa.mel"):
            if bucket:
                from qwen3_asr_tpu.audio.mel import log_mel_spectrogram_padded

                mel, n_frames_true = log_mel_spectrogram_padded(
                    samples, self.mel_filters, bucket
                )
            else:
                mel = log_mel_spectrogram(samples, self.mel_filters,
                                          as_numpy=False)
                n_frames_true = int(mel.shape[1])
        result.t_mel_ms = (time.perf_counter() - t0) * 1000

        t0 = time.perf_counter()
        with timer("fa.encode"):
            if bucket:
                from qwen3_asr_tpu.models.encoder import encode_audio_padded

                audio_features, n_audio = encode_audio_padded(
                    self.params["encoder"], self.cfg.encoder, mel,
                    n_frames_true,
                )
            else:
                audio_features = encode_audio(
                    self.params["encoder"], self.cfg.encoder, mel
                )
                n_audio = int(audio_features.shape[0])
            audio_features.block_until_ready()
        result.t_encode_ms = (time.perf_counter() - t0) * 1000

        # pad count via the HF formula on the TRUE mel length — must equal
        # the encoder output length (forced_aligner.cpp:1670)
        n_pads = get_feat_extract_output_lengths(n_frames_true)

        text_tokens, words = self.tokenize_with_timestamps(text, language)
        input_tokens = build_aligner_prompt(text_tokens, n_pads, dcfg)
        audio_offset = 1  # right after <audio_start> (forced_aligner.cpp:1331-1338)

        # bucket the prompt length so one compiled program serves a range
        # of transcript lengths (recompiles are expensive)
        pbucket = 128
        n_real = len(input_tokens)
        P = -(-n_real // pbucket) * pbucket
        toks = np.full(P, dcfg.pad_token_id % dcfg.vocab_size, np.int32)
        toks[:n_real] = input_tokens
        if bucket:
            # feats are already bucket-padded; the audio splice reads only
            # the first n_audio rows
            audio_padded = audio_features
        else:
            cap = P - (n_real - n_audio)
            audio_padded = jnp.zeros((cap, dcfg.hidden_size),
                                     audio_features.dtype)
            audio_padded = jax.lax.dynamic_update_slice(
                audio_padded, audio_features, (0, 0)
            )

        t0 = time.perf_counter()
        with timer("fa.decode"):
            pred = _nar_classify(
                self.params["decoder"], dcfg,
                jnp.asarray(toks), jnp.int32(n_real),
                audio_padded, jnp.int32(n_audio), audio_offset,
            )
            pred = np.asarray(pred)[:n_real]
        result.t_decode_ms = (time.perf_counter() - t0) * 1000

        # host post-processing
        ts_id = self.cfg.timestamp_token_id
        ts_positions = [i for i, t in enumerate(input_tokens) if t == ts_id]
        classes = [int(pred[i]) for i in ts_positions]
        fixed = fix_timestamp_classes(classes)
        timestamps = classes_to_timestamps(
            fixed, self.cfg.timestamp_segment_time_ms
        )
        result.words = [
            AlignedWord(**w) for w in pair_words(words, timestamps, audio_duration)
        ]
        result.success = True
        result.t_total_ms = (time.perf_counter() - t_total) * 1000
        return result
