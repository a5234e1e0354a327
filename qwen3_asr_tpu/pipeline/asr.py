"""High-level ASR pipeline: audio file/samples -> transcript.

API mirrors the reference Qwen3ASR (qwen3_asr.h:66-79): load_model,
transcribe(path|samples, params) -> result with text/tokens/timings, a
progress callback hook, and the same error-message result surface.

Execution model (TPU-first, nothing like the reference's internals):
  mel (1 jit) -> encoder (1 jit per mel bucket) -> prefill + full greedy
  decode loop (1 jit per prompt bucket). Three device dispatches per
  utterance; the reference does O(tokens) graph rebuilds + host syncs
  (qwen3_asr.cpp:216-303).
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.audio import generate_mel_filters, load_wav, log_mel_spectrogram
from qwen3_asr_tpu.config import SAMPLE_RATE, ASRModelConfig
from qwen3_asr_tpu.models.encoder import encode_audio
from qwen3_asr_tpu.models.generate import generate_greedy
from qwen3_asr_tpu.runtime.params import init_asr_params, load_asr_model
from qwen3_asr_tpu.runtime.profiler import timer
from qwen3_asr_tpu.text import BPETokenizer, build_asr_prompt
from qwen3_asr_tpu.text.prompt import audio_start_pos


@dataclasses.dataclass
class TranscribeParams:
    max_tokens: int = 1024
    language: str = ""            # accepted for CLI parity; unused by the
                                  # model (reference: qwen3_asr.cpp:211)
    system_prompt: str = ""
    print_progress: bool = False
    print_timing: bool = True
    # shape-bucketing granularity for the prompt length (tokens)
    prompt_bucket: int = 128
    # mel frame-count bucket (multiple of the 100-frame chunk; 0 = exact
    # shapes). >0 bounds the number of compiled programs for arbitrary
    # audio lengths: every length in a bucket reuses one mel/encoder/decode
    # program (serving mode; the CLI default keeps exact shapes).
    mel_bucket: int = 0
    # fused=True: mel + encoder + prefill + the whole greedy loop as ONE
    # device round trip (models/e2e.py; exact shapes, no progress
    # callback — fixed-length workloads)
    fused: bool = False
    # spec_k>0: greedy self-speculation — draft k tokens per round through
    # the megakernel's weight stream, verify the block in one int8pc
    # XLA pass (models/generate.py::generate_greedy_spec). Output equals
    # the int8pc XLA greedy sequence regardless of draft quality; needs a
    # quantized model with the megakernel packed. Overrides fused/progress.
    spec_k: int = 0
    # temperature>0: sampled decoding (models/generate.py::generate_sample)
    # instead of greedy argmax — a serving-surface extension (the reference
    # is greedy-only, qwen3_asr.cpp:305-317; the OpenAI transcription API
    # exposes `temperature`). top_k=0 / top_p=1.0 disable those filters.
    # Overrides fused/spec/streaming (one whole-loop sampled program).
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    seed: int = 0                 # PRNG seed for sampled decoding


@dataclasses.dataclass
class TranscribeResult:
    success: bool = False
    text: str = ""
    tokens: list = dataclasses.field(default_factory=list)
    error_msg: str = ""
    t_mel_ms: float = 0.0
    t_encode_ms: float = 0.0
    t_decode_ms: float = 0.0
    t_total_ms: float = 0.0


class Qwen3ASR:
    """End-to-end speech-to-text (model: Qwen3-ASR-0.6B GGUF)."""

    def __init__(self, dtype=jnp.bfloat16, quantize=False, kv_int8=False,
                 kv_cache: str | None = None):
        self.dtype = dtype
        # quantize: False (dense), True/"q8_0" (GGUF Q8_0 semantics, Pallas
        # dequant kernels — BASELINE.json config 4), "int8pc" (per-channel
        # W8A8 on the int8 MXU path), or "auto" (int8pc for dense weights,
        # no-op when the GGUF already ships int8 blocks). Both int8 modes
        # halve the HBM weight traffic that bounds decode speed.
        self.quantize = "q8_0" if quantize is True else quantize
        # kv_int8: int8 KV cache (per-(row, head) scales). With the decode
        # megakernel this halves the context-proportional HBM term:
        # 931 vs 817 tok/s on the 92 s workload (v5e). Off by default —
        # the reference keeps an F16 cache (text_decoder.cpp:337-386) and
        # KV quantization slightly perturbs logits.
        self.kv_int8 = bool(kv_int8)
        # kv_cache: explicit dtype name ("bf16" / "int8" / "int4")
        # overriding kv_int8. int4 is the megakernel's nibble-packed
        # stream — the context-proportional HBM term drops to a quarter
        # of bf16's; off the megakernel it runs as int8. ~4x int8's KV
        # quantization error (drift-gated; WER-gate it on real weights
        # before shipping, tools/validate_real_weights.py --kv-int4).
        if kv_cache not in (None, "bf16", "int8", "int4"):
            raise ValueError(f"kv_cache must be bf16/int8/int4, got "
                             f"{kv_cache!r}")
        self.kv_cache = kv_cache
        self.cfg: ASRModelConfig | None = None
        self.params = None
        self.tokenizer: BPETokenizer | None = None
        self._progress_cb: Callable[[int, int], None] | None = None
        self._token_cb: Callable[[int], None] | None = None
        self.error_msg = ""

    # -- loading -----------------------------------------------------------

    def load_model(self, model_path: str) -> bool:
        try:
            t0 = time.perf_counter()
            from qwen3_asr_tpu.runtime.params import host_staging, ship_to_device

            with host_staging():  # transforms on host; ONE device_put below
                self.cfg, self.params, vocab, merges = load_asr_model(
                    model_path, self.dtype
                )
                self.tokenizer = BPETokenizer(vocab, merges)
                self.mel_filters = generate_mel_filters()
                quantize = self._resolve_quantize()
                if quantize:
                    from qwen3_asr_tpu.runtime.params import (
                        quantize_decoder_params,
                    )

                    # "int4" is a decode-stream mode: the XLA paths
                    # (prefill, batched fallback) still run int8pc; only
                    # the megakernel pack is int4
                    self.params["decoder"] = quantize_decoder_params(
                        self.params["decoder"],
                        "int8pc" if quantize == "int4" else quantize,
                    )
                from qwen3_asr_tpu.runtime.params import fuse_decoder_params

                self.params["decoder"] = fuse_decoder_params(
                    self.params["decoder"])
                self._maybe_pack_megakernel(quantize)
            self.params = ship_to_device(self.params)
            print(
                f"Model loaded in {int((time.perf_counter() - t0) * 1000)} ms",
                file=sys.stderr, flush=True,
            )
            return True
        except Exception as e:  # same bool+error surface as the reference
            self.error_msg = f"Failed to load model: {e}"
            return False

    def load_random(self, cfg: ASRModelConfig, seed: int = 0,
                    vocab: list[str] | None = None,
                    merges: list[str] | None = None) -> None:
        """Synthetic weights (benchmarks / tests without model files)."""
        from qwen3_asr_tpu.runtime.params import host_staging, ship_to_device

        self.cfg = cfg
        with host_staging():  # transforms on host; ONE device_put below
            self.params = init_asr_params(cfg, seed, self.dtype)
            quantize = self._resolve_quantize()
            if quantize:
                from qwen3_asr_tpu.runtime.params import (
                    quantize_decoder_params,
                )

                self.params["decoder"] = quantize_decoder_params(
                    self.params["decoder"],
                    "int8pc" if quantize == "int4" else quantize,
                )
            from qwen3_asr_tpu.runtime.params import fuse_decoder_params

            self.params["decoder"] = fuse_decoder_params(
                self.params["decoder"])
            self._maybe_pack_megakernel(quantize)
        self.params = ship_to_device(self.params)
        self.tokenizer = BPETokenizer(vocab or [], merges or [])
        self.mel_filters = generate_mel_filters()

    def set_progress_callback(self, cb: Callable[[int, int], None]) -> None:
        self._progress_cb = cb

    def set_token_callback(self, cb: Callable[[int], None] | None) -> None:
        """Per-token-id callback during streaming decode (`cb(token_id)`).
        Setting it routes transcribe() through the streaming path; the
        serving layer's SSE text deltas ride this. Call with None to
        clear. Device work is single-threaded (one transcription at a
        time), so setting it around a call is race-free."""
        self._token_cb = cb

    def _maybe_pack_megakernel(self, quantize: str) -> None:
        """int8pc/int4 + fused => also pack the whole-step decode
        megakernel (ops/megakernel.py). generate_greedy picks it up on
        TPU; every other path ignores the extra 'mega' entry. "int4"
        nibble-packs the decode weight stream (HALF the HBM bytes/step,
        per-512-row-group scales) — prefill stays int8pc."""
        if quantize not in ("int8pc", "int4"):
            return
        try:
            from qwen3_asr_tpu.ops.megakernel import pack_megakernel_params

            self.params["decoder"]["mega"] = pack_megakernel_params(
                self.params["decoder"], self.cfg.decoder,
                int4=quantize == "int4")
        except ValueError:
            pass  # layout not eligible (e.g. unfused)

    def _resolve_quantize(self) -> str:
        """'auto' -> int8pc for dense weights, no-op when the GGUF already
        shipped int8 blocks (quantized leaves are dicts)."""
        if self.quantize != "auto":
            return self.quantize or ""
        from qwen3_asr_tpu.runtime.params import _DEC_QUANT_KEYS

        layers = self.params["decoder"]["layers"]
        already = any(isinstance(layers.get(k), dict) for k in _DEC_QUANT_KEYS)
        return "" if already else "int8pc"

    def _cache_dtype(self):
        # bf16 default. Historical note: on the XLA decode path int8 KV
        # measured SLOWER (507 vs 591 tok/s — quantize-on-write + dequant
        # cost more than the bytes saved); the megakernel reads the int8
        # rows natively and flips the sign (931 vs 817 tok/s), so kv_int8
        # is worth it exactly when the megakernel is active.
        if self.kv_cache is not None:
            return {"bf16": jnp.bfloat16, "int8": jnp.int8,
                    "int4": jnp.int4}[self.kv_cache]
        return jnp.int8 if self.kv_int8 else jnp.bfloat16

    # -- transcription -------------------------------------------------------

    def transcribe(self, audio, params: TranscribeParams | None = None) -> TranscribeResult:
        """`audio`: path to 16 kHz mono WAV, or float32 sample array."""
        params = params or TranscribeParams()
        result = TranscribeResult()
        if self.params is None:
            result.error_msg = "Model not loaded"
            return result

        from qwen3_asr_tpu.models.e2e import PreparedPCM

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
            samples = audio  # pre-staged device buffer (combined mode)
        else:
            samples = np.asarray(audio)
            if samples.dtype != np.int16:  # int16 PCM scales on device
                samples = samples.astype(np.float32)

        return self._transcribe_samples(samples, params, result)

    def _transcribe_samples(self, samples, params, result) -> TranscribeResult:
        dcfg = self.cfg.decoder
        t_total = time.perf_counter()

        sampled = params.temperature > 0.0
        fused_path = (params.fused and params.mel_bucket == 0
                      and params.spec_k == 0 and not sampled
                      and not (self._progress_cb or self._token_cb
                               or params.print_progress))
        if not fused_path and hasattr(samples, "samples"):
            samples = samples.samples  # PreparedPCM only helps fused legs

        if fused_path:
            from qwen3_asr_tpu.models.e2e import transcribe_fused

            sys_tokens = (self.tokenizer.encode(params.system_prompt)
                          if params.system_prompt else None)
            out, n_kept = transcribe_fused(
                self.params, self.cfg, samples, self.mel_filters,
                params.max_tokens, system_prompt_tokens=sys_tokens,
                cache_dtype=self._cache_dtype(),
            )
            result.tokens = [int(t) for t in out[:n_kept]]
            result.text = self.tokenizer.decode(result.tokens)
            result.success = True
            result.t_total_ms = (time.perf_counter() - t_total) * 1000
            result.t_decode_ms = result.t_total_ms
            if params.print_timing:
                print(f"\nTiming (fused single-dispatch):\n"
                      f"  Total: {result.t_total_ms:.0f} ms",
                      file=sys.stderr, flush=True)
            return result

        bucket_frames = params.mel_bucket
        if bucket_frames > 0:
            chunk = self.cfg.encoder.chunk_size
            bucket_frames = -(-bucket_frames // chunk) * chunk

        # 1. mel ------------------------------------------------------------
        t0 = time.perf_counter()
        with timer("mel_spectrogram"):
            if bucket_frames:
                from qwen3_asr_tpu.audio.mel import log_mel_spectrogram_padded

                mel, n_frames_true = log_mel_spectrogram_padded(
                    samples, self.mel_filters, bucket_frames
                )
            else:
                mel = log_mel_spectrogram(samples, self.mel_filters,
                                          as_numpy=False)
        result.t_mel_ms = (time.perf_counter() - t0) * 1000
        if params.print_progress:
            print(f"Mel spectrogram: [{mel.shape[0]}, {mel.shape[1]}]", file=sys.stderr, flush=True)

        # 2. encoder ----------------------------------------------------------
        t0 = time.perf_counter()
        with timer("audio_encoding"):
            if bucket_frames:
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
        if params.print_progress:
            print(f"Audio features: [{n_audio}, {audio_features.shape[1]}]", file=sys.stderr, flush=True)

        # 3. prompt + greedy decode -------------------------------------------
        sys_tokens = (
            self.tokenizer.encode(params.system_prompt)
            if params.system_prompt
            else None
        )
        prompt = build_asr_prompt(n_audio, dcfg, sys_tokens)
        offset = audio_start_pos(prompt, dcfg)
        n_prompt = len(prompt)
        if params.print_progress:
            print(f"Input tokens: {n_prompt}", file=sys.stderr, flush=True)

        bucket = params.prompt_bucket
        P = -(-n_prompt // bucket) * bucket
        toks = np.full(P, dcfg.pad_token_id, np.int32)
        toks[:n_prompt] = prompt
        if bucket_frames:
            # feats are already bucket-padded; the audio splice reads only
            # the first n_audio rows, so no re-padding copy is needed
            audio_padded = audio_features
        else:
            # pad audio rows to the bucketed pad-token capacity
            n_audio_cap = P - (n_prompt - n_audio)
            audio_padded = jnp.zeros(
                (n_audio_cap, dcfg.hidden_size), audio_features.dtype
            )
            audio_padded = jax.lax.dynamic_update_slice(
                audio_padded, audio_features, (0, 0)
            )

        t0 = time.perf_counter()
        use_spec = params.spec_k > 0 and not sampled
        if sampled and params.spec_k > 0:
            print("Note: temperature>0 — spec_k (greedy-exact speculation) "
                  "does not apply to sampled decoding; using the sampled "
                  "path.", file=sys.stderr, flush=True)
        if use_spec:
            # hard requirements stay errors; the soft long-audio limit
            # demotes to the plain path below
            from qwen3_asr_tpu.ops.support import has_pallas_tpu

            if ("mega" not in self.params["decoder"]
                    or not has_pallas_tpu()):
                result.error_msg = (
                    "spec_k needs a quantized model with the decode "
                    "megakernel (quantize='int8pc'/'auto'/'int4') on "
                    "a Pallas TPU backend")
                return result
            from qwen3_asr_tpu.ops.megakernel import mega_max_context

            S_spec = -(-(P + params.max_tokens + params.spec_k) // 128) * 128
            if S_spec > mega_max_context(self.params["decoder"]["mega"],
                                         dcfg, kv_i8=True):
                # past the draft stream's VMEM budget: the plain decode
                # path produces the same int8pc greedy sequence (at this
                # length it rides the streamed-KV megakernel) — degrade
                # to it instead of failing the transcription
                print("Note: spec_k disabled for this audio length "
                      "(context exceeds the megakernel's VMEM budget); "
                      "using the plain decode path.",
                      file=sys.stderr, flush=True)
                use_spec = False
        with timer("decode.generate"):
            if use_spec:
                # greedy self-speculation: exact int8pc-XLA greedy outputs,
                # weights read once per verify round instead of per token.
                # Requires the packed megakernel (draft stream) + int8 KV.
                if self._cache_dtype() is not jnp.int8:
                    # the verify pass's KV layout is int8; an explicit
                    # bf16/int4 cache setting cannot be honored here
                    print("Note: spec_k uses an int8 KV cache; the "
                          "configured kv_cache setting is ignored.",
                          file=sys.stderr, flush=True)
                from qwen3_asr_tpu.models.generate import (
                    generate_greedy_spec,
                )

                try:
                    out, n_kept, stats = generate_greedy_spec(
                        self.params["decoder"], dcfg,
                        jnp.asarray(toks), jnp.int32(n_prompt),
                        audio_padded, jnp.int32(n_audio), offset,
                        params.max_tokens, k=params.spec_k,
                    )
                except ValueError as e:  # e.g. megakernel VMEM budget
                    result.error_msg = str(e)
                    return result
                out, n_kept, stats = jax.device_get((out, n_kept, stats))
                result.tokens = [int(t) for t in out[: int(n_kept)]]
                if params.print_timing:  # diagnostic, honors --no-timing
                    drafted = max(int(stats["drafted"]), 1)
                    print(
                        f"spec: rounds={int(stats['rounds'])} "
                        f"accepted={int(stats['accepted'])}/{drafted} "
                        f"({int(stats['accepted']) / drafted:.0%})",
                        file=sys.stderr, flush=True,
                    )
            elif sampled:
                # sampled decoding: one whole-loop program (progress
                # callbacks are per-utterance here, not per-token — the
                # loop never returns to the host mid-generation)
                from qwen3_asr_tpu.models.generate import generate_sample

                if self._progress_cb or self._token_cb or params.print_progress:
                    print("Note: temperature>0 runs the whole sampled loop "
                          "in one dispatch; per-token progress is not "
                          "reported.", file=sys.stderr, flush=True)
                out, n_kept = generate_sample(
                    self.params["decoder"], dcfg,
                    jnp.asarray(toks), jnp.int32(n_prompt),
                    audio_padded, jnp.int32(n_audio), offset,
                    params.max_tokens,
                    jax.random.PRNGKey(params.seed),
                    temperature=float(params.temperature),
                    top_k=int(params.top_k), top_p=float(params.top_p),
                    cache_dtype=self._cache_dtype(),
                )
                out, n_kept = jax.device_get((out, n_kept))
                result.tokens = [int(t) for t in out[: int(n_kept)]]
            elif self._progress_cb or self._token_cb or params.print_progress:
                # streaming path: one dispatch per token, per-token progress
                # (the reference's callback contract, qwen3_asr.cpp:264,289)
                from qwen3_asr_tpu.models.generate import generate_greedy_streaming

                def on_token(i, total):
                    if self._progress_cb:
                        self._progress_cb(i, total)
                    if params.print_progress and i % 10 == 0:
                        print(f"Generated {i} tokens...",
                              file=sys.stderr, flush=True)

                result.tokens = generate_greedy_streaming(
                    self.params["decoder"], dcfg,
                    jnp.asarray(toks), jnp.int32(n_prompt),
                    audio_padded, jnp.int32(n_audio), offset,
                    params.max_tokens, on_token=on_token,
                    on_token_id=self._token_cb,
                    cache_dtype=self._cache_dtype(),
                )
            else:
                out, n_kept = generate_greedy(
                    self.params["decoder"], dcfg,
                    jnp.asarray(toks), jnp.int32(n_prompt),
                    audio_padded, jnp.int32(n_audio), offset,
                    params.max_tokens,
                    cache_dtype=self._cache_dtype(),
                )
                out, n_kept = jax.device_get((out, n_kept))  # one fetch
                result.tokens = [int(t) for t in out[: int(n_kept)]]
        result.t_decode_ms = (time.perf_counter() - t0) * 1000
        result.text = self.tokenizer.decode(result.tokens)
        result.success = True
        result.t_total_ms = (time.perf_counter() - t_total) * 1000

        if params.print_timing:
            print(
                "\nTiming:\n"
                f"  Mel spectrogram: {result.t_mel_ms:.0f} ms\n"
                f"  Audio encoding:  {result.t_encode_ms:.0f} ms\n"
                f"  Text decoding:   {result.t_decode_ms:.0f} ms\n"
                f"  Total:           {result.t_total_ms:.0f} ms\n"
                f"  Tokens generated: {len(result.tokens)}",
                file=sys.stderr, flush=True,
            )
        return result

    # -- batched multi-file transcription (BASELINE.json config 5) ---------

    def transcribe_batch(
        self,
        audios: list,
        params: TranscribeParams | None = None,
        mesh=None,
    ) -> list[TranscribeResult]:
        """Transcribe several utterances in one batched decode.

        All prompts pad to a common bucket; generation runs as a single
        vmapped program. With a `dp x tp` mesh (parallel/mesh.py) and the
        decoder params dp-replicated/tp-sharded, utterances shard over
        chips via pure data parallelism over ICI — the TPU-native analog
        of running many CLI processes.
        """
        from qwen3_asr_tpu.parallel.mesh import batched_transcribe_step

        params = params or TranscribeParams()
        results = [TranscribeResult() for _ in audios]
        dcfg = self.cfg.decoder
        t_total = time.perf_counter()

        samples_list: list = [None] * len(audios)
        for i, (audio, result) in enumerate(zip(audios, results)):
            if isinstance(audio, str):
                samples, sr = load_wav(audio, raw_int16=True)
                if sr != SAMPLE_RATE:
                    result.error_msg = f"Audio must be 16kHz, got {sr} Hz"
                    continue
            else:
                samples = np.asarray(audio)
                if samples.dtype != np.int16:  # int16 PCM scales on device
                    samples = samples.astype(np.float32)
            samples_list[i] = samples

        feats_list = frontend_feats_batch(self, samples_list,
                                          params.mel_bucket)

        valid = [i for i, f in enumerate(feats_list) if f is not None]
        if not valid:
            return results

        prompts, offsets = [], []
        for i in valid:
            n_audio = feats_list[i][1]
            prompt = build_asr_prompt(n_audio, dcfg)
            prompts.append(prompt)
            offsets.append(audio_start_pos(prompt, dcfg))
        assert len(set(offsets)) == 1, "audio offset is template-fixed"

        bucket = params.prompt_bucket
        P = -(-max(len(p) for p in prompts) // bucket) * bucket
        B = len(valid)
        toks = np.full((B, P), dcfg.pad_token_id, np.int32)
        n_prompt = np.zeros((B,), np.int32)
        n_audio_arr = np.zeros((B,), np.int32)
        cap = P - (len(prompts[0]) - feats_list[valid[0]][1])
        cap = max(cap, max(int(feats_list[i][0].shape[0]) for i in valid))
        audio_padded = jnp.zeros((B, cap, dcfg.hidden_size), self.dtype)
        for b, i in enumerate(valid):
            toks[b, : len(prompts[b])] = prompts[b]
            n_prompt[b] = len(prompts[b])
            n_audio_arr[b] = feats_list[i][1]
            feats = feats_list[i][0]
            # full (possibly bucket-padded) feats go in; the audio splice
            # reads only the first n_audio rows per item
            audio_padded = audio_padded.at[b, : feats.shape[0]].set(
                feats.astype(self.dtype)
            )

        out, n_kept = batched_transcribe_step(
            self.params["decoder"], dcfg,
            jnp.asarray(toks), jnp.asarray(n_prompt), audio_padded,
            jnp.asarray(n_audio_arr), offsets[0], params.max_tokens,
            mesh=mesh, cache_dtype=self._cache_dtype(),
        )
        out, n_kept = jax.device_get((out, n_kept))  # one fetch
        t_ms = (time.perf_counter() - t_total) * 1000

        for b, i in enumerate(valid):
            r = results[i]
            r.tokens = [int(t) for t in out[b, : int(n_kept[b])]]
            r.text = self.tokenizer.decode(r.tokens)
            r.success = True
            r.t_total_ms = t_ms
        return results


def frontend_feats_batch(asr: "Qwen3ASR", samples_list: list,
                         mel_bucket: int) -> list:
    """Batched mel + encoder frontend: files grouped by frame bucket run
    mel + encoder as ONE dispatch per group (B sequential per-file round
    trips otherwise dominate batch latency). Returns a list aligned with
    `samples_list`: (feats, n_audio) per entry, None where the input was
    None. mel_bucket <= 0 keeps exact shapes (one dispatch per file).
    Shared by `Qwen3ASR.transcribe_batch` and the continuous-batching
    engine (pipeline/engine.py)."""
    feats_list: list = [None] * len(samples_list)
    if mel_bucket > 0:
        from qwen3_asr_tpu.audio.mel import (
            log_mel_spectrogram_padded_batch,
            num_mel_frames,
        )
        from qwen3_asr_tpu.models.encoder import encode_audio_padded_batch

        chunk = asr.cfg.encoder.chunk_size
        bf = -(-mel_bucket // chunk) * chunk
        groups: dict[int, list[int]] = {}
        for i, s in enumerate(samples_list):
            if s is None:
                continue
            F_b = -(-num_mel_frames(len(s)) // bf) * bf
            groups.setdefault(F_b, []).append(i)
        for idxs in groups.values():
            mel_b, n_true = log_mel_spectrogram_padded_batch(
                [samples_list[i] for i in idxs], asr.mel_filters, bf
            )
            feats_b, n_audio_l = encode_audio_padded_batch(
                asr.params["encoder"], asr.cfg.encoder, mel_b, n_true
            )
            for j, i in enumerate(idxs):
                feats_list[i] = (feats_b[j], n_audio_l[j])
    else:
        for i, samples in enumerate(samples_list):
            if samples is None:
                continue
            mel = log_mel_spectrogram(samples, asr.mel_filters,
                                      as_numpy=False)
            f = encode_audio(asr.params["encoder"], asr.cfg.encoder, mel)
            feats_list[i] = (f, int(f.shape[0]))
    return feats_list
