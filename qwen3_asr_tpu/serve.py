"""Serving: dynamic-batched transcription behind a thread-safe queue + HTTP.

The reference is a one-shot CLI (main.cpp); production TPU serving wants the
opposite shape: a resident process with weights pinned in HBM, compiled
programs cached per shape bucket, and concurrent requests batched into one
device dispatch (batching is near-free on the MXU until the batch dim fills
a tile — decode is HBM-bound on weight reads, which are amortized across
the batch).

Design:
- `ASRServer.submit(samples|path) -> Future`: requests queue up; a single
  worker thread drains the queue, groups up to `max_batch` requests within
  `max_wait_ms`, and runs them as ONE `transcribe_batch` call. A single
  dispatch thread keeps the JAX program order deterministic — no device
  contention, no locks around the runtime.
- `serve_http()`: minimal stdlib HTTP front-end —
    POST /v1/transcribe  (body: 16 kHz mono WAV bytes) -> {"text": ...}
    POST /v1/align       (multipart fields audio+text[+language], or JSON
                          {"audio_b64", "text", "language"}) -> {"words": ...}
    POST /v1/audio/transcriptions
                         OpenAI-compatible route (multipart `file`,
                         `response_format` json|text|verbose_json|srt|vtt,
                         `timestamp_granularities[]=word`; words and
                         subtitles ride the loaded aligner; `stream=true`
                         returns SSE transcript.text.delta/.done events
                         as the decode progresses) — drop-in for
                         openai-python's
                         `client.audio.transcriptions.create(...)`
    GET  /healthz        -> {"status": "ok", ...}
  Handler threads only parse bytes and wait on futures; all device work
  stays on the worker thread. Align text rides the request BODY (UTF-8):
  HTTP headers are latin-1, so Korean — the flagship language — cannot
  ride a header; the X-Align-Text header remains only as an ASCII legacy.
  Concurrent align requests batch into ONE ForcedAligner.align_batch
  dispatch, and mixed ASR+align traffic doesn't break batches (other-kind
  arrivals are stashed for the next round, not requeued).

Latency/throughput knobs: `max_batch` (device batch), `max_wait_ms`
(batching window), `TranscribeParams.prompt_bucket` (shape-bucket
granularity = number of distinct compiled programs).
"""

from __future__ import annotations

import argparse
import base64
import json
import queue
import sys
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass

import numpy as np

from qwen3_asr_tpu.audio import load_wav_bytes
from qwen3_asr_tpu.config import SAMPLE_RATE
from qwen3_asr_tpu.pipeline.asr import Qwen3ASR, TranscribeParams
from qwen3_asr_tpu.text.prompt import detect_language, extract_transcript


# ISO-639-1 -> the language names the pipeline uses (detect_language
# emits lowercase full names; the aligner's Korean dictionary split
# triggers on exactly "korean"). OpenAI clients send the ISO codes.
_ISO_LANG = {
    "ko": "korean", "en": "english", "zh": "chinese", "ja": "japanese",
    "de": "german", "fr": "french", "es": "spanish", "ru": "russian",
    "pt": "portuguese", "it": "italian", "ar": "arabic", "hi": "hindi",
    "id": "indonesian", "vi": "vietnamese", "th": "thai", "tr": "turkish",
    "nl": "dutch", "pl": "polish", "sv": "swedish", "ms": "malay",
}


def _normalize_language(lang: str) -> str:
    lang = lang.strip().lower()
    return _ISO_LANG.get(lang, lang)


def _pallas_ok() -> bool:
    """Whether the batched decode megakernel can run here (indirection so
    tests can exercise the batch-grouping logic on CPU)."""
    from qwen3_asr_tpu.ops.support import has_pallas_tpu

    return has_pallas_tpu()


class _StreamDelta:
    """Incremental token-ids -> text-delta decoder for streaming
    responses: re-decodes the accumulated ids, holds back partial UTF-8
    at the token boundary (trailing U+FFFD from the byte decoder), and
    strips the 'language Xxx' prefix incrementally
    (StreamingTranscriptCleaner). Shared by the solo per-token stream
    path (_run_stream) and the continuous engine's per-round progress
    hook."""

    def __init__(self, tokenizer):
        from qwen3_asr_tpu.text.prompt import StreamingTranscriptCleaner

        self._tok = tokenizer
        self._ids: list[int] = []
        self._prev = ""
        self._cleaner = StreamingTranscriptCleaner()

    def feed(self, new_ids) -> str:
        """Absorb newly decoded token ids; return the text delta ready to
        emit ("" while the decode is not yet prefix-stable)."""
        self._ids.extend(int(t) for t in new_ids)
        text = self._tok.decode(self._ids)
        while text.endswith("�"):
            text = text[:-1]  # partial UTF-8: wait for the next token
        if text.startswith(self._prev) and len(text) > len(self._prev):
            delta = self._cleaner.feed(text[len(self._prev):])
            self._prev = text
            return delta
        # non-prefix-stable decode (held bytes resolving differently)
        # simply waits for more tokens; finish() reconciles at the end
        return ""

    def finish(self, full: str) -> str:
        """Reconcile against the authoritative full decode: returns the
        final tail delta (possibly "")."""
        tail = self._cleaner.feed(full[len(self._prev):]) if (
            full.startswith(self._prev) and len(full) > len(self._prev)
        ) else ""
        return tail + self._cleaner.flush()


@dataclass
class _Request:
    samples: np.ndarray
    future: Future
    align_text: str | None = None  # set: forced-alignment request
    language: str = ""
    stream_q: queue.Queue | None = None  # set: SSE streaming request
    params: TranscribeParams | None = None  # set: per-request override
    #  (e.g. temperature sampling) — runs alone, outside the greedy batch
    delta: object = None  # worker-side _StreamDelta (engine streaming)


def _request_kind(req: _Request) -> str:
    if req.align_text is not None:
        return "align"
    if req.stream_q is not None:
        return "stream"
    return "solo" if req.params is not None else "asr"


class ASRServer:
    """Dynamic-batching wrapper around a loaded `Qwen3ASR` (plus an
    optional `ForcedAligner` for /v1/align)."""

    def __init__(
        self,
        asr: Qwen3ASR,
        params: TranscribeParams | None = None,
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        aligner=None,
        continuous: bool = False,
        round_tokens: int = 64,
        pool: int | None = None,
        engine_context: int | None = None,
        engine_kv_stream: bool = False,
    ):
        self.asr = asr
        self.aligner = aligner
        # mel_bucket=500 (5 s granularity): arbitrary request lengths reuse
        # a bounded set of compiled programs instead of compiling per length
        self.params = params or TranscribeParams(print_timing=False,
                                                 mel_bucket=500)
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self._queue: queue.Queue = queue.Queue()
        self._pending: deque = deque()  # worker-thread only
        self._stop = threading.Event()
        self._engine = None
        if continuous:
            # continuous (in-flight) batching: greedy default-params ASR
            # decodes in a slot pool with per-round admission/retirement
            # (pipeline/engine.py) instead of closed batches. Raises if
            # the loaded model can't run the batched megakernel (needs
            # int8pc/int4 quantized weights + int8 KV).
            from qwen3_asr_tpu.pipeline.engine import ContinuousEngine

            self._engine = ContinuousEngine(
                asr, pool=pool or max_batch, round_tokens=round_tokens,
                max_tokens=self.params.max_tokens,
                prompt_bucket=self.params.prompt_bucket,
                mel_bucket=self.params.mel_bucket or 500,
                s_pool=engine_context,
                kv_stream=engine_kv_stream,
                interpret=not _pallas_ok())
        self._worker = threading.Thread(
            target=self._run_continuous if continuous else self._run,
            daemon=True)
        self._worker.start()
        self.n_served = 0
        self.n_batches = 0

    # -- client side ---------------------------------------------------------

    def submit(self, samples: np.ndarray,
               params: TranscribeParams | None = None) -> Future:
        """Enqueue one utterance (float32/int16 16 kHz samples) -> Future
        resolving to a TranscribeResult. `params` overrides the server's
        TranscribeParams for THIS request (e.g. temperature sampling);
        overridden requests run alone instead of joining the greedy
        batch."""
        fut: Future = Future()
        self._queue.put(_Request(np.asarray(samples), fut, params=params))
        return fut

    def transcribe(self, samples: np.ndarray):
        return self.submit(samples).result()

    def submit_align(self, samples: np.ndarray, text: str,
                     language: str = "") -> Future:
        """Enqueue a forced-alignment request -> Future of AlignmentResult.
        Runs on the same dispatch thread as transcription (one device
        owner); concurrent align requests batch into one
        `ForcedAligner.align_batch` NAR dispatch."""
        fut: Future = Future()
        self._queue.put(_Request(np.asarray(samples), fut, align_text=text,
                                 language=language))
        return fut

    def submit_stream(self, samples: np.ndarray) -> queue.Queue:
        """Enqueue a STREAMING transcription: returns a queue of events
        `("delta", text)` as tokens decode, then one `("done", result)`
        (result.text already prefix-stripped) or `("error", msg)`.
        In continuous mode, pool-eligible streams ride the slot pool
        (deltas per decode round, batched with other traffic); otherwise
        they run alone (one dispatch per token chunk), on the same
        single worker thread as everything else."""
        q: queue.Queue = queue.Queue()
        self._queue.put(_Request(np.asarray(samples), Future(), stream_q=q))
        return q

    def warmup(self, seconds: tuple = (5, 15, 30)) -> None:
        """Precompile the shape buckets before taking traffic: with
        mel_bucket set, each representative length compiles the one
        mel/encoder/decode program its whole bucket reuses (XLA compiles
        are the serving cold-start cost; results go to the persistent
        compile cache)."""
        t0 = time.perf_counter()
        futs = [self.submit(np.zeros(int(s * 16000), dtype=np.int16))
                for s in seconds]
        for f in futs:
            f.result()
        print(f"warmup: {len(futs)} buckets in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

    def close(self):
        self._stop.set()
        self._queue.put(None)  # wake the worker
        self._worker.join(timeout=10)

    # -- worker side ---------------------------------------------------------

    def _collect(self) -> list[_Request]:
        """Block for the first request, then batch same-kind requests
        arriving within the window (up to max_batch). Mixed workloads don't
        break batches: other-kind requests are stashed and form the next
        round's batch, so N concurrent aligns run as ONE align_batch
        dispatch even while ASR traffic flows."""
        if self._pending:
            first = self._pending.popleft()
        else:
            first = self._queue.get()
            if first is None:
                return []
        kind = _request_kind(first)
        batch = [first]
        if kind == "stream":
            return batch  # streaming requests run alone, immediately

        # same-kind requests stashed in earlier rounds go first
        i = 0
        while i < len(self._pending) and len(batch) < self.max_batch:
            if _request_kind(self._pending[i]) == kind:
                batch.append(self._pending[i])
                del self._pending[i]
            else:
                i += 1

        deadline = time.perf_counter() + self.max_wait_ms / 1e3
        while len(batch) < self.max_batch:
            timeout = deadline - time.perf_counter()
            if timeout <= 0:
                break
            try:
                req = self._queue.get(timeout=timeout)
            except queue.Empty:
                break
            if req is None:
                break
            if _request_kind(req) != kind:
                self._pending.append(req)  # next round's batch
                continue
            batch.append(req)
        return batch

    def _run(self):
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            self._process_batch(batch)

    def _process_batch(self, batch: list[_Request]) -> None:
        """Run one same-kind closed batch and deliver its results."""
        try:
            if batch[0].stream_q is not None:
                self._run_stream(batch[0])
                results = []
            elif batch[0].align_text is not None:
                results = self._run_align(batch)
            elif batch[0].params is not None:
                # per-request overrides (sampling): sequential, each
                # with its own params — correctness over batching
                results = [self.asr.transcribe(r.samples, r.params)
                           for r in batch]
            elif len(batch) == 1:
                results = [self.asr.transcribe(batch[0].samples, self.params)]
            else:
                results = self._run_transcribe(batch)
            for req, res in zip(batch, results):
                req.future.set_result(res)
        except Exception as e:  # noqa: BLE001 — propagate to all waiters
            for req in batch:
                if req.stream_q is not None:
                    req.stream_q.put(("error", str(e)))
                elif not req.future.done():
                    req.future.set_exception(e)
        self.n_served += len(batch)
        self.n_batches += 1

    # -- continuous (in-flight) batching worker ----------------------------

    def _drain_queue(self, block: bool) -> None:
        """Move queued arrivals onto `_pending`. block=True waits for the
        first arrival (pool idle, nothing pending); otherwise drains
        whatever is there without waiting."""
        if block:
            req = self._queue.get()
            if req is None:
                return
            self._pending.append(req)
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                return
            if req is None:
                return
            self._pending.append(req)

    def _collect_pending_batch(self) -> list[_Request]:
        """Form one closed batch from `_pending` (first request's kind,
        up to max_batch) — the continuous worker's path for work the
        slot pool can't take. No arrival window: everything here already
        queued while a round was running."""
        first = self._pending.popleft()
        kind = _request_kind(first)
        batch = [first]
        if kind == "stream":
            return batch
        i = 0
        while i < len(self._pending) and len(batch) < self.max_batch:
            if _request_kind(self._pending[i]) == kind:
                batch.append(self._pending[i])
                del self._pending[i]
            else:
                i += 1
        return batch

    def _engine_progress(self, req: _Request, new_ids) -> None:
        """Engine on_progress hook: per-round text deltas for streaming
        requests riding the slot pool (req.delta = _StreamDelta attached
        at classification time). Non-stream tickets have no queue and
        are skipped."""
        if req.stream_q is None or req.delta is None:
            return
        text = req.delta.feed(new_ids)
        if text:
            req.stream_q.put(("delta", text))

    def _run_continuous(self):
        """Continuous-batching worker (pipeline/engine.py): greedy
        default-params ASR requests — including SSE streaming ones, which
        get their text deltas from the engine's per-round progress hook —
        prefill into the slot pool between decode rounds (admission
        latency <= one round instead of one whole batch decode);
        align/sampled/too-long requests take the closed-batch path
        between rounds. One thread, one device owner — same as the
        closed-batch worker."""
        eng = self._engine
        eng.on_progress = self._engine_progress
        backlog: deque = deque()  # engine-eligible requests awaiting a slot
        while not self._stop.is_set():
            self._drain_queue(block=eng.n_active() == 0 and not backlog
                              and not self._pending)
            if self._stop.is_set():
                break
            # classify arrivals: pool-eligible greedy ASR (plain or
            # streaming) waits for a slot (never falls onto the closed
            # path — a closed batch would stall the pool for a full
            # decode), everything else goes to the closed-batch path
            rest: deque = deque()
            for req in self._pending:
                if (_request_kind(req) in ("asr", "stream")
                        and req.params is None
                        and eng.eligible(len(req.samples))):
                    if req.stream_q is not None:
                        req.delta = _StreamDelta(self.asr.tokenizer)
                    backlog.append(req)
                else:
                    rest.append(req)
            self._pending = rest
            free = len(eng.free_slots())
            admit = [backlog.popleft() for _ in range(min(free,
                                                          len(backlog)))]
            if admit:
                try:
                    eng.admit(admit, [r.samples for r in admit])
                except Exception as e:  # noqa: BLE001
                    for r in admit:
                        if r.stream_q is not None:
                            r.stream_q.put(("error", str(e)))
                        if not r.future.done():
                            r.future.set_exception(e)
            if eng.n_active():
                try:
                    completed = eng.run_round()
                except Exception as e:  # noqa: BLE001 — fail the slots,
                    # not the worker thread (stranded futures hang
                    # clients forever; the pool state is reset so the
                    # next arrivals start clean)
                    for ticket, res in eng.fail_active(e):
                        if ticket.stream_q is not None:
                            ticket.stream_q.put(("error", str(res)))
                        if not ticket.future.done():
                            ticket.future.set_exception(res)
                    continue
                for req, res in completed:
                    if req.stream_q is not None:
                        # streaming completion: reconcile the final tail
                        # against the authoritative full decode, then
                        # deliver the same ("done", result) contract as
                        # the solo _run_stream path
                        tail = (req.delta.finish(res.text)
                                if req.delta is not None else "")
                        if tail:
                            req.stream_q.put(("delta", tail))
                        res.text = extract_transcript(res.text)
                        req.stream_q.put(("done", res))
                    req.future.set_result(res)
                    self.n_served += 1
                self.n_batches += 1
            # closed-batch work (align/stream/sampled/long): runs between
            # rounds; it blocks the round cadence for its duration, which
            # bounds pool-admission latency at one closed batch
            if self._pending:
                self._process_batch(self._collect_pending_batch())

    def _mega_eligible(self, n_samples: int) -> bool:
        """Host-side estimate of whether an utterance of `n_samples` 16 kHz
        samples can decode through the batched megakernel: its bucketed
        prompt + max_tokens KV rows must fit the kernel's VMEM budget
        (ops/megakernel_batch.py::mega_batch_max_context). Estimate only —
        batched_transcribe_step re-checks with the true shapes — used to
        GROUP requests so one long file doesn't drag a whole batch onto
        the slower vmapped XLA fallback."""
        import jax.numpy as jnp

        dec = self.asr.params["decoder"]
        if "mega" not in dec or self.asr._cache_dtype() == jnp.bfloat16:
            return True  # single group: routing doesn't depend on length
        if not _pallas_ok():
            # no Pallas backend: every batch takes the vmapped XLA step
            # regardless of length, so splitting buys nothing and costs
            # an extra decode round per mixed batch
            return True
        from qwen3_asr_tpu.audio.mel import num_mel_frames
        from qwen3_asr_tpu.ops.megakernel_batch import mega_batch_max_context
        from qwen3_asr_tpu.text.prompt import build_asr_prompt
        from qwen3_asr_tpu.text.timestamps import (
            get_feat_extract_output_lengths,
        )

        dcfg = self.asr.cfg.decoder
        n_audio = get_feat_extract_output_lengths(num_mel_frames(n_samples))
        n_prompt = len(build_asr_prompt(n_audio, dcfg))
        bucket = self.params.prompt_bucket
        P = -(-n_prompt // bucket) * bucket
        S_need = -(-(P + self.params.max_tokens) // 128) * 128
        return S_need <= mega_batch_max_context(
            dec["mega"], dcfg, batch=min(self.max_batch, 16))

    def _run_transcribe(self, batch: list[_Request]) -> list:
        """Dispatch a multi-request transcription round: requests split
        into megakernel-eligible and long-context groups (the batch pads
        every prompt to the longest, so one long file would otherwise kick
        the WHOLE batch onto the vmapped XLA decode — latency isolation
        for the common short-file path); each group pads to a power of two
        (repeat the last item) so the vmapped decode compiles for
        log2(max_batch) batch shapes instead of one per arrival count."""
        eligible = [self._mega_eligible(len(r.samples)) for r in batch]
        groups = [[i for i, e in enumerate(eligible) if e],
                  [i for i, e in enumerate(eligible) if not e]]
        results: list = [None] * len(batch)
        for idxs in groups:
            if not idxs:
                continue
            if len(idxs) == 1:
                results[idxs[0]] = self.asr.transcribe(
                    batch[idxs[0]].samples, self.params)
                continue
            target = 1 << (len(idxs) - 1).bit_length()
            samples = [batch[i].samples for i in idxs]
            samples += [samples[-1]] * (target - len(idxs))
            for i, res in zip(idxs,
                              self.asr.transcribe_batch(samples, self.params)):
                results[i] = res
        return results

    def _run_stream(self, req: _Request) -> None:
        """One streaming transcription: ride the pipeline's per-token-id
        callback, decode the accumulated ids incrementally, and push text
        DELTAS onto the request's queue. Partial UTF-8 at the token
        boundary is held back (trailing U+FFFD from the byte decoder),
        and the 'language Xxx' prefix is stripped incrementally
        (StreamingTranscriptCleaner) so deltas carry only transcript
        text. Ends with ("done", result) — result.text prefix-stripped —
        or ("error", msg)."""
        sd = _StreamDelta(self.asr.tokenizer)

        def on_id(tok: int):
            delta = sd.feed([tok])
            if delta:
                req.stream_q.put(("delta", delta))

        self.asr.set_token_callback(on_id)
        try:
            result = self.asr.transcribe(req.samples, self.params)
        finally:
            self.asr.set_token_callback(None)
        if not result.success:
            req.stream_q.put(("error", result.error_msg))
            return
        tail = sd.finish(result.text)
        if tail:
            req.stream_q.put(("delta", tail))
        result.text = extract_transcript(result.text)
        req.stream_q.put(("done", result))

    def _run_align(self, batch: list[_Request]) -> list:
        """One align_batch dispatch per language group (usually one)."""
        results: list = [None] * len(batch)
        groups: dict[str, list[int]] = {}
        for i, req in enumerate(batch):
            groups.setdefault(req.language, []).append(i)
        for language, idxs in groups.items():
            outs = self.aligner.align_batch(
                [batch[i].samples for i in idxs],
                [batch[i].align_text for i in idxs],
                language=language,
                mel_bucket=self.params.mel_bucket or 500,
            )
            for i, out in zip(idxs, outs):
                results[i] = out
        return results


# ---------------------------------------------------------------------------
# HTTP front-end (stdlib only)
# ---------------------------------------------------------------------------

def _parse_multipart(data: bytes, content_type: str) -> dict[str, list[bytes]]:
    """Minimal multipart/form-data parser: {field name: [raw bytes, ...]}.
    Repeated fields accumulate in arrival order (the OpenAI-compatible
    route's `timestamp_granularities[]` arrives once per granularity)."""
    boundary = ""
    for token in content_type.split(";"):
        token = token.strip()
        if token.startswith("boundary="):
            boundary = token[len("boundary="):].strip('"')
    if not boundary:
        raise ValueError("multipart body without boundary")
    delim = b"--" + boundary.encode()
    fields: dict[str, list[bytes]] = {}
    for part in data.split(delim):
        part = part.strip(b"\r\n")
        if not part or part == b"--":
            continue
        head, sep, body = part.partition(b"\r\n\r\n")
        if not sep:
            continue
        name = ""
        for line in head.split(b"\r\n"):
            if not line.lower().startswith(b"content-disposition"):
                continue
            # parse parameters individually: a naive 'name=' substring
            # search would match inside 'filename=' when a client emits
            # filename before name (RFC 7578 mandates no order)
            for param in line.split(b";"):
                param = param.strip()
                if param.lower().startswith(b"name="):
                    name = param[len(b"name="):].strip(b'" ').decode(
                        "utf-8", "replace")
        if name:
            fields.setdefault(name, []).append(body)
    return fields


def _parse_align_request(headers, body: bytes):
    """-> (wav_bytes, text, language). Transports, in preference order:

    - multipart/form-data: fields `audio` (WAV bytes), `text` (UTF-8),
      optional `language`
    - application/json: {"audio_b64": <base64 WAV>, "text": ...,
      "language": ...}
    - legacy: raw WAV body + X-Align-Text header (latin-1 only — HTTP
      headers can't carry Korean text; prefer the body transports)
    """
    ctype = headers.get("Content-Type", "")
    if ctype.startswith("multipart/form-data"):
        fields = _parse_multipart(body, ctype)
        if "audio" not in fields or "text" not in fields:
            raise ValueError("multipart fields 'audio' and 'text' required")
        return (fields["audio"][-1], fields["text"][-1].decode("utf-8"),
                fields.get("language", [b""])[-1].decode("utf-8"))
    if ctype.startswith("application/json"):
        req = json.loads(body.decode("utf-8"))
        if "audio_b64" not in req or "text" not in req:
            raise ValueError("JSON fields 'audio_b64' and 'text' required")
        return (base64.b64decode(req["audio_b64"]), req["text"],
                req.get("language", ""))
    text = headers.get("X-Align-Text", "")
    if not text:
        raise ValueError(
            "align request needs multipart (audio+text fields), JSON "
            "(audio_b64+text), or the legacy X-Align-Text header")
    return body, text, headers.get("X-Align-Language", "")


def _make_handler(server: ASRServer):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload, ensure_ascii=False).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API)
            if self.path == "/healthz":
                health = {
                    "status": "ok",
                    "served": server.n_served,
                    "batches": server.n_batches,
                }
                if server._engine is not None:
                    health["engine"] = server._engine.stats()
                self._reply(200, health)
            else:
                self._reply(404, {"error": "not found"})

        def _reply_text(self, code: int, text: str):
            body = text.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "text/plain; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _openai_error(self, code: int, message: str,
                          err_type: str = "invalid_request_error"):
            # OpenAI API error envelope, so standard clients surface the
            # message instead of a parse failure
            self._reply(code, {"error": {"message": message,
                                         "type": err_type,
                                         "param": None, "code": None}})

        def _openai_transcription(self, data: bytes):
            """OpenAI-compatible `POST /v1/audio/transcriptions`
            (multipart: `file` required; `language`, `response_format`
            json|text|verbose_json|srt|vtt, `timestamp_granularities[]=
            word` honored; `temperature` > 0 switches that request to
            sampled decoding (models/generate.py::generate_sample; an
            optional non-standard `seed` field makes it reproducible) and
            runs it outside the greedy batch; `model`/`prompt` accepted
            and ignored — the loaded model is the model).
            Word timestamps (and the srt/vtt renders built from them) run
            the forced aligner on the transcript, so `--aligner-model`
            must be loaded; granularities require `response_format=
            verbose_json` (matching the OpenAI contract)."""
            ctype = self.headers.get("Content-Type", "")
            if not ctype.startswith("multipart/form-data"):
                self._openai_error(
                    400, "multipart/form-data with a 'file' field required")
                return
            fields = _parse_multipart(data, ctype)
            if "file" not in fields:
                self._openai_error(400, "missing required field 'file'")
                return
            fmt = fields.get("response_format", [b"json"])[-1].decode().strip()
            if fmt not in ("json", "text", "verbose_json", "srt", "vtt"):
                self._openai_error(
                    400, f"response_format '{fmt}' not supported "
                         "(json, text, verbose_json, srt, vtt)")
                return
            stream = fields.get("stream", [b""])[-1].decode().strip().lower() \
                in ("true", "1")
            grans = [g.decode().strip()
                     for g in fields.get("timestamp_granularities[]", [])]
            want_words = "word" in grans
            if stream:
                if fmt not in ("json", "text"):
                    self._openai_error(
                        400, "stream=true supports response_format json "
                             "or text (timestamps need the full result)")
                    return
                if want_words:
                    self._openai_error(
                        400, "stream=true cannot carry word timestamps")
                    return
            if want_words and fmt != "verbose_json":
                self._openai_error(
                    400, "timestamp_granularities requires "
                         "response_format=verbose_json")
                return
            if (want_words or fmt in ("srt", "vtt")) and server.aligner is None:
                self._openai_error(
                    400, "word timestamps need an aligner model "
                         "(start the server with --aligner-model)")
                return
            samples, sr = load_wav_bytes(fields["file"][-1], raw_int16=True)
            if sr != SAMPLE_RATE:
                self._openai_error(400, f"Audio must be 16kHz, got {sr} Hz")
                return
            try:
                temp = float(
                    fields.get("temperature", [b"0"])[-1].decode().strip()
                    or "0")
            except ValueError:
                self._openai_error(400, "temperature must be a number")
                return
            if not 0.0 <= temp <= 2.0:
                self._openai_error(
                    400, "temperature must be in [0, 2]")
                return
            if stream:
                if temp > 0:
                    self._openai_error(
                        400, "stream=true is greedy-only (sampled decoding "
                             "runs as one whole-loop program)")
                    return
                self._sse_transcription(samples)
                return
            req_params = None
            if temp > 0:
                import dataclasses as _dc

                try:
                    seed = int(fields.get("seed", [b"0"])[-1].decode()
                               .strip() or "0")
                except ValueError:
                    self._openai_error(400, "seed must be an integer")
                    return
                # temperature (and top_p) are traced scalars in
                # generate_sample — every setting reuses ONE compiled
                # sampled-loop program, so the raw client value passes
                # through (no defensive rounding needed)
                req_params = _dc.replace(
                    server.params, temperature=temp, seed=seed)
            result = server.submit(samples, params=req_params).result()
            if not result.success:
                self._openai_error(500, result.error_msg, "server_error")
                return
            transcript = extract_transcript(result.text)
            # an explicitly supplied language wins over detection (the
            # client is asserting ground truth); ISO codes map to the
            # pipeline's full names so 'ko' still triggers the Korean
            # dictionary split in the aligner
            language = (_normalize_language(
                            fields.get("language", [b""])[-1].decode())
                        or detect_language(result.text))
            if fmt == "text":
                self._reply_text(200, transcript + "\n")
                return
            if fmt == "json":
                self._reply(200, {"text": transcript})
                return
            if fmt in ("srt", "vtt"):
                from qwen3_asr_tpu.text.subtitles import (
                    words_to_srt, words_to_vtt,
                )

                words = []
                if transcript.strip():
                    align = server.submit_align(
                        samples, transcript, language).result()
                    if not align.success:
                        self._openai_error(500, align.error_msg,
                                           "server_error")
                        return
                    words = align.words
                render = words_to_srt if fmt == "srt" else words_to_vtt
                self._reply_text(200, render(words))
                return
            duration = round(len(samples) / SAMPLE_RATE, 3)
            payload = {
                "task": "transcribe",
                "language": language,
                "duration": duration,
                "text": transcript,
            }

            def segment(i, start, end, text):
                # full OpenAI segment schema so strict clients parse;
                # the logprob/ratio diagnostics are not produced by a
                # greedy pipeline and carry neutral values
                return {"id": i, "seek": 0, "start": start, "end": end,
                        "text": text, "tokens": [], "temperature": temp,
                        "avg_logprob": 0.0, "compression_ratio": 1.0,
                        "no_speech_prob": 0.0}

            aligned = None
            if (want_words or fmt == "verbose_json") and transcript.strip():
                if server.aligner is not None and want_words:
                    aligned = server.submit_align(
                        samples, transcript, language).result()
                    if not aligned.success:
                        self._openai_error(500, aligned.error_msg,
                                           "server_error")
                        return
            if aligned is not None:
                from qwen3_asr_tpu.text.subtitles import (
                    group_words_into_cues,
                )

                payload["segments"] = [
                    segment(i, c.start, c.end, c.text)
                    for i, c in enumerate(
                        group_words_into_cues(aligned.words))
                ]
            else:
                # verbose_json always carries segments in the OpenAI
                # schema; without word timestamps the whole transcript
                # is one segment spanning the audio
                payload["segments"] = ([] if not transcript.strip() else
                                       [segment(0, 0.0, duration,
                                                transcript)])
            if want_words:
                payload["words"] = [
                    {"word": w.word, "start": w.start, "end": w.end}
                    for w in (aligned.words if aligned is not None else [])
                ]
            self._reply(200, payload)

        def _sse_transcription(self, samples):
            """Server-sent-events response (OpenAI `stream=true`): one
            `transcript.text.delta` event per decoded text chunk, a final
            `transcript.text.done` with the full transcript, then
            `[DONE]`. Chunked transfer encoding, written as events drain
            from the worker's stream queue (the decode runs token-chunked
            on the device; the handler thread only forwards)."""
            q = server.submit_stream(samples)
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream; charset=utf-8")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def emit(payload: str):
                data = f"data: {payload}\n\n".encode("utf-8")
                self.wfile.write(f"{len(data):X}\r\n".encode() + data
                                 + b"\r\n")
                self.wfile.flush()

            while True:
                kind, value = q.get()
                if kind == "delta":
                    emit(json.dumps({"type": "transcript.text.delta",
                                     "delta": value}, ensure_ascii=False))
                elif kind == "done":
                    emit(json.dumps({"type": "transcript.text.done",
                                     "text": value.text},
                                    ensure_ascii=False))
                    break
                else:  # error mid-stream: surface as an SSE event
                    emit(json.dumps({"type": "error",
                                     "error": {"message": value,
                                               "type": "server_error"}},
                                    ensure_ascii=False))
                    break
            emit("[DONE]")
            self.wfile.write(b"0\r\n\r\n")  # chunked terminator

        def do_POST(self):  # noqa: N802
            if self.path not in ("/v1/transcribe", "/v1/align",
                                 "/v1/audio/transcriptions"):
                self._reply(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                data = self.rfile.read(length)
                t0 = time.perf_counter()
                if self.path == "/v1/audio/transcriptions":
                    self._openai_transcription(data)
                    return
                if self.path == "/v1/align":
                    if server.aligner is None:
                        self._reply(400, {"error": "no aligner model loaded"})
                        return
                    wav, text, language = _parse_align_request(
                        self.headers, data)
                    samples, sr = load_wav_bytes(wav, raw_int16=True)
                    if sr != SAMPLE_RATE:
                        self._reply(400, {
                            "error": f"Audio must be 16kHz, got {sr} Hz"})
                        return
                    result = server.submit_align(
                        samples, text, language).result()
                    if not result.success:
                        self._reply(500, {"error": result.error_msg})
                        return
                    self._reply(200, {
                        "words": [{"word": w.word, "start": w.start,
                                   "end": w.end} for w in result.words],
                        "latency_ms": round((time.perf_counter() - t0) * 1e3, 1),
                    })
                    return
                samples, sr = load_wav_bytes(data, raw_int16=True)
                if sr != SAMPLE_RATE:
                    self._reply(400, {"error": f"Audio must be 16kHz, got {sr} Hz"})
                    return
                result = server.submit(samples).result()
                if not result.success:
                    self._reply(500, {"error": result.error_msg})
                    return
                self._reply(200, {
                    "text": result.text,
                    "latency_ms": round((time.perf_counter() - t0) * 1e3, 1),
                })
            except Exception as e:  # noqa: BLE001
                if self.path == "/v1/audio/transcriptions":
                    self._openai_error(400, str(e))
                else:
                    self._reply(400, {"error": str(e)})

        def log_message(self, fmt, *args):  # stderr, stdout stays data-only
            print("serve: " + fmt % args, file=sys.stderr, flush=True)

    return Handler


def serve_http(server: ASRServer, host: str = "127.0.0.1", port: int = 8000):
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer((host, port), _make_handler(server))
    print(f"serving on http://{host}:{httpd.server_address[1]}", file=sys.stderr,
          flush=True)
    return httpd


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="qwen3-asr serving daemon")
    p.add_argument("-m", "--model", required=True, help="ASR GGUF model")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--max-tokens", type=int, default=1024)
    p.add_argument("--quantize", default="auto",
                   choices=["auto", "none", "q8_0", "int8pc", "int4"],
                   help="int8 decode path: q8_0 (Pallas dequant kernels) or "
                        "int8pc (per-channel W8A8 on the int8 MXU); auto = "
                        "int8pc for dense GGUFs; int4 nibble-packs the "
                        "decode megakernels' weight stream (fastest decode; "
                        "coarser 4-bit weights, prefill stays int8)")
    p.add_argument("--kv-cache", default="int8",
                   choices=["int8", "bf16", "int4"],
                   help="KV cache dtype. int8 (default) enables the batched "
                        "decode megakernel — ~3.3x aggregate decode "
                        "throughput; bf16 matches the reference's F16-cache "
                        "numerics exactly; int4 nibble-packs the single-"
                        "sequence stream (batched serving still runs int8)")
    p.add_argument("--warmup", default="",
                   help="comma-separated audio lengths (s) to precompile, "
                        "e.g. 5,15,30")
    p.add_argument("--platform", default="",
                   help="Force a JAX platform (e.g. 'cpu', 'tpu'); "
                        "default: auto")
    p.add_argument("--aligner-model", default="",
                   help="forced-aligner GGUF: enables POST /v1/align "
                        "(multipart audio+text, JSON audio_b64+text, or "
                        "legacy WAV body + X-Align-Text header) and word "
                        "timestamps on /v1/audio/transcriptions")
    p.add_argument("--continuous", action="store_true",
                   help="continuous (in-flight) batching: greedy ASR "
                        "requests join/leave a slot pool between decode "
                        "rounds instead of closed batches — no "
                        "head-of-line blocking behind a running batch "
                        "(needs --quantize int8pc/int4 + --kv-cache int8)")
    p.add_argument("--round-tokens", type=int, default=64,
                   help="continuous mode: decode steps per round (one "
                        "jitted dispatch); bounds admission latency")
    p.add_argument("--engine-context", type=int, default=0,
                   help="continuous mode: per-slot KV rows (multiple of "
                        "128; bounds the longest admissible prompt + "
                        "max-tokens). 0 = the batched kernel's VMEM "
                        "maximum — right on TPU; set explicitly for "
                        "CPU/interpret runs where the VMEM bound is "
                        "meaningless")
    p.add_argument("--engine-kv-stream", action="store_true",
                   help="continuous mode: streamed-KV slot pool (VMEM "
                        "O(1) in context) for long-audio serving — "
                        "requires --engine-context (multiple of 256); "
                        "slower per step than the resident pool at short "
                        "contexts")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    asr = Qwen3ASR(dtype=jnp.bfloat16,
                   quantize="" if args.quantize == "none" else args.quantize,
                   kv_int8=args.kv_cache == "int8",
                   kv_cache="int4" if args.kv_cache == "int4" else None)
    if not asr.load_model(args.model):
        print(f"Error: {asr.error_msg}", file=sys.stderr)
        return 1
    aligner = None
    if args.aligner_model:
        from qwen3_asr_tpu.pipeline.aligner import ForcedAligner
        from qwen3_asr_tpu.text.korean import find_korean_dict

        aligner = ForcedAligner(
            dtype=jnp.bfloat16,
            quantize="" if args.quantize == "none" else args.quantize)
        if not aligner.load_model(args.aligner_model):
            print(f"Error (aligner): {aligner.error_msg}", file=sys.stderr)
            return 1
        dict_path = find_korean_dict(args.aligner_model)
        if dict_path:  # language=korean requests get dictionary splitting
            aligner.load_korean_dict(dict_path)
    server = ASRServer(
        asr,
        TranscribeParams(max_tokens=args.max_tokens, print_timing=False,
                         mel_bucket=500),
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        aligner=aligner,
        continuous=args.continuous,
        round_tokens=args.round_tokens,
        engine_context=args.engine_context or None,
        engine_kv_stream=args.engine_kv_stream,
    )
    if args.warmup:
        server.warmup(tuple(float(s) for s in args.warmup.split(",")))
    httpd = serve_http(server, args.host, args.port)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
