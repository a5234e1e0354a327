"""Serving layer: dynamic batching correctness + the HTTP front-end."""

import json
import threading
import urllib.error
import urllib.request

import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.config import tiny_asr_config
from qwen3_asr_tpu.pipeline.asr import Qwen3ASR, TranscribeParams
from qwen3_asr_tpu.serve import ASRServer, serve_http

from helpers import make_byte_vocab


def _tiny_asr():
    cfg = tiny_asr_config()
    asr = Qwen3ASR(dtype=jnp.float32)
    asr.load_random(cfg, seed=7,
                    vocab=make_byte_vocab(cfg.decoder.vocab_size, {}))
    return asr


def _tone(freq, seconds=1.0):
    t = np.arange(int(seconds * 16000)) / 16000
    return (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_server_batches_match_single(rng):
    asr = _tiny_asr()
    params = TranscribeParams(max_tokens=4, print_timing=False,
                              prompt_bucket=32)
    audios = [_tone(f, s) for f, s in
              [(220, 1.0), (440, 1.3), (880, 0.8), (330, 1.0)]]
    expected = [asr.transcribe(a, params).tokens for a in audios]

    server = ASRServer(asr, params, max_batch=4, max_wait_ms=50.0)
    try:
        futures = [server.submit(a) for a in audios]
        got = [f.result(timeout=120) for f in futures]
        assert [g.tokens for g in got] == expected
        assert all(g.success for g in got)
        # the 50 ms window should have coalesced the 4 requests
        assert server.n_batches < len(audios)
    finally:
        server.close()


def test_int16_array_input_matches_float(rng):
    """The serving path hands raw int16 PCM arrays to transcribe(); they
    must be scaled like the float path (regression: int16 was cast to
    float32 WITHOUT /32768)."""
    asr = _tiny_asr()
    params = TranscribeParams(max_tokens=4, print_timing=False,
                              prompt_bucket=32)
    f32 = _tone(440, 1.0)
    pcm = (f32 * 32768.0).clip(-32768, 32767).astype(np.int16)
    a = asr.transcribe(f32, params)
    b = asr.transcribe(pcm, params)
    assert b.tokens == a.tokens


def test_server_warmup(rng):
    asr = _tiny_asr()
    params = TranscribeParams(max_tokens=3, print_timing=False,
                              prompt_bucket=32, mel_bucket=200)
    server = ASRServer(asr, params, max_batch=2, max_wait_ms=1.0)
    try:
        server.warmup((0.5, 1.5))
        # a request inside a warmed bucket reuses the compiled programs
        r = server.transcribe(_tone(440, 1.2))
        assert r.success
    finally:
        server.close()


def test_align_endpoint(rng):
    """Alignment requests ride the same dispatch thread; the /v1/align HTTP
    route returns word timestamps."""
    from qwen3_asr_tpu.config import tiny_aligner_config
    from qwen3_asr_tpu.pipeline.aligner import ForcedAligner

    asr = _tiny_asr()
    fcfg = tiny_aligner_config()
    fa = ForcedAligner(dtype=jnp.float32)
    fa.load_random(fcfg, seed=41,
                   vocab=make_byte_vocab(fcfg.decoder.vocab_size, {}))
    params = TranscribeParams(max_tokens=3, print_timing=False,
                              prompt_bucket=32, mel_bucket=200)
    server = ASRServer(asr, params, max_batch=2, max_wait_ms=1.0, aligner=fa)
    httpd = serve_http(server, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    port = httpd.server_address[1]
    try:
        # direct API
        r = server.submit_align(_tone(440), "hello world").result(timeout=300)
        assert r.success and len(r.words) == 2

        # HTTP route
        from qwen3_asr_tpu.audio.wav import write_wav
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "a.wav")
            write_wav(p, _tone(440))
            wav_bytes = open(p, "rb").read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/align", data=wav_bytes,
            headers={"X-Align-Text": "hello world"}, method="POST")
        with urllib.request.urlopen(req, timeout=300) as resp:
            body = json.loads(resp.read())
        assert [w["word"] for w in body["words"]] == ["hello", "world"]

        # missing header -> 400
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/align", data=wav_bytes,
            method="POST")
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        server.close()


def _tiny_aligner():
    from qwen3_asr_tpu.config import tiny_aligner_config
    from qwen3_asr_tpu.pipeline.aligner import ForcedAligner

    fcfg = tiny_aligner_config()
    fa = ForcedAligner(dtype=jnp.float32)
    fa.load_random(fcfg, seed=41,
                   vocab=make_byte_vocab(fcfg.decoder.vocab_size, {}))
    return fa


def _wav_bytes(samples):
    import os
    import tempfile

    from qwen3_asr_tpu.audio.wav import write_wav

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "a.wav")
        write_wav(p, samples)
        return open(p, "rb").read()


def test_align_http_korean_body_transports(rng):
    """Korean align text rides the UTF-8 request body (JSON and multipart);
    HTTP headers are latin-1 and cannot carry it (VERDICT r1 weak#3)."""
    import base64

    from qwen3_asr_tpu.text.korean import find_korean_dict, tokenize_korean

    asr = _tiny_asr()
    fa = _tiny_aligner()
    assert fa.load_korean_dict(find_korean_dict())
    params = TranscribeParams(max_tokens=3, print_timing=False,
                              prompt_bucket=32, mel_bucket=200)
    server = ASRServer(asr, params, max_batch=2, max_wait_ms=1.0, aligner=fa)
    httpd = serve_http(server, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    text = "안녕하세요 여러분"
    expected_words = tokenize_korean(text, fa.ko_dict)
    assert len(expected_words) >= 3  # the dictionary actually split something
    wav = _wav_bytes(_tone(440))
    try:
        # JSON transport
        payload = json.dumps({
            "audio_b64": base64.b64encode(wav).decode(),
            "text": text,
            "language": "korean",
        }).encode("utf-8")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/align", data=payload,
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=300) as resp:
            body = json.loads(resp.read().decode("utf-8"))
        assert [w["word"] for w in body["words"]] == expected_words

        # multipart transport
        boundary = "qwen3boundary123"
        parts = []
        for name, value, is_file in (
            ("text", text.encode("utf-8"), False),
            ("language", b"korean", False),
            ("audio", wav, True),
        ):
            disp = f'form-data; name="{name}"'
            if is_file:
                disp += '; filename="a.wav"'
            parts.append(
                f"--{boundary}\r\nContent-Disposition: {disp}\r\n\r\n".encode()
                + value + b"\r\n")
        mp_body = b"".join(parts) + f"--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/align", data=mp_body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"},
            method="POST")
        with urllib.request.urlopen(req, timeout=300) as resp:
            body = json.loads(resp.read().decode("utf-8"))
        assert [w["word"] for w in body["words"]] == expected_words
    finally:
        httpd.shutdown()
        server.close()


def test_mixed_asr_align_batching(rng):
    """Concurrent ASR + align traffic: aligns batch into align_batch rounds
    (not one-at-a-time) and nothing breaks a same-kind batch (VERDICT r1
    weak#3/fix#4). Results must match the single-request paths."""
    asr = _tiny_asr()
    fa = _tiny_aligner()
    params = TranscribeParams(max_tokens=3, print_timing=False,
                              prompt_bucket=32, mel_bucket=200)
    freqs = [220, 440, 660, 880]
    texts = ["hello world", "one two three", "a b", "x y z w"]
    exp_tokens = {f: asr.transcribe(_tone(f), params).tokens for f in freqs}
    exp_words = {t: [w.word for w in
                     fa.align(_tone(f), t, mel_bucket=200).words]
                 for f, t in zip(freqs, texts)}

    server = ASRServer(asr, params, max_batch=4, max_wait_ms=100.0,
                       aligner=fa)
    try:
        futs = []
        for f, t in zip(freqs, texts):  # interleave kinds
            futs.append(("asr", f, server.submit(_tone(f))))
            futs.append(("align", t, server.submit_align(_tone(f), t)))
        for kind, key, fut in futs:
            r = fut.result(timeout=600)
            assert r.success
            if kind == "asr":
                assert r.tokens == exp_tokens[key]
            else:
                assert [w.word for w in r.words] == exp_words[key]
        # 8 requests; same-kind coalescing must beat one-dispatch-per-request
        assert server.n_batches <= 4, server.n_batches
    finally:
        server.close()


def test_concurrent_submitters(rng):
    """Many client threads submitting simultaneously: every future resolves
    with the right per-input result (no cross-request mixups)."""
    asr = _tiny_asr()
    params = TranscribeParams(max_tokens=3, print_timing=False,
                              prompt_bucket=32, mel_bucket=200)
    freqs = [220, 330, 440, 550, 660, 770]
    expected = {f: asr.transcribe(_tone(f), params).tokens for f in freqs}

    server = ASRServer(asr, params, max_batch=4, max_wait_ms=20.0)
    try:
        results = {}
        lock = threading.Lock()

        def client(f):
            r = server.submit(_tone(f)).result(timeout=300)
            with lock:
                results[f] = r.tokens

        threads = [threading.Thread(target=client, args=(f,))
                   for f in freqs * 2]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert results == expected
        assert server.n_served == len(freqs) * 2
    finally:
        server.close()


def test_http_transcribe_and_health(rng):
    from qwen3_asr_tpu.audio.wav import write_wav
    import tempfile, os

    asr = _tiny_asr()
    params = TranscribeParams(max_tokens=3, print_timing=False,
                              prompt_bucket=32)
    server = ASRServer(asr, params, max_batch=2, max_wait_ms=1.0)
    httpd = serve_http(server, "127.0.0.1", 0)  # ephemeral port
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    port = httpd.server_address[1]
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read())["status"] == "ok"

        with tempfile.TemporaryDirectory() as d:
            wav_path = os.path.join(d, "a.wav")
            write_wav(wav_path, _tone(440))
            wav_bytes = open(wav_path, "rb").read()

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/transcribe", data=wav_bytes,
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            body = json.loads(r.read())
        assert r.status == 200
        assert "text" in body and "latency_ms" in body

        # error surface: garbage bytes -> 400 with a message
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/transcribe", data=b"not a wav",
            method="POST",
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "WAV" in json.loads(e.read())["error"]
    finally:
        httpd.shutdown()
        server.close()


def test_server_splits_long_context_batch(rng, monkeypatch):
    """Latency isolation: the batcher groups megakernel-eligible requests
    apart from long-context ones (batch padding is to the longest prompt,
    so one long file would otherwise force the WHOLE batch onto the
    vmapped XLA fallback). Forced here by shrinking the VMEM budget until
    only ~1 s files fit the kernel."""
    cfg = tiny_asr_config()
    asr = Qwen3ASR(dtype=jnp.bfloat16, quantize="int8pc", kv_int8=True)
    asr.load_random(cfg, seed=7,
                    vocab=make_byte_vocab(cfg.decoder.vocab_size, {}))
    dec = asr.params["decoder"]
    assert "mega" in dec

    from qwen3_asr_tpu import serve as SV
    from qwen3_asr_tpu.ops import megakernel_batch as MB
    from qwen3_asr_tpu.ops.megakernel_batch import mega_batch_max_context

    # grouping only matters where the kernel can actually run — fake the
    # serve-side Pallas check so the CPU test exercises the split logic
    # (the decode itself still takes the vmapped XLA step on CPU)
    monkeypatch.setattr(SV, "_pallas_ok", lambda: True)

    def max_s(budget):
        monkeypatch.setattr(MB, "_VMEM_BUDGET_BATCH", budget)
        return mega_batch_max_context(dec["mega"], cfg.decoder,
                                      batch=min(4, 16))

    # smallest budget whose kernel fits exactly 128 KV rows: 1 s files
    # (S_need=128) stay eligible, 8 s files (S_need=256) do not
    lo, hi = 1, 1 << 26
    while lo < hi:
        mid = (lo + hi) // 2
        if max_s(mid) >= 128:
            hi = mid
        else:
            lo = mid + 1
    assert max_s(lo) == 128

    params = TranscribeParams(max_tokens=4, print_timing=False,
                              prompt_bucket=32)
    audios = [_tone(220, 1.0), _tone(440, 1.0), _tone(880, 8.0),
              _tone(330, 1.0)]
    expected = [asr.transcribe(a, params).tokens for a in audios]

    server = ASRServer(asr, params, max_batch=4, max_wait_ms=100.0)
    calls = []
    orig_batch, orig_single = asr.transcribe_batch, asr.transcribe
    asr.transcribe_batch = lambda s, p, **kw: (
        calls.append(("batch", len(s))) or orig_batch(s, p, **kw))
    asr.transcribe = lambda s, p=None, **kw: (
        calls.append(("single", 1)) or orig_single(s, p, **kw))
    try:
        futures = [server.submit(a) for a in audios]
        got = [f.result(timeout=300) for f in futures]
        assert [g.tokens for g in got] == expected
        assert all(g.success for g in got)
        # one pow2-padded batch for the three short files + one solo run
        # for the 8 s file (order within the round is eligible-first)
        assert ("batch", 4) in calls and ("single", 1) in calls
    finally:
        asr.transcribe_batch, asr.transcribe = orig_batch, orig_single
        server.close()


def _multipart(fields):
    """Encode [(name, bytes)] as a multipart/form-data body; the `file`
    field carries a filename like real OpenAI clients do."""
    boundary = "qwen3openai456"
    parts = []
    for name, value in fields:
        disp = f'form-data; name="{name}"'
        if name == "file":
            disp += '; filename="audio.wav"'
        parts.append(
            f"--{boundary}\r\nContent-Disposition: {disp}\r\n\r\n".encode()
            + value + b"\r\n")
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


def test_openai_transcriptions_endpoint(rng):
    """`POST /v1/audio/transcriptions` speaks the OpenAI transcription API:
    multipart `file`, response_format json/text/verbose_json, word
    timestamps via the loaded aligner, OpenAI error envelope."""
    asr = _tiny_asr()
    fa = _tiny_aligner()
    params = TranscribeParams(max_tokens=3, print_timing=False,
                              prompt_bucket=32, mel_bucket=200)
    server = ASRServer(asr, params, max_batch=2, max_wait_ms=1.0, aligner=fa)
    httpd = serve_http(server, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    url = f"http://127.0.0.1:{port}/v1/audio/transcriptions"
    wav = _wav_bytes(_tone(440))

    def post(fields, expect_error=None):
        body, ctype = _multipart(fields)
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": ctype}, method="POST")
        if expect_error is None:
            with urllib.request.urlopen(req, timeout=300) as r:
                return r.status, r.headers.get("Content-Type", ""), r.read()
        try:
            urllib.request.urlopen(req, timeout=300)
            raise AssertionError(f"expected HTTP {expect_error}")
        except urllib.error.HTTPError as e:
            assert e.code == expect_error
            return e.code, e.headers.get("Content-Type", ""), e.read()

    try:
        # default (json): {"text": ...}
        status, ctype, body = post([("file", wav), ("model", b"whisper-1")])
        assert status == 200 and "json" in ctype
        assert "text" in json.loads(body)

        # text: plain UTF-8 body
        status, ctype, body = post(
            [("file", wav), ("response_format", b"text")])
        assert status == 200 and ctype.startswith("text/plain")
        assert body.decode("utf-8").endswith("\n")

        # verbose_json + word granularity -> task/duration/words
        status, _, body = post([
            ("file", wav),
            ("response_format", b"verbose_json"),
            ("timestamp_granularities[]", b"word"),
        ])
        payload = json.loads(body)
        assert status == 200
        assert payload["task"] == "transcribe"
        assert abs(payload["duration"] - 1.0) < 1e-6
        assert isinstance(payload["words"], list)
        for w in payload["words"]:
            assert set(w) == {"word", "start", "end"}
        # verbose_json always carries OpenAI-schema segments
        assert isinstance(payload["segments"], list)
        for s in payload["segments"]:
            assert {"id", "seek", "start", "end", "text", "tokens",
                    "temperature", "avg_logprob", "compression_ratio",
                    "no_speech_prob"} <= set(s)

        # client-asserted ISO language wins over detection and maps to
        # the pipeline's full name (so 'ko' can trigger the Korean
        # dictionary split downstream)
        status, _, body = post([
            ("file", wav),
            ("response_format", b"verbose_json"),
            ("language", b"ko"),
        ])
        assert status == 200
        assert json.loads(body)["language"] == "korean"

        # OpenAI error envelope on misuse
        _, _, body = post([("response_format", b"json")], expect_error=400)
        err = json.loads(body)["error"]
        assert err["type"] == "invalid_request_error"
        assert "file" in err["message"]
        _, _, body = post([("file", wav), ("response_format", b"xml")],
                          expect_error=400)
        assert "xml" in json.loads(body)["error"]["message"]
        # srt/vtt render the aligner's word timestamps as subtitles
        status, ctype, body = post(
            [("file", wav), ("response_format", b"vtt")])
        assert status == 200 and ctype.startswith("text/plain")
        assert body.decode("utf-8").startswith("WEBVTT")
        # word granularity demands verbose_json (OpenAI contract)
        _, _, body = post([
            ("file", wav),
            ("timestamp_granularities[]", b"word"),
        ], expect_error=400)
        assert "verbose_json" in json.loads(body)["error"]["message"]
    finally:
        httpd.shutdown()
        server.close()


def test_openai_temperature_sampling(rng):
    """temperature>0 routes the request through sampled decoding (outside
    the greedy batch): same seed reproduces the transcript, malformed or
    out-of-range temperatures get the OpenAI error envelope."""
    asr = _tiny_asr()
    params = TranscribeParams(max_tokens=3, print_timing=False,
                              prompt_bucket=32, mel_bucket=200)
    server = ASRServer(asr, params, max_batch=2, max_wait_ms=1.0)
    httpd = serve_http(server, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    url = f"http://127.0.0.1:{port}/v1/audio/transcriptions"
    wav = _wav_bytes(_tone(440))

    def post(fields, expect_error=None):
        body, ctype = _multipart(fields)
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": ctype}, method="POST")
        if expect_error is None:
            with urllib.request.urlopen(req, timeout=300) as r:
                return r.status, r.read()
        try:
            urllib.request.urlopen(req, timeout=300)
            raise AssertionError(f"expected HTTP {expect_error}")
        except urllib.error.HTTPError as e:
            assert e.code == expect_error
            return e.code, e.read()

    try:
        fields = [("file", wav), ("temperature", b"0.9"), ("seed", b"11")]
        _, body1 = post(fields)
        _, body2 = post(fields)
        assert json.loads(body1)["text"] == json.loads(body2)["text"]
        # temperature=0 is the plain greedy path
        status, _ = post([("file", wav), ("temperature", b"0")])
        assert status == 200
        # validation: non-numeric and out-of-range -> 400 envelope
        _, body = post([("file", wav), ("temperature", b"warm")],
                       expect_error=400)
        assert "temperature" in json.loads(body)["error"]["message"]
        _, body = post([("file", wav), ("temperature", b"3.5")],
                       expect_error=400)
        assert "[0, 2]" in json.loads(body)["error"]["message"]
        # stream=true + temperature>0 is rejected (greedy-only streaming)
        _, body = post([("file", wav), ("stream", b"true"),
                        ("temperature", b"0.5")], expect_error=400)
        assert "greedy" in json.loads(body)["error"]["message"]
    finally:
        httpd.shutdown()
        server.close()


def test_openai_words_need_aligner(rng):
    """Word timestamps without --aligner-model -> 400 with a pointer to
    the flag, not a crash."""
    asr = _tiny_asr()
    params = TranscribeParams(max_tokens=3, print_timing=False,
                              prompt_bucket=32, mel_bucket=200)
    server = ASRServer(asr, params, max_batch=2, max_wait_ms=1.0)
    httpd = serve_http(server, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    body, ctype = _multipart([
        ("file", _wav_bytes(_tone(330))),
        ("response_format", b"verbose_json"),
        ("timestamp_granularities[]", b"word"),
    ])
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/audio/transcriptions", data=body,
        headers={"Content-Type": ctype}, method="POST")
    try:
        try:
            urllib.request.urlopen(req, timeout=300)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "--aligner-model" in json.loads(e.read())["error"]["message"]
    finally:
        httpd.shutdown()
        server.close()


def test_multipart_filename_before_name():
    """RFC 7578 mandates no parameter order in Content-Disposition:
    'filename=' ahead of 'name=' must not shadow the field name."""
    from qwen3_asr_tpu.serve import _parse_multipart

    boundary = "b123"
    body = (
        b"--b123\r\n"
        b'Content-Disposition: form-data; filename="a.wav"; name="file"\r\n'
        b"\r\npayload\r\n"
        b"--b123\r\n"
        b'Content-Disposition: form-data; name="x"; filename="f"\r\n'
        b"\r\nv1\r\n"
        b"--b123\r\n"
        b'Content-Disposition: form-data; name="x"\r\n'
        b"\r\nv2\r\n"
        b"--b123--\r\n"
    )
    fields = _parse_multipart(body, f"multipart/form-data; boundary={boundary}")
    assert fields["file"] == [b"payload"]
    assert fields["x"] == [b"v1", b"v2"]  # repeats accumulate in order


def test_submit_stream_deltas_match_final(rng):
    """Streaming transcription: deltas concatenate exactly to the final
    prefix-stripped transcript, and the done-result matches a plain
    transcribe of the same audio."""
    from qwen3_asr_tpu.text.prompt import extract_transcript

    asr = _tiny_asr()
    params = TranscribeParams(max_tokens=6, print_timing=False,
                              prompt_bucket=32)
    audio = _tone(440, 1.0)
    plain = asr.transcribe(audio, params)
    assert plain.success

    server = ASRServer(asr, params, max_batch=4, max_wait_ms=5.0)
    try:
        q = server.submit_stream(audio)
        deltas, done = [], None
        while True:
            kind, value = q.get(timeout=300)
            if kind == "delta":
                deltas.append(value)
            elif kind == "done":
                done = value
                break
            else:
                raise AssertionError(f"stream error: {value}")
        assert done.success
        assert done.tokens == plain.tokens  # streaming == whole-loop greedy
        assert done.text == extract_transcript(plain.text)
        assert "".join(deltas) == done.text
    finally:
        server.close()


def test_openai_sse_streaming(rng):
    """`stream=true` returns text/event-stream with delta events, a done
    event whose text equals the joined deltas, and a [DONE] marker."""
    asr = _tiny_asr()
    params = TranscribeParams(max_tokens=4, print_timing=False,
                              prompt_bucket=32, mel_bucket=200)
    server = ASRServer(asr, params, max_batch=2, max_wait_ms=1.0)
    httpd = serve_http(server, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    url = f"http://127.0.0.1:{port}/v1/audio/transcriptions"
    wav = _wav_bytes(_tone(440))
    body, ctype = _multipart([("file", wav), ("stream", b"true")])
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": ctype}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers.get("Content-Type", "").startswith(
                "text/event-stream")
            raw = r.read().decode("utf-8")
        events = [line[len("data: "):] for line in raw.split("\n")
                  if line.startswith("data: ")]
        assert events[-1] == "[DONE]"
        parsed = [json.loads(e) for e in events[:-1]]
        assert parsed[-1]["type"] == "transcript.text.done"
        deltas = [p["delta"] for p in parsed[:-1]]
        assert all(p["type"] == "transcript.text.delta"
                   for p in parsed[:-1])
        assert "".join(deltas) == parsed[-1]["text"]

        # stream + verbose_json is an explicit 400 (OpenAI contract)
        body, ctype = _multipart([
            ("file", wav), ("stream", b"true"),
            ("response_format", b"verbose_json")])
        bad = urllib.request.Request(
            url, data=body, headers={"Content-Type": ctype}, method="POST")
        try:
            urllib.request.urlopen(bad, timeout=60)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        server.close()


def test_streaming_transcript_cleaner_property(rng):
    """Every chunking of every raw-ASR text must clean to exactly
    extract_transcript of the whole (the SSE delta contract)."""
    import random as _random

    from qwen3_asr_tpu.text.prompt import (
        StreamingTranscriptCleaner,
        extract_transcript,
    )

    cases = ["language Korean 안녕하세요 여러분", "language English  hi",
             "language ", "language X", "languish hello", "hello world",
             "", "language Korean", "language Korean   ",
             "Language Korean x", "language korean x", "languag",
             "language Korean\t\n  mixed ws", "language Korean안녕"]
    rnd = _random.Random(0)
    for s in cases:
        for _ in range(25):
            cuts = sorted(rnd.sample(range(len(s) + 1),
                                     min(len(s), rnd.randint(0, 6))))
            parts, prev = [], 0
            for c in cuts + [len(s)]:
                parts.append(s[prev:c])
                prev = c
            cl = StreamingTranscriptCleaner()
            got = "".join(cl.feed(p) for p in parts) + cl.flush()
            assert got == extract_transcript(s), (s, parts, got)
