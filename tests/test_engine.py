"""Continuous-batching engine (pipeline/engine.py): slot-pool decode.

Correctness properties under test:
  - transcripts are independent of WHEN a request was admitted (a slot
    joining mid-flight sees exactly its own prefill + decode state);
  - retired slots are reusable (whole-slab replacement leaves no stale
    KV rows behind);
  - the serve worker in continuous mode matches the closed-batch
    server's results end-to-end (HTTP layer included via /healthz).

All kernel work runs the batched megakernel in interpret mode on CPU;
on-chip Mosaic equality is chipgate's job (scripts/chipgate.py).
"""

import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.config import tiny_asr_config
from qwen3_asr_tpu.pipeline.asr import Qwen3ASR, TranscribeParams
from qwen3_asr_tpu.pipeline.engine import ContinuousEngine

from helpers import make_byte_vocab


def _tiny_asr():
    cfg = tiny_asr_config()
    asr = Qwen3ASR(dtype=jnp.bfloat16, quantize="int8pc", kv_int8=True)
    asr.load_random(cfg, seed=7,
                    vocab=make_byte_vocab(cfg.decoder.vocab_size, {}))
    assert "mega" in asr.params["decoder"]
    return asr


def _tone(freq, seconds=1.0):
    t = np.arange(int(seconds * 16000)) / 16000
    return (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _engine(asr, pool=2, round_tokens=2, max_tokens=6):
    return ContinuousEngine(asr, pool=pool, round_tokens=round_tokens,
                            max_tokens=max_tokens, prompt_bucket=32,
                            mel_bucket=200, s_pool=128, interpret=True)


def _drain(eng, want: int, limit: int = 64):
    done = []
    for _ in range(limit):
        done += eng.run_round()
        if len(done) >= want:
            return done
    raise AssertionError(f"engine did not finish {want} requests "
                         f"in {limit} rounds")


def test_staggered_admission_matches_together(rng):
    """The same request decodes to the same tokens whether it was in the
    pool from the start or admitted mid-flight into a retired slot."""
    asr = _tiny_asr()
    audios = [_tone(220, 1.0), _tone(440, 1.3), _tone(880, 0.8)]

    eng_a = _engine(asr)
    eng_a.admit(["r0", "r1"], audios[:2])
    got_a = dict(eng_a.run_round())          # one round, nobody done yet?
    # admit the third as soon as a slot frees (or immediately if pool>n)
    admitted3 = False
    for _ in range(64):
        if not admitted3 and eng_a.free_slots():
            eng_a.admit(["r2"], audios[2:])
            admitted3 = True
        for t, r in eng_a.run_round():
            got_a[t] = r
        if len(got_a) == 3:
            break
    assert admitted3 and len(got_a) == 3
    assert eng_a.n_admitted == 3 and eng_a.n_completed == 3
    assert eng_a.free_slots() == [0, 1]      # pool drained

    # reference: all three through a fresh pool-3 engine at once
    eng_b = _engine(asr, pool=3)
    eng_b.admit(["r0", "r1", "r2"], audios)
    got_b = dict(_drain(eng_b, 3))
    for k in ("r0", "r1", "r2"):
        assert got_a[k].success and got_b[k].success
        assert got_a[k].tokens == got_b[k].tokens, k


def test_engine_matches_closed_path(rng):
    """Engine transcripts equal the single-utterance pipeline's (same
    int8pc weights; the interpret-mode megakernel and the XLA path are
    token-equal on this model — the kernel parity suite's contract)."""
    asr = _tiny_asr()
    params = TranscribeParams(max_tokens=6, print_timing=False,
                              prompt_bucket=32, mel_bucket=200)
    audios = [_tone(220, 1.0), _tone(660, 1.2)]
    expected = [asr.transcribe(a, params).tokens for a in audios]

    eng = _engine(asr)
    eng.admit(["a", "b"], audios)
    got = dict(_drain(eng, 2))
    assert got["a"].tokens == expected[0]
    assert got["b"].tokens == expected[1]


def test_slot_reuse_no_stale_state(rng):
    """A slot that served a LONG prompt then retires must serve a SHORT
    one identically to a fresh pool (whole-slab replacement: no stale
    rows; position gating: no reads past the new prompt)."""
    asr = _tiny_asr()
    long_a, short_a = _tone(440, 2.0), _tone(220, 0.7)

    eng = _engine(asr, pool=1)
    eng.admit(["long"], [long_a])
    first = dict(_drain(eng, 1))
    eng.admit(["short"], [short_a])
    reused = dict(_drain(eng, 1))

    fresh = _engine(asr, pool=1)
    fresh.admit(["short"], [short_a])
    alone = dict(_drain(fresh, 1))
    assert reused["short"].tokens == alone["short"].tokens
    assert first["long"].tokens  # the long one produced something too


def test_kv_stream_pool_matches_resident(rng):
    """A streamed-KV slot pool (block-major scales, online-softmax KV
    folding) produces the same transcripts as the resident pool — same
    weights, same prefill, different attention structure."""
    asr = _tiny_asr()
    audios = [_tone(220, 1.0), _tone(440, 1.3)]

    res = _engine(asr)
    res.admit(["a", "b"], audios)
    got_res = dict(_drain(res, 2))

    stream = ContinuousEngine(asr, pool=2, round_tokens=2, max_tokens=6,
                              prompt_bucket=32, mel_bucket=200,
                              s_pool=256, kv_stream=True, interpret=True)
    assert stream.stats()["kv_stream"] is True
    stream.admit(["a", "b"], audios)
    got_stream = dict(_drain(stream, 2))
    for k in ("a", "b"):
        assert got_stream[k].tokens == got_res[k].tokens, k


def test_eos_budget_and_stats(rng):
    """Budget cap: a slot retires at max_tokens even though the device
    lane keeps stepping to the round edge; stats stay consistent."""
    asr = _tiny_asr()
    eng = _engine(asr, max_tokens=3, round_tokens=4)
    eng.admit(["x"], [_tone(330, 1.0)])
    (ticket, res), = _drain(eng, 1)
    assert ticket == "x" and res.success
    assert len(res.tokens) <= 3
    s = eng.stats()
    assert s["completed"] == 1 and s["active"] == 0
    assert 0.0 < s["slot_utilization"] <= 1.0


def test_server_continuous_backlog_pressure(rng):
    """More requests than pool slots, mixed lengths: pool-overflow
    requests wait in the engine backlog (never the closed path) and all
    transcripts match the single-utterance pipeline."""
    from qwen3_asr_tpu.serve import ASRServer

    asr = _tiny_asr()
    params = TranscribeParams(max_tokens=4, print_timing=False,
                              prompt_bucket=32, mel_bucket=200)
    freqs = [220, 330, 440, 550, 660, 880]
    lens = [1.0, 0.6, 1.4, 0.9, 1.1, 0.7]
    audios = [_tone(f, s) for f, s in zip(freqs, lens)]
    expected = [asr.transcribe(a, params).tokens for a in audios]

    server = ASRServer(asr, params, max_batch=8, continuous=True,
                       pool=2, round_tokens=2, engine_context=128)
    try:
        futures = [server.submit(a) for a in audios]
        got = [f.result(timeout=600) for f in futures]
        assert [g.tokens for g in got] == expected
        st = server._engine.stats()
        assert st["completed"] == 6 and st["pool"] == 2
    finally:
        server.close()


def test_decode_failure_fails_slots_not_worker(rng, monkeypatch):
    """A decode-round crash must fail the in-flight futures and leave the
    worker + pool serviceable for the next request (donated buffers are
    reallocated by fail_active)."""
    import qwen3_asr_tpu.pipeline.engine as ENG
    from qwen3_asr_tpu.serve import ASRServer

    asr = _tiny_asr()
    params = TranscribeParams(max_tokens=4, print_timing=False,
                              prompt_bucket=32, mel_bucket=200)
    a = _tone(440, 1.0)
    expected = asr.transcribe(a, params).tokens

    server = ASRServer(asr, params, max_batch=2, continuous=True,
                       round_tokens=2, engine_context=128)
    try:
        real = ENG._decode_round

        def boom(*args, **kw):
            raise RuntimeError("injected decode failure")

        monkeypatch.setattr(ENG, "_decode_round", boom)
        fut = server.submit(a)
        try:
            fut.result(timeout=300)
            raise AssertionError("expected the injected failure")
        except RuntimeError as e:
            assert "injected" in str(e)
        monkeypatch.setattr(ENG, "_decode_round", real)
        ok = server.submit(a).result(timeout=300)  # pool recovered
        assert ok.success and ok.tokens == expected
    finally:
        server.close()


def test_server_continuous_mode(rng):
    """ASRServer(continuous=True) end-to-end: results match the closed
    batcher, mixed traffic (sampled override) still served, /healthz
    reports engine stats."""
    import json
    import urllib.request

    from qwen3_asr_tpu.serve import ASRServer, serve_http

    asr = _tiny_asr()
    params = TranscribeParams(max_tokens=4, print_timing=False,
                              prompt_bucket=32, mel_bucket=200)
    audios = [_tone(f, s) for f, s in
              [(220, 1.0), (440, 1.3), (880, 0.8), (330, 1.0)]]
    expected = [asr.transcribe(a, params).tokens for a in audios]

    server = ASRServer(asr, params, max_batch=4, continuous=True,
                       round_tokens=2, engine_context=128)
    try:
        futures = [server.submit(a) for a in audios]
        # a per-request override rides the closed path between rounds
        fut_solo = server.submit(audios[0], params)
        got = [f.result(timeout=300) for f in futures]
        solo = fut_solo.result(timeout=300)
        assert [g.tokens for g in got] == expected
        assert solo.tokens == expected[0]
        assert server._engine.n_completed == 4

        httpd = serve_http(server, "127.0.0.1", 0)
        port = httpd.server_address[1]
        t = __import__("threading").Thread(target=httpd.serve_forever,
                                           daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
                health = json.loads(r.read())
            assert health["engine"]["completed"] == 4
            assert health["engine"]["pool"] == 4
        finally:
            httpd.shutdown()
    finally:
        server.close()


def test_stream_rides_continuous_pool(rng):
    """SSE streaming requests ride the slot pool in continuous mode
    (engine on_progress hook -> per-round deltas): deltas concatenate to
    the final prefix-stripped text, tokens match the closed path, and
    the request is counted as an ENGINE completion (not _run_stream)."""
    from qwen3_asr_tpu.serve import ASRServer
    from qwen3_asr_tpu.text.prompt import extract_transcript

    asr = _tiny_asr()
    params = TranscribeParams(max_tokens=4, print_timing=False,
                              prompt_bucket=32, mel_bucket=200)
    audio = _tone(440, 1.0)
    plain = asr.transcribe(audio, params)
    assert plain.success

    server = ASRServer(asr, params, max_batch=4, continuous=True,
                       round_tokens=2, engine_context=128)
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
        assert done.tokens == plain.tokens
        assert done.text == extract_transcript(plain.text)
        assert "".join(deltas) == done.text
        # the stream went through the pool, not the solo token-callback path
        assert server._engine.n_completed == 1
    finally:
        server.close()
