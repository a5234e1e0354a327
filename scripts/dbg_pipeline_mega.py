"""Why is the pipeline's fused ASR leg slower than bench.py's fused path?"""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.pipeline.asr import Qwen3ASR, TranscribeParams
from qwen3_asr_tpu.text.bpe import _byte_to_unicode
from qwen3_asr_tpu.ops.support import has_pallas_tpu

table = _byte_to_unicode()
acfg = ASRModelConfig()
vocab = [table[b] for b in range(256)]
vocab += [f"[PAD{i}]" for i in range(256, acfg.decoder.vocab_size)]
asr = Qwen3ASR(dtype=jnp.bfloat16, quantize="int8pc")
asr.load_random(acfg, seed=0, vocab=vocab)
asr.cfg = dataclasses.replace(
    asr.cfg, decoder=dataclasses.replace(asr.cfg.decoder, eos_token_id=-1))
print("has_pallas:", has_pallas_tpu())
print("mega attached:", "mega" in asr.params["decoder"])

rng = np.random.default_rng(0)
t = np.arange(int(92 * 16000)) / 16000
audio_f32 = (0.3 * np.sin(2 * np.pi * 440 * t)
             + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
audio_i16 = (audio_f32 * 32767).clip(-32768, 32767).astype(np.int16)

params = TranscribeParams(max_tokens=323, print_timing=False, fused=True)
for label, audio in (("f32", audio_f32), ("i16", audio_i16)):
    r = asr.transcribe(audio, params)
    assert r.success, r.error_msg
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = asr.transcribe(audio, params)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"pipeline fused {label}: best {min(ts):.1f} ms "
          f"(t_total_ms={r.t_total_ms:.1f}, tokens={len(r.tokens)})")
