"""Op-level device profile of the flagship decode loop (int4 weights +
int8 KV megakernel).

bench.py attributes device time per jitted MODULE; this script goes one
level down: it traces a fixed-length generate_greedy run and sums the
"XLA Ops" (op-level) device track by op name, so the decode module's time
splits into megakernel custom-call vs XLA glue (embedding gather, cache
scatter, while-loop plumbing). That split decides where VERDICT r4 #4's
remaining ~0.1 ms/step lives.

Usage: python scripts/profile_decode_ops.py [n_tokens]
"""
import sys, os, glob, gzip, json, time, collections, dataclasses, tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from qwen3_asr_tpu.config import ASRModelConfig
from qwen3_asr_tpu.runtime.params import (
    init_asr_params, quantize_decoder_params, fuse_decoder_params,
    host_staging, ship_to_device)
from qwen3_asr_tpu.ops.megakernel import pack_megakernel_params
from qwen3_asr_tpu.models.generate import generate_greedy
from qwen3_asr_tpu.ops.support import has_pallas_tpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
print("has_pallas_tpu:", has_pallas_tpu(), file=sys.stderr)

cfg = ASRModelConfig()
with host_staging():
    params = init_asr_params(cfg, seed=0, dtype=jnp.bfloat16)
    dec = quantize_decoder_params(params["decoder"], "int8pc")
    dec = fuse_decoder_params(dec)
    dec["mega"] = pack_megakernel_params(dec, cfg.decoder, int4=True)
dec = ship_to_device(dec)
dcfg = dataclasses.replace(cfg.decoder, eos_token_id=-1)

# 92 s workload shape: n_audio=1196 frames, prompt ~1219, S rounds to 1664
n_audio = 1196
from qwen3_asr_tpu.text.prompt import audio_start_pos, build_asr_prompt
prompt = build_asr_prompt(n_audio, dcfg)
off = audio_start_pos(prompt, dcfg)
n_prompt = len(prompt)
P = -(-n_prompt // 128) * 128
toks = np.full(P, dcfg.pad_token_id, np.int32)
toks[:n_prompt] = prompt
audio = jnp.zeros((P - (n_prompt - n_audio), dcfg.hidden_size), jnp.bfloat16)

def run():
    out, n_kept = generate_greedy(
        dec, dcfg, jnp.asarray(toks), jnp.int32(n_prompt), audio,
        jnp.int32(n_audio), off, N, cache_dtype=jnp.int8)
    jax.block_until_ready((out, n_kept))

run()  # compile
t0 = time.perf_counter(); run(); wall = (time.perf_counter() - t0) * 1e3
print(f"wall: {wall:.1f} ms for prefill+{N} steps "
      f"({(wall)/N:.3f} ms/step incl prefill)", file=sys.stderr)

td = tempfile.mkdtemp()
with jax.profiler.trace(td):
    run()
paths = glob.glob(os.path.join(td, "**", "*.trace.json.gz"), recursive=True)
with gzip.open(paths[0], "rt") as f:
    trace = json.load(f)

events = trace.get("traceEvents", [])
proc, thr = {}, {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        proc[e["pid"]] = e["args"].get("name", "")
    elif e.get("ph") == "M" and e.get("name") == "thread_name":
        thr[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
dev_pids = {p for p, n in proc.items() if "TPU" in n or "/device:" in n}
print("device tracks:", sorted({thr[k] for k in thr if k[0] in dev_pids}),
      file=sys.stderr)

# pick the op-level track(s): anything on a device pid that is NOT the
# module-level rollup
by_track = collections.defaultdict(lambda: collections.Counter())
cnt_track = collections.defaultdict(lambda: collections.Counter())
for e in events:
    if e.get("ph") != "X" or "dur" not in e:
        continue
    key = (e.get("pid"), e.get("tid"))
    if key[0] not in dev_pids:
        continue
    tname = thr.get(key, "?")
    by_track[tname][e.get("name", "?")] += e["dur"] / 1e3
    cnt_track[tname][e.get("name", "?")] += 1

for tname, ops in sorted(by_track.items()):
    total = sum(ops.values())
    print(f"\n=== track '{tname}': {total:.1f} ms total ===")
    for name, ms in ops.most_common(25):
        print(f"  {ms:9.2f} ms  n={cnt_track[tname][name]:5d}  "
              f"avg={ms / max(cnt_track[tname][name], 1) * 1e3:7.1f} us  {name[:90]}")
