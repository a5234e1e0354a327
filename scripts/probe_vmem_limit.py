"""Find the real VMEM ceiling of the single-seq decode megakernel.

The long-context guard (ops/megakernel.py::mega_max_context) predicts the
kernel's VMEM footprint and gates `use_mega` on a budget constant. This
probe calibrates that constant against the chip instead of guessing:
AOT-compile (ShapeDtypeStructs only — no weight upload) the bf16-KV
megakernel (the most bytes-per-cache-row config) at increasing context
lengths S and report where Mosaic refuses.

Two phases so the CPU pack never touches the flaky axon backend:
  python scripts/probe_vmem_limit.py --dump-shapes /tmp/mega_shapes.json
  nohup python scripts/probe_vmem_limit.py > /tmp/probe_vmem.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
import traceback

SHAPES = "/tmp/mega_shapes.json"


def dump_shapes():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from qwen3_asr_tpu.config import DecoderConfig
    from qwen3_asr_tpu.ops.megakernel import pack_megakernel_params
    from qwen3_asr_tpu.runtime.params import (
        fuse_decoder_params,
        init_decoder_params,
        quantize_decoder_params,
    )

    cfg = DecoderConfig()
    dec = init_decoder_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    dec = jax.tree.map(np.asarray, dec)
    dec = fuse_decoder_params(quantize_decoder_params(dec, "int8pc"))
    mega = pack_megakernel_params(dec, cfg)
    out = {k: [list(v.shape), str(v.dtype)] for k, v in mega.items()}
    with open(SHAPES, "w") as f:
        json.dump(out, f)
    print(f"wrote {SHAPES}: {len(out)} leaves")


def main():
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    import jax
    import jax.numpy as jnp

    from qwen3_asr_tpu.config import DecoderConfig
    from qwen3_asr_tpu.ops.megakernel import (
        mega_decode_step,
        mega_decode_step_i8,
    )

    with open(SHAPES) as f:
        mega_s = {k: jax.ShapeDtypeStruct(tuple(s), jnp.dtype(d))
                  for k, (s, d) in json.load(f).items()}

    # the axon tunnel flakes on first contact; retry before giving up
    for attempt in range(5):
        try:
            dev = jax.devices()[0]
            print(f"backend up: {dev.platform} {dev.device_kind}", flush=True)
            break
        except Exception as e:
            print(f"backend init attempt {attempt}: {e}", flush=True)
            time.sleep(60)
    else:
        sys.exit("axon backend unavailable after 5 attempts")

    cfg = DecoderConfig()
    H, L = cfg.hidden_size, cfg.n_layers
    DKV = cfg.n_kv_heads * cfg.head_dim

    x = jax.ShapeDtypeStruct((1, H), jnp.bfloat16)
    pos = jax.ShapeDtypeStruct((), jnp.int32)
    bf16_step = jax.jit(mega_decode_step, static_argnames=("cfg", "interpret"))

    def try_compile(S, kv):
        if kv == "bf16":
            kc = jax.ShapeDtypeStruct((L, S, DKV), jnp.bfloat16)
            fn, args = bf16_step, (mega_s, cfg, x, pos, kc, kc)
        else:
            kc = jax.ShapeDtypeStruct((L, S, DKV), jnp.int8)
            ks = jax.ShapeDtypeStruct((L, cfg.n_kv_heads, S), jnp.float32)
            fn, args = mega_decode_step_i8, (mega_s, cfg, x, pos, kc, kc, ks, ks)
        t0 = time.time()
        try:
            fn.lower(*args).compile()
            print(f"S={S:6d} kv={kv:4s}: COMPILED in {time.time()-t0:.0f}s",
                  flush=True)
            return True
        except Exception as e:
            msg = str(e).splitlines()
            head = next((l for l in msg if "vmem" in l.lower()),
                        msg[0] if msg else "?")
            print(f"S={S:6d} kv={kv:4s}: FAILED in {time.time()-t0:.0f}s: "
                  f"{head[:300]}", flush=True)
            if "vmem" not in str(e).lower():
                traceback.print_exc()
            return False

    results = {}
    # bf16 KV: per-cache-row cost 2*DKV*2 = 4 KiB; S=1664 is the known-good
    # round-2 workload (est ~15.2 MB total with the ring + norms).
    for S in (1664, 2304, 3200, 4608, 6144, 9216, 13312):
        ok = try_compile(S, "bf16")
        results[("bf16", S)] = ok
        if not ok:
            break
    for S in (3328, 6144, 9216, 13312):
        ok = try_compile(S, "i8")
        results[("i8", S)] = ok
        if not ok:
            break
    print("RESULTS:", results, flush=True)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    # --shapes PATH applies to BOTH phases (dump and probe); the probe
    # phase previously always read the default path, silently ignoring a
    # custom --dump-shapes destination
    if "--shapes" in sys.argv:
        i = sys.argv.index("--shapes")
        SHAPES = sys.argv[i + 1]
    if "--dump-shapes" in sys.argv:
        i = sys.argv.index("--dump-shapes")
        if len(sys.argv) > i + 1 and not sys.argv[i + 1].startswith("-"):
            SHAPES = sys.argv[i + 1]
        dump_shapes()
    else:
        main()
