#!/usr/bin/env python3
"""Isolate the q8 GEMV kernel's per-call overhead vs HBM streaming rate.

Times a fori_loop of N dependent GEMVs for: (a) XLA bf16 dense, (b) Pallas
q8 int8, at decode-realistic shapes. Prints per-call microseconds and the
implied HBM bandwidth. Run on the TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.ops.q8_matmul import q8_matmul, quantize_q8_weights


def timeit(fn, *args, iters=3):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else fn(*args).block_until_ready()
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        (r[0] if isinstance(r, tuple) else r).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    shapes = [(1024, 4096), (1024, 3072 * 2), (3072, 1024)]
    N = int(os.environ.get("MB_ITERS", "5000"))
    rng = np.random.default_rng(0)

    for n_in, n_out in shapes:
        w = (rng.standard_normal((n_in, n_out)) * 0.02).astype(np.float32)
        q, s = quantize_q8_weights(w)
        wb = jnp.asarray(w, jnp.bfloat16)
        qd, sd = jnp.asarray(q), jnp.asarray(s)
        x0 = jnp.asarray(rng.standard_normal((1, n_in)), jnp.bfloat16)

        @jax.jit
        def loop_bf16(x, wb=wb):
            def body(i, x):
                y = jnp.dot(x, wb, preferred_element_type=jnp.float32)
                return x + (y[:, :1] * 1e-9).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, N, body, x)

        @jax.jit
        def loop_q8(x, qd=qd, sd=sd):
            def body(i, x):
                y = q8_matmul(x, qd, sd)
                return x + (y[:, :1] * 1e-9).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, N, body, x)

        t_bf = timeit(loop_bf16, x0) / N
        t_q8 = timeit(loop_q8, x0) / N
        bw_bf = n_in * n_out * 2 / t_bf / 1e9
        bw_q8 = (n_in * n_out + n_in * n_out // 32 * 4) / t_q8 / 1e9
        print(f"[{n_in:6d} x {n_out:6d}] bf16 {t_bf*1e6:7.1f} us ({bw_bf:5.0f} GB/s)"
              f" | q8 {t_q8*1e6:7.1f} us ({bw_q8:5.0f} GB/s)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
