#!/usr/bin/env python3
"""Feasibility microbench for the decode megakernel (VERDICT r1 fix#2).

Measures the sustained HBM->VMEM streaming bandwidth of a manual
double-buffered DMA ring inside ONE pallas_call, with the megakernel's
inner compute (int8 GEMV chunks) attached — i.e. the physical ceiling for
an all-layers-in-one-kernel decode step.

Variants:
  int8_m1 : x int8 [1, IN]  x chunk int8 [IN, C] -> int32 MXU dot
  int8_m8 : x int8 [8, IN]  (row-replicated)     -> int32 MXU dot
  bf16_m8 : chunk converted to bf16 on VPU, bf16 dot (fallback if int8
            GEMV doesn't lower)
  dma_only: ring DMAs with near-zero compute (pure bandwidth)

Run ON THE CHIP (from /root/repo): python scripts/microbench_stream.py
Env: MB_CHUNKS (default 280 ~= 28 layers of int8pc weights),
     MB_C (chunk out-width, default 2048), MB_ITERS (default 20).
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IN = 1024
NBUF = 3


def _stream_kernel(x_ref, s_ref, w_hbm, out_ref, bufs, acc, sems, *,
                   n_chunks, mode):
    def dma(i):
        return pltpu.make_async_copy(
            w_hbm.at[i], bufs.at[i % NBUF], sems.at[i % NBUF])

    dma(0).start()
    dma(1).start()

    acc[:] = jnp.zeros_like(acc)

    def body(i, _):
        @pl.when(i + 2 < n_chunks)
        def _():
            dma(i + 2).start()

        dma(i).wait()
        w = bufs[i % NBUF]
        if mode == "dma_only":
            # touch one row so the wait isn't dead (sum -> 32-bit)
            acc[0, :] += jnp.sum(w[0:1, :], axis=0, dtype=jnp.int32
                                 ).astype(jnp.float32)[None, :]
        elif mode.startswith("int8"):
            r = jax.lax.dot_general(
                x_ref[:], w[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc[:] += r.astype(jnp.float32) * s_ref[i][None, :]
        else:  # bf16 convert fallback
            wf = w[:].astype(jnp.bfloat16)
            r = jax.lax.dot_general(
                x_ref[:].astype(jnp.bfloat16), wf,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc[:] += r * s_ref[i][None, :]
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out_ref[:] = acc[:]


def build(n_chunks, C, M, mode):
    kernel = functools.partial(_stream_kernel, n_chunks=n_chunks, mode=mode)
    call = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scales
            pl.BlockSpec(memory_space=pltpu.ANY),    # weights stay in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NBUF, IN, C), jnp.int8),
            pltpu.VMEM((M, C), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    @jax.jit
    def run(x0, w, s, iters):
        def it(t, x):
            y = call(x, s, w)
            nx = jnp.clip(y[:, :IN] * 1e-6 + t, -127, 127).astype(x0.dtype)
            return nx
        return jax.lax.fori_loop(0, iters, it, x0)

    return run


def main():
    n_chunks = int(os.environ.get("MB_CHUNKS", "280"))
    C = int(os.environ.get("MB_C", "2048"))
    iters = int(os.environ.get("MB_ITERS", "20"))
    dev = jax.devices()[0]
    print(f"device: {dev}; chunks {n_chunks} x [{IN},{C}] int8 "
          f"({n_chunks * IN * C / 1e6:.0f} MB/pass)", file=sys.stderr)

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-127, 128, (n_chunks, IN, C), dtype=np.int8))
    s = jnp.asarray(rng.random((n_chunks, C), dtype=np.float32))
    bytes_per = w.nbytes + s.nbytes

    results = {}
    for mode, M in [("dma_only", 8), ("int8_m1", 1), ("int8_m8", 8),
                    ("bf16_m8", 8)]:
        x0 = jnp.asarray(
            rng.integers(-8, 8, (M, IN), dtype=np.int8)
            if mode != "bf16_m8" else
            rng.integers(-8, 8, (M, IN)).astype(np.int8))
        try:
            run = build(n_chunks, C, M, mode)
            np.asarray(run(x0, w, s, 1))  # compile+warm (fetch to host)

            # slope method: the tunnel rig under-reports amortized
            # fori-loop timings (see memory: decode-perf-findings), so
            # measure t(1+iters) - t(1) with full host fetches
            t0 = time.perf_counter()
            np.asarray(run(x0, w, s, 1))
            t1 = time.perf_counter()
            np.asarray(run(x0, w, s, 1 + iters))
            t2 = time.perf_counter()
            dt = ((t2 - t1) - (t1 - t0)) / iters
            gbps = bytes_per / dt / 1e9
            results[mode] = gbps
            print(f"{mode:10s}: {dt * 1e3:7.3f} ms/pass  {gbps:6.1f} GB/s "
                  f"(1-pass wall {(t1 - t0) * 1e3:.1f} ms)", flush=True)
        except Exception as e:
            results[mode] = None
            print(f"{mode:10s}: FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
