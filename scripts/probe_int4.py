"""TPU feasibility probe for an int4 weight stream in the decode megakernel.

Answers, on the real chip:
  T1  does XLA handle jnp.int4 arrays + astype at all?
  T2  can Mosaic DMA an int4 HBM array into an int4 VMEM scratch and
      upcast it to int8 for an MXU dot? (the cleanest design)
  T3  do arithmetic shifts on int8 vectors lower in Mosaic? (needed by the
      packed-byte fallback schemes)
  T4  ring-streaming micro-bench: effective HBM GB/s and ms/iter for
      (a) int8 baseline, (b) native int4 + astype, (c) packed-byte
      shift-unpack split-half, at megakernel-like chunk shapes.

Run:  JAX_PLATFORMS=axon python scripts/probe_int4.py
"""

from __future__ import annotations

import functools
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 512      # chunk rows (in dim)
N = 2048     # chunk cols (out dim)
NC = 96      # chunks per iteration  -> int8 stream = 96 MB
NBUF = 3
REPS = 30


def banner(name):
    print(f"\n=== {name} ===", flush=True)


def t1_xla_int4():
    w = jnp.asarray(np.random.randint(-8, 8, (C, N), np.int8))
    w4 = w.astype(jnp.int4)
    x = jnp.asarray(np.random.randint(-127, 128, (1, C), np.int8))
    y = jax.jit(lambda x, w4: jax.lax.dot_general(
        x, w4.astype(jnp.int8), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32))(x, w4)
    ref = np.asarray(x, np.int32) @ np.asarray(w, np.int32)
    ok = np.array_equal(np.asarray(y), ref)
    print("T1 xla int4 astype+dot:", "OK" if ok else "MISMATCH", flush=True)
    return ok


def t2_mosaic_int4_dma():
    def kern(x_ref, w_ref, o_ref, wbuf, sem):
        cp = pltpu.make_async_copy(w_ref, wbuf, sem)
        cp.start()
        cp.wait()
        w8 = wbuf[...].astype(jnp.int8)
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    w = np.random.randint(-8, 8, (C, N), np.int8)
    x = np.random.randint(-127, 128, (1, C), np.int8)
    y = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((C, N), jnp.int4),
                        pltpu.SemaphoreType.DMA],
    )(jnp.asarray(x), jnp.asarray(w).astype(jnp.int4))
    ref = x.astype(np.int32) @ w.astype(np.int32)
    ok = np.array_equal(np.asarray(y), ref)
    print("T2 mosaic int4 DMA+astype+dot:", "OK" if ok else "MISMATCH",
          flush=True)
    return ok


def t2b_mosaic_int4_sliced_dma():
    """Same but DMA a sublane SLICE of the int4 HBM array (the megakernel
    slices weight packs along the in dim)."""
    def kern(x_ref, w_ref, o_ref, wbuf, sem):
        cp = pltpu.make_async_copy(
            w_ref.at[pl.ds(C, C), :], wbuf, sem)
        cp.start()
        cp.wait()
        w8 = wbuf[...].astype(jnp.int8)
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    w = np.random.randint(-8, 8, (2 * C, N), np.int8)
    x = np.random.randint(-127, 128, (1, C), np.int8)
    y = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((C, N), jnp.int4),
                        pltpu.SemaphoreType.DMA],
    )(jnp.asarray(x), jnp.asarray(w).astype(jnp.int4))
    ref = x.astype(np.int32) @ w[C:].astype(np.int32)
    ok = np.array_equal(np.asarray(y), ref)
    print("T2b mosaic int4 sliced DMA:", "OK" if ok else "MISMATCH",
          flush=True)
    return ok


def t3_mosaic_int8_shift():
    def kern(b_ref, hi_ref, lo_ref):
        b = b_ref[...]
        hi_ref[...] = jax.lax.shift_right_arithmetic(b, jnp.int8(4))
        lo_ref[...] = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(b, jnp.int8(4)), jnp.int8(4))

    b = np.random.randint(-128, 128, (8, 128), np.int8)
    hi, lo = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.int8)] * 2,
    )(jnp.asarray(b))
    ref_hi = (b.astype(np.int32) >> 4).astype(np.int8)
    ref_lo = ((b.astype(np.int32) << 4).astype(np.int8) >> 4).astype(np.int8)
    ok = (np.array_equal(np.asarray(hi), ref_hi)
          and np.array_equal(np.asarray(lo), ref_lo))
    print("T3 mosaic int8 shifts:", "OK" if ok else "MISMATCH", flush=True)
    return ok


# ---------------------------------------------------------------------------
# T4: ring-streaming micro-bench
# ---------------------------------------------------------------------------

def ring_kernel_factory(mode):
    """mode: 'int8' | 'int4' | 'packed'."""

    def kern(x_ref, w_ref, o_ref, wbufs, sems):
        def dma(i, slot):
            return pltpu.make_async_copy(
                w_ref.at[i], wbufs.at[slot], sems.at[slot])

        for j in range(min(NBUF - 1, NC)):
            dma(j, j).start()

        def step(i, acc):
            slot = i % NBUF
            dma(i, slot).wait()

            @pl.when(i + NBUF - 1 < NC)
            def _():
                dma(i + NBUF - 1, (i + NBUF - 1) % NBUF).start()

            if mode == "int8":
                w8 = wbufs[slot]
                part = jax.lax.dot_general(
                    x_ref[...], w8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            elif mode == "int4":
                w8 = wbufs[slot].astype(jnp.int8)
                part = jax.lax.dot_general(
                    x_ref[...], w8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            else:  # packed: bytes [C//2, N]; lo nibble = rows 0..C/2,
                   # hi nibble = rows C/2..C (split-half scheme)
                b = wbufs[slot]
                hi = jax.lax.shift_right_arithmetic(b, jnp.int8(4))
                lo = jax.lax.shift_right_arithmetic(
                    jax.lax.shift_left(b, jnp.int8(4)), jnp.int8(4))
                xa = jax.lax.slice(x_ref[...], (0, 0), (1, C // 2))
                xb = jax.lax.slice(x_ref[...], (0, C // 2), (1, C))
                pa = jax.lax.dot_general(
                    xa, lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                pb = jax.lax.dot_general(
                    xb, hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                part = pa + pb
            return acc + part

        acc = jax.lax.fori_loop(
            0, NC, step, jnp.zeros((1, N), jnp.int32), unroll=False)
        o_ref[...] = acc

    return kern


def t4_bench(mode):
    rng = np.random.default_rng(0)
    if mode == "int8":
        w_host = rng.integers(-127, 128, (NC, C, N), dtype=np.int8)
        w_dev = jnp.asarray(w_host)
        scratch = pltpu.VMEM((NBUF, C, N), jnp.int8)
        nbytes = NC * C * N
    elif mode == "int4":
        w_host = rng.integers(-8, 8, (NC, C, N), dtype=np.int8)
        w_dev = jnp.asarray(w_host).astype(jnp.int4)
        scratch = pltpu.VMEM((NBUF, C, N), jnp.int4)
        nbytes = NC * C * N // 2
    else:
        w_host = rng.integers(-128, 128, (NC, C // 2, N), dtype=np.int8)
        w_dev = jnp.asarray(w_host)
        scratch = pltpu.VMEM((NBUF, C // 2, N), jnp.int8)
        nbytes = NC * C * N // 2

    x = jnp.asarray(rng.integers(-127, 128, (1, C), dtype=np.int8))
    call = pl.pallas_call(
        ring_kernel_factory(mode),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
        scratch_shapes=[scratch, pltpu.SemaphoreType.DMA((NBUF,))],
    )
    f = jax.jit(lambda x, w: call(x, w))
    y = f(x, w_dev)
    y.block_until_ready()

    # correctness vs numpy
    if mode == "int8" or mode == "int4":
        ref = sum(np.asarray(x, np.int32) @ w_host[i].astype(np.int32)
                  for i in range(NC))
    else:
        hi = (w_host.astype(np.int32) >> 4)
        lo = ((w_host.astype(np.int32) << 4).astype(np.int8) >> 4)
        xa = np.asarray(x, np.int32)[:, :C // 2]
        xb = np.asarray(x, np.int32)[:, C // 2:]
        ref = sum(xa @ lo[i].astype(np.int32) + xb @ hi[i].astype(np.int32)
                  for i in range(NC))
    ok = np.array_equal(np.asarray(y), ref)

    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        f(x, w_dev).block_until_ready()
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    med = sorted(ts)[len(ts) // 2]
    gbps = nbytes / best / 1e9
    print(f"T4[{mode:6s}] ok={ok} best={best*1e3:7.3f} ms "
          f"med={med*1e3:7.3f} ms  -> {gbps:6.1f} GB/s "
          f"({nbytes/1e6:.0f} MB/iter)", flush=True)
    return ok


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for fn in (t1_xla_int4, t2_mosaic_int4_dma, t2b_mosaic_int4_sliced_dma,
               t3_mosaic_int8_shift,
               functools.partial(t4_bench, "int8"),
               functools.partial(t4_bench, "int4"),
               functools.partial(t4_bench, "packed")):
        try:
            fn()
        except Exception:
            name = getattr(fn, "__name__", str(fn))
            print(f"FAILED {name}:", flush=True)
            traceback.print_exc()
    print("\nprobe done", flush=True)
