"""TPU probe round 2: int4 weight stream WITHOUT S4 jit args.

probe_int4.py found that this platform cannot pass jnp.int4 arrays as jit
arguments (device_put layout recursion) and that Mosaic rejects int8
vector shifts (arith.shrsi on i8). So the weight pack must stay int8
PACKED BYTES at the XLA boundary and be reinterpreted in-kernel:

  P0  jax.lax.bitcast_convert_type(int8 tile, int4) -> [C/2, N, 2];
      slice the two nibble planes, astype(int8), two half dots
      (split-half scheme, no shifts). Also discovers nibble order.
  P1  pltpu.bitcast(tile, int4) sublane-expanding bitcast -> [C, N] int4,
      astype(int8), one dot. Discovers row order via structured data.
  P2  int32 shift-unpack (upcast to i32, shrsi by 4, downcast) — known to
      legalize, question is VPU cost.
  P3  ring-stream micro-bench of each compiling variant at megakernel
      chunk shapes, vs the int8 baseline.

Run:  JAX_PLATFORMS=axon python scripts/probe_int4b.py
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

C = 512      # logical chunk rows (in dim) after unpack
N = 2048     # chunk cols
NC = 96      # chunks per bench iteration: int4 stream = 48 MB
NBUF = 3
REPS = 12
ITERS = 16   # kernel launches per jit dispatch — the tunnel's ~30 ms
             # per-dispatch latency would otherwise swamp a ~0.1 ms kernel
             # (probe_int4.py T4 measured pure dispatch latency)


def nibbles(b):
    """int8 byte -> (lo, hi) signed nibbles, numpy semantics."""
    b = b.astype(np.int32)
    hi = b >> 4
    lo = b & 0xF
    lo = np.where(lo >= 8, lo - 16, lo)
    return lo.astype(np.int8), hi.astype(np.int8)


def p0_bitcast_convert():
    """Structured bytes: recover planes via lax.bitcast_convert_type."""
    rng = np.random.default_rng(1)
    b = rng.integers(-128, 128, (C // 2, N), dtype=np.int8)
    lo, hi = nibbles(b)

    def kern(b_ref, lo_ref, hi_ref):
        w4 = jax.lax.bitcast_convert_type(b_ref[...], jnp.int4)  # [C/2, N, 2]
        lo_ref[...] = w4[..., 0].astype(jnp.int8)
        hi_ref[...] = w4[..., 1].astype(jnp.int8)

    lo_k, hi_k = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((C // 2, N), jnp.int8)] * 2,
    )(jnp.asarray(b))
    lo_k, hi_k = np.asarray(lo_k), np.asarray(hi_k)
    print("P0 bitcast_convert_type:",
          "plane0=lo" if np.array_equal(lo_k, lo) else
          ("plane0=hi" if np.array_equal(lo_k, hi) else "plane0=???"),
          "plane1=hi" if np.array_equal(hi_k, hi) else
          ("plane1=lo" if np.array_equal(hi_k, lo) else "plane1=???"),
          flush=True)


def p1_pltpu_bitcast():
    rng = np.random.default_rng(2)
    b = rng.integers(-128, 128, (C // 2, N), dtype=np.int8)
    lo, hi = nibbles(b)

    def kern(b_ref, o_ref):
        w4 = pltpu.bitcast(b_ref[...], jnp.int4)
        o_ref[...] = w4.astype(jnp.int8).reshape(o_ref.shape)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, N), jnp.int8),
    )(jnp.asarray(b))
    out = np.asarray(out)
    # candidate orders
    cands = {
        "rows_interleaved_lo_first": np.empty((C, N), np.int8),
        "rows_interleaved_hi_first": np.empty((C, N), np.int8),
        "half_lo_then_hi": np.concatenate([lo, hi], 0),
        "half_hi_then_lo": np.concatenate([hi, lo], 0),
    }
    cands["rows_interleaved_lo_first"][0::2] = lo
    cands["rows_interleaved_lo_first"][1::2] = hi
    cands["rows_interleaved_hi_first"][0::2] = hi
    cands["rows_interleaved_hi_first"][1::2] = lo
    match = [k for k, v in cands.items() if np.array_equal(out, v)]
    print("P1 pltpu.bitcast order:", match or
          f"??? (out[0,:4]={out[0,:4]} lo[0,:4]={lo[0,:4]} hi[0,:4]={hi[0,:4]},"
          f" out[1,:4]={out[1,:4]})", flush=True)


def p2_i32_shift():
    rng = np.random.default_rng(3)
    b = rng.integers(-128, 128, (8, 128), dtype=np.int8)
    lo, hi = nibbles(b)

    def kern(b_ref, lo_ref, hi_ref):
        w32 = b_ref[...].astype(jnp.int32)
        h = jax.lax.shift_right_arithmetic(w32, jnp.int32(4))
        l = w32 - jax.lax.shift_left(h, jnp.int32(4))   # unsigned low nibble
        l = l - jnp.where(l >= 8, 16, 0)
        lo_ref[...] = l.astype(jnp.int8)
        hi_ref[...] = h.astype(jnp.int8)

    lo_k, hi_k = pl.pallas_call(
        kern, out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.int8)] * 2,
    )(jnp.asarray(b))
    ok = (np.array_equal(np.asarray(lo_k), lo)
          and np.array_equal(np.asarray(hi_k), hi))
    print("P2 int32 shift-unpack:", "OK" if ok else "MISMATCH", flush=True)


# ---------------------------------------------------------------------------
# ring bench
# ---------------------------------------------------------------------------

def ring_call(mode):
    """mode: 'int8' (baseline, full-width bytes) or a packed scheme:
    'bitcast4' (lax.bitcast_convert_type planes), 'pltpu4'
    (pltpu.bitcast one dot), 'i32shift' (int32 unpack planes)."""
    packed = mode != "int8"
    rows = C if mode == "int8" else C // 2

    def kern(x_ref, w_ref, o_ref, wbufs, sems):
        def dma(i, slot):
            return pltpu.make_async_copy(
                w_ref.at[i], wbufs.at[slot], sems.at[slot])

        for j in range(min(NBUF - 1, NC)):
            dma(j, j).start()

        xa = jax.lax.slice(x_ref[...], (0, 0), (1, C // 2))
        xb = jax.lax.slice(x_ref[...], (0, C // 2), (1, C))

        def step(i, acc):
            slot = i % NBUF
            dma(i, slot).wait()

            @pl.when(i + NBUF - 1 < NC)
            def _():
                dma(i + NBUF - 1, (i + NBUF - 1) % NBUF).start()

            b = wbufs[slot]
            if mode == "int8":
                part = jax.lax.dot_general(
                    x_ref[...], b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            elif mode == "bitcast4":
                w4 = jax.lax.bitcast_convert_type(b, jnp.int4)
                lo = w4[..., 0].astype(jnp.int8)
                hi = w4[..., 1].astype(jnp.int8)
                part = (
                    jax.lax.dot_general(xa, lo, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                    + jax.lax.dot_general(xb, hi, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.int32))
            elif mode == "pltpu4":
                w8 = pltpu.bitcast(b, jnp.int4).astype(jnp.int8)
                w8 = w8.reshape(C, N)
                part = jax.lax.dot_general(
                    x_ref[...], w8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            else:  # i32shift
                w32 = b.astype(jnp.int32)
                h = jax.lax.shift_right_arithmetic(w32, jnp.int32(4))
                l = w32 - jax.lax.shift_left(h, jnp.int32(4))
                l = l - jnp.where(l >= 8, 16, 0)
                part = (
                    jax.lax.dot_general(xa, l.astype(jnp.int8),
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                    + jax.lax.dot_general(xb, h.astype(jnp.int8),
                                          (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.int32))
            return acc + part

        acc = jax.lax.fori_loop(
            0, NC, step, jnp.zeros((1, N), jnp.int32), unroll=False)
        o_ref[...] = acc

    return kern, rows


def p3_bench(mode):
    rng = np.random.default_rng(0)
    kern, rows = ring_call(mode)
    w_host = rng.integers(-128 if mode != "int8" else -127,
                          128, (NC, rows, N), dtype=np.int8)
    x_host = rng.integers(-127, 128, (1, C), dtype=np.int8)
    w_dev, x = jnp.asarray(w_host), jnp.asarray(x_host)
    nbytes = NC * rows * N

    call = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((NBUF, rows, N), jnp.int8),
                        pltpu.SemaphoreType.DMA((NBUF,))],
    )
    def many(x, w):
        def it(_, carry):
            x, acc = carry
            y = call(x, w)
            # feed y back into x: genuinely sequential iterations (values
            # evolve — correctness is asserted on the single call below)
            x = jax.lax.slice(y, (0, 0), (1, C)).astype(jnp.int8)
            return x, acc + y

        _, acc = jax.lax.fori_loop(
            0, ITERS, it, (x, jnp.zeros((1, N), jnp.int32)))
        return acc

    f = jax.jit(lambda x, w: call(x, w))
    f_many = jax.jit(many)
    y = np.asarray(f(x, w_dev))

    # numpy reference
    xa32 = x_host.astype(np.int32)[:, :C // 2]
    xb32 = x_host.astype(np.int32)[:, C // 2:]
    x32 = x_host.astype(np.int32)
    ref = np.zeros((1, N), np.int64)
    for i in range(NC):
        if mode == "int8":
            ref += x32 @ w_host[i].astype(np.int32)
        else:
            lo, hi = nibbles(w_host[i])
            if mode == "pltpu4":
                # order checked by P1; assume lo plane = even rows for now,
                # correctness judged leniently (order report is separate)
                w = np.empty((C, N), np.int32)
                w[0::2] = lo
                w[1::2] = hi
                ref += x32 @ w
            else:
                ref += xa32 @ lo.astype(np.int32) + xb32 @ hi.astype(np.int32)
    ok = np.array_equal(y.astype(np.int64), ref)

    # differential timing: dispatch latency (~30 ms on this tunnel) cancels
    # in (t_long - t_short) / (ITERS_long - ITERS_short)
    def mk(iters):
        def many(x, w):
            def it(_, carry):
                x, acc = carry
                y = call(x, w)
                x = jax.lax.slice(y, (0, 0), (1, C)).astype(jnp.int8)
                return x, acc + y

            _, acc = jax.lax.fori_loop(
                0, iters, it, (x, jnp.zeros((1, N), jnp.int32)))
            return acc
        return jax.jit(many)

    I_SHORT, I_LONG = 32, 288
    f_s, f_l = mk(I_SHORT), mk(I_LONG)
    f_s(x, w_dev).block_until_ready()
    f_l(x, w_dev).block_until_ready()

    def best_of(f):
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            f(x, w_dev).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_s, t_l = best_of(f_s), best_of(f_l)
    per = (t_l - t_s) / (I_LONG - I_SHORT)
    gbps = nbytes / per / 1e9
    eff_gbps = NC * C * N / per / 1e9  # logical int8-equivalent rate
    print(f"P3[{mode:8s}] ok={ok} t32={t_s*1e3:7.2f} t288={t_l*1e3:7.2f} "
          f"per={per*1e3:7.4f} ms stream={gbps:6.1f} GB/s "
          f"logical-int8-equiv={eff_gbps:6.1f} GB/s "
          f"({nbytes/1e6:.0f} MB/iter)", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for fn in (p0_bitcast_convert, p1_pltpu_bitcast, p2_i32_shift,
               functools.partial(p3_bench, "int8"),
               functools.partial(p3_bench, "bitcast4"),
               functools.partial(p3_bench, "pltpu4"),
               functools.partial(p3_bench, "i32shift")):
        try:
            fn()
        except Exception:
            print(f"FAILED {getattr(fn, '__name__', fn)}:", flush=True)
            traceback.print_exc()
    print("\nprobe2 done", flush=True)
