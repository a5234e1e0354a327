"""Backend capability probe: can this JAX backend run Mosaic/Pallas TPU
kernels? Probed once with a trivial kernel; used to gate the flash-attention
and int8-matmul fast paths (XLA reference implementations otherwise)."""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


@functools.cache
def has_pallas_tpu() -> bool:
    if os.environ.get("QWEN3_DISABLE_PALLAS", "0") == "1":
        return False
    if jax.default_backend() == "cpu":
        return False
    # Two hardening layers, both learned the hard way:
    # 1. ensure_compile_time_eval: the first call often happens while
    #    TRACING a jitted caller (generate_greedy checks this flag). A
    #    traced probe returns a tracer, bool() raises, and the except
    #    branch would cache False — silently disabling every Pallas fast
    #    path (megakernel/flash/decode-attention) for the process, purely
    #    depending on call order.
    # 2. retry: a transient backend/tunnel error must not cache False
    #    either.
    last: Exception | None = None
    for attempt in range(3):
        try:
            def k(x_ref, o_ref):
                o_ref[:] = x_ref[:] * 2.0

            with jax.ensure_compile_time_eval():
                out = pl.pallas_call(
                    k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
                )(jnp.ones((8, 128), jnp.float32))
                ok = bool(out[0, 0] == 2.0)
            return ok
        except Exception as e:
            last = e
            time.sleep(0.5 * (attempt + 1))
    print(
        f"qwen3_asr_tpu: Pallas TPU probe failed after 3 attempts "
        f"({last!r}); falling back to XLA-only paths (slower decode)",
        file=sys.stderr, flush=True,
    )
    return False


def wait_for_backend(retries: int = 3, sleep_s: float = 60.0):
    """Block until jax.devices() succeeds, retrying backend init.

    The network-attached TPU's first contact can return UNAVAILABLE for
    many minutes during tunnel churn; benches and one-shot jobs want to
    ride it out instead of dying with no artifact. Each failed attempt may
    itself take minutes (the plugin's own connect timeout). Returns the
    first device; raises the last error after `retries` failures."""
    last: Exception | None = None
    for attempt in range(retries):
        try:
            dev = jax.devices()[0]
            if attempt:
                print(f"qwen3_asr_tpu: backend up after {attempt} retries",
                      file=sys.stderr, flush=True)
            return dev
        except Exception as e:  # noqa: BLE001 — init error shapes vary
            last = e
            if attempt == retries - 1:
                break  # no point sleeping before the terminal raise
            print(f"qwen3_asr_tpu: backend init attempt {attempt} failed "
                  f"({e}); retrying in {sleep_s:.0f}s",
                  file=sys.stderr, flush=True)
            time.sleep(sleep_s)
    raise last
