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
    # The probe is retried: a transient backend/tunnel error here would
    # otherwise cache False and silently disable every Pallas fast path
    # (flash attention, decode-attention, the decode megakernel) for the
    # life of the process — observed in practice on a network-attached
    # chip, costing ~35% decode throughput with no diagnostic.
    last: Exception | None = None
    for attempt in range(3):
        try:
            def k(x_ref, o_ref):
                o_ref[:] = x_ref[:] * 2.0

            out = pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
            )(jnp.ones((8, 128), jnp.float32))
            return bool(out[0, 0] == 2.0)
        except Exception as e:
            last = e
            time.sleep(0.5 * (attempt + 1))
    print(
        f"qwen3_asr_tpu: Pallas TPU probe failed after 3 attempts "
        f"({last!r}); falling back to XLA-only paths (slower decode)",
        file=sys.stderr, flush=True,
    )
    return False
