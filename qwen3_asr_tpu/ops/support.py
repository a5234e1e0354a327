"""Backend capability probe: can this JAX backend run Mosaic/Pallas TPU
kernels? Probed once with a trivial kernel; used to gate the flash-attention
and int8-matmul fast paths (XLA reference implementations otherwise)."""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


@functools.cache
def has_pallas_tpu() -> bool:
    if os.environ.get("QWEN3_DISABLE_PALLAS", "0") == "1":
        return False
    if jax.default_backend() == "cpu":
        return False
    try:
        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0

        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )(jnp.ones((8, 128), jnp.float32))
        return bool(out[0, 0] == 2.0)
    except Exception:
        return False
