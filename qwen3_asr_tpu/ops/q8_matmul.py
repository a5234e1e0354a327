"""Quantized (Q8_0-style) matmul: int8 weights dequantized in-register.

Weight format matches GGUF Q8_0 semantics after the load-time transpose:
  q: int8 [in, out], s: f32 [in//32, out]  with  W[i, o] = q[i, o] * s[i//32, o]

The autoregressive decode step is HBM-bandwidth-bound on weight reads
(BASELINE.md: the 0.6B model is ~1.2 GB in bf16); streaming int8 halves the
traffic. XLA cannot be relied on to fuse dequantization into a matmul
without materializing the bf16 matrix, hence the Pallas kernel: each grid
step loads an int8 [in, TILE_OUT] tile + its scales into VMEM, converts in
registers, and accumulates x @ W in float32.

`q8_matmul` dispatches to the kernel on TPU and to a reference XLA
implementation elsewhere (used by tests via interpret mode as well).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q8_BLOCK = 32


def quantize_q8_weights(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """float [in, out] -> (int8 [in, out], f32 scales [in//32, out]).

    Same per-32-input-block scheme as GGUF Q8_0 (runtime/gguf.py), but laid
    out column-major-per-block for the [in, out] matmul orientation.
    """
    w = np.asarray(w, dtype=np.float32)
    n_in, n_out = w.shape
    assert n_in % Q8_BLOCK == 0, n_in
    blocks = w.reshape(n_in // Q8_BLOCK, Q8_BLOCK, n_out)
    amax = np.abs(blocks).max(axis=1)                     # [B, out]
    s = (amax / 127.0).astype(np.float32)
    inv = np.where(s > 0, 1.0 / np.where(s == 0, 1.0, s), 0.0)
    q = np.clip(np.round(blocks * inv[:, None, :]), -127, 127).astype(np.int8)
    return q.reshape(n_in, n_out), s


def dequantize_q8_weights(q: jax.Array, s: jax.Array) -> jax.Array:
    n_in, n_out = q.shape
    blocks = q.reshape(-1, Q8_BLOCK, n_out).astype(jnp.float32)
    return (blocks * s[:, None, :]).reshape(n_in, n_out)


def _q8_matmul_xla(x: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
    """Reference implementation (materializes the dequantized matrix)."""
    w = dequantize_q8_weights(q, s).astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _deq(q_ref, s_ref, dtype):
    """Dequantize a VMEM int8 tile: broadcast each 32-row block's scale."""
    q = q_ref[:].astype(dtype)
    n_in, tile = q.shape
    s_rows = jnp.broadcast_to(
        s_ref[:].astype(dtype)[:, None, :], (n_in // Q8_BLOCK, Q8_BLOCK, tile)
    ).reshape(n_in, tile)
    return q * s_rows


def _q8_kernel(x_ref, q_ref, s_ref, o_ref, *, deq_dtype=jnp.float32):
    # x: [T, in]; q: [in, TILE] int8; s: [in//32, TILE] f32; o: [T, TILE]
    #
    # Dequantize in VMEM (int8 -> float multiply by the block scale
    # broadcast over the 32 rows of each block) and run ONE 2-D dot. HBM
    # traffic stays int8 — the float copy lives only on-chip. (A batched
    # per-block dot_general formulation fails Mosaic lowering: batch dims
    # are unsupported in TPU Pallas dots.)
    #
    # deq_dtype=f32 with HIGHEST precision: exact vs the dequantized
    # reference — the per-layer GEMVs are HBM-bound, the extra MXU passes
    # are free. deq_dtype=bf16 (wide outputs, e.g. the 152k lm head): halves
    # the VMEM copy so tiles can be 4x larger, cutting the grid-step count;
    # weight rounding ~0.4%, well under the 0.8% Q8 quantization error.
    w = _deq(q_ref, s_ref, deq_dtype)
    precision = (jax.lax.Precision.HIGHEST if deq_dtype == jnp.float32
                 else None)
    o_ref[:] = jnp.dot(
        x_ref[:].astype(deq_dtype), w,
        preferred_element_type=jnp.float32, precision=precision,
    )


def _tile_for(n_out: int) -> tuple:
    """(TILE, dequant dtype) by output width. Wide outputs take big bf16
    tiles — at TILE=512/f32 the 152k-wide lm head needs ~300 sequential
    grid steps whose fixed cost dwarfs the int8 stream (measured: 470 GB/s
    effective at TILE=4096/bf16 vs ~283 GB/s at 512/f32). bf16 dequant adds
    ~0.4% weight rounding on top of the 0.8% Q8_0 quantization error.
    Narrow outputs keep f32 dequant + HIGHEST precision: exact vs the
    dequantized reference."""
    if n_out >= 16384:
        return 4096, jnp.bfloat16
    if n_out >= 2048:
        return 2048, jnp.bfloat16
    return min(512, n_out), jnp.float32


# Above this row count the Pallas kernel's [T, in] + [T, TILE] VMEM blocks
# stop fitting (the 92 s prompt prefill OOMed scoped vmem at T=1280), and
# the matmul is compute-bound anyway — dequantize-and-dot via XLA instead.
# The int8-streaming kernel is for the HBM-bound T=1 decode GEMVs.
_MAX_KERNEL_ROWS = 256


@functools.partial(jax.jit, static_argnames=("interpret",))
def q8_matmul(x: jax.Array, q: jax.Array, s: jax.Array,
              interpret: bool = False) -> jax.Array:
    """x [T, in] x quantized W [in, out] -> [T, out] float32."""
    T, n_in = x.shape
    n_out = q.shape[1]
    if jax.default_backend() not in ("tpu", "axon") and not interpret:
        return _q8_matmul_xla(x, q, s)
    if T > _MAX_KERNEL_ROWS and not interpret:
        return _q8_matmul_xla(x, q, s)

    TILE, deq_dtype = _tile_for(n_out)
    if n_out % TILE != 0:
        # pad the out dim (e.g. the 151936-wide lm head) with zero columns
        pad = -(-n_out // TILE) * TILE - n_out
        qp = jnp.pad(q, ((0, 0), (0, pad)))
        sp = jnp.pad(s, ((0, 0), (0, pad)))
        return q8_matmul(x, qp, sp, interpret=interpret)[:, :n_out]
    grid = (n_out // TILE,)
    return pl.pallas_call(
        functools.partial(_q8_kernel, deq_dtype=deq_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, n_in), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_in, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_in // Q8_BLOCK, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, n_out), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * n_in * n_out,
            bytes_accessed=n_in * n_out + n_in * n_out // Q8_BLOCK * 4
            + T * n_in * 4 + T * n_out * 4,
            transcendentals=0,
        ),
    )(x, q, s)


# ---------------------------------------------------------------------------
# fused decode kernels (norm prologue / whole-MLP)
#
# Decode GEMVs are tiny, so per-op dispatch and custom-call fusion breaks
# cost as much as the HBM streams themselves (measured: a lone 8 MB bf16
# GEMV runs at ~270 GB/s; the q8 kernel at ~283 GB/s effective — both far
# from the ~800 GB/s peak, the difference is fixed overhead). Fusing the
# surrounding elementwise work (RMS-norm prologue, SwiGLU, both FFN matmuls)
# into the Pallas kernels removes those boundaries on the int8 path.
# ---------------------------------------------------------------------------


def _rms_norm_f32(x, nw, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return y * nw.astype(jnp.float32)


def _q8_norm_kernel(x_ref, nw_ref, q_ref, s_ref, o_ref, *,
                    eps, deq_dtype=jnp.float32):
    xn = _rms_norm_f32(x_ref[:], nw_ref[:], eps)  # norm always in f32
    w = _deq(q_ref, s_ref, deq_dtype)
    precision = (jax.lax.Precision.HIGHEST if deq_dtype == jnp.float32
                 else None)
    o_ref[:] = jnp.dot(xn.astype(deq_dtype), w,
                       preferred_element_type=jnp.float32,
                       precision=precision)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def q8_norm_matmul(x: jax.Array, leaf: dict, norm_w: jax.Array, eps: float,
                   interpret: bool = False) -> jax.Array:
    """rms_norm(x) * norm_w @ W  with the norm fused into the int8 kernel.

    x [T, in] (any float dtype), leaf {q8:q [in, out], q8:s} -> [T, out] f32.
    """
    q, s = leaf["q8:q"], leaf["q8:s"]
    T, n_in = x.shape
    n_out = q.shape[1]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if (not on_tpu and not interpret) or T > _MAX_KERNEL_ROWS:
        xn = _rms_norm_f32(x, norm_w, eps)
        return _q8_matmul_xla(xn, q, s)

    TILE, deq_dtype = _tile_for(n_out)
    if n_out % TILE != 0:
        pad = -(-n_out // TILE) * TILE - n_out
        leaf_p = {"q8:q": jnp.pad(q, ((0, 0), (0, pad))),
                  "q8:s": jnp.pad(s, ((0, 0), (0, pad)))}
        return q8_norm_matmul(x, leaf_p, norm_w, eps,
                              interpret=interpret)[:, :n_out]
    grid = (n_out // TILE,)
    return pl.pallas_call(
        functools.partial(_q8_norm_kernel, eps=eps, deq_dtype=deq_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, n_in), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_in), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_in, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_in // Q8_BLOCK, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, n_out), jnp.float32),
        interpret=interpret,
    )(x, norm_w.reshape(1, -1), q, s)


def _q8_mlp_kernel(x_ref, nw_ref, qg_ref, sg_ref, qu_ref, su_ref,
                   qd_ref, sd_ref, o_ref, ffn_ref, *, eps, n_gu):
    """Whole SwiGLU MLP: phases 0..n_gu-1 fill the ffn scratch tile by tile
    (silu(x@Wg) * (x@Wu)); phase n_gu contracts the scratch with W_down.

    bf16 dequant throughout: halves the in-VMEM weight copies so gate/up
    tiles can be 1024 wide and the resident W_down copy fits. Rounding
    ~0.4% on top of the 0.8% Q8_0 error. (A streamed-W_down variant that
    accumulates per phase measured slightly SLOWER — the kernel is bounded
    by the int8->bf16 dequant VPU work, not DMA.)
    """
    j = pl.program_id(0)

    @pl.when(j < n_gu)
    def _gate_up():
        xn = _rms_norm_f32(x_ref[:], nw_ref[:], eps).astype(jnp.bfloat16)
        tile = qg_ref.shape[1]
        g = jnp.dot(xn, _deq(qg_ref, sg_ref, jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        u = jnp.dot(xn, _deq(qu_ref, su_ref, jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        ffn_ref[:, pl.ds(j * tile, tile)] = (
            jax.nn.silu(g) * u).astype(jnp.bfloat16)

    @pl.when(j == n_gu)
    def _down():
        w = _deq(qd_ref, sd_ref, jnp.bfloat16)
        o_ref[:] = jnp.dot(ffn_ref[:], w,
                           preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("eps", "n_ffn", "interpret"))
def q8_mlp(x: jax.Array, gu_leaf: dict, down_leaf: dict, norm_w: jax.Array,
           eps: float, n_ffn: int, interpret: bool = False) -> jax.Array:
    """Fused SwiGLU MLP on int8 weights: ONE kernel for
    rms_norm -> gate/up matmuls -> silu*mul -> down matmul.

    gu_leaf holds the fused [in, 2*n_ffn] gate‖up matrix
    (runtime/params.py::fuse_decoder_params); down_leaf is [n_ffn, out].
    Returns [T, out] f32 (caller adds the residual).
    """
    qgu, sgu = gu_leaf["q8:q"], gu_leaf["q8:s"]
    qd, sd = down_leaf["q8:q"], down_leaf["q8:s"]
    T, n_in = x.shape
    n_out = qd.shape[1]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if (not on_tpu and not interpret) or T > _MAX_KERNEL_ROWS:
        xn = _rms_norm_f32(x, norm_w, eps)
        gu = _q8_matmul_xla(xn, qgu, sgu)
        h = jax.nn.silu(gu[:, :n_ffn]) * gu[:, n_ffn:]
        return _q8_matmul_xla(h, qd, sd)

    TILE = min(1024, n_ffn)
    assert n_ffn % TILE == 0, (n_ffn, TILE)
    n_gu = n_ffn // TILE
    last = n_gu - 1
    gate_ix = lambda j: (0, jnp.minimum(j, last))
    up_ix = lambda j: (0, jnp.minimum(j, last) + n_gu)

    return pl.pallas_call(
        functools.partial(_q8_mlp_kernel, eps=eps, n_gu=n_gu),
        grid=(n_gu + 1,),
        in_specs=[
            pl.BlockSpec((T, n_in), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_in), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_in, TILE), gate_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_in // Q8_BLOCK, TILE), gate_ix,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_in, TILE), up_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_in // Q8_BLOCK, TILE), up_ix,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ffn, n_out), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ffn // Q8_BLOCK, n_out), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, n_out), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, n_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T, n_ffn), jnp.bfloat16)],
        interpret=interpret,
    )(x, norm_w.reshape(1, -1), qgu, sgu, qgu, sgu, qd, sd)


# ---------------------------------------------------------------------------
# per-channel W8A8 (int8 MXU path, pure XLA)
#
# The Pallas dequant kernels stream int8 but pay a fixed launch cost per
# call and their int8->float dequant runs on the VPU. This mode instead
# rides XLA end-to-end: per-OUTPUT-CHANNEL int8 weights (one f32 scale per
# column) + dynamic per-row int8 activation quantization, contracted as a
# native int8 x int8 -> int32 MXU dot and rescaled by (sx * s[o]) — every
# op fuses into the surrounding graph, so the decode loop keeps XLA's
# cross-op weight prefetching at HALF the HBM bytes. Quantization scheme
# differs from GGUF Q8_0 (per-column vs per-32-row-block): ~equal weight
# rmse, plus ~0.4% activation quantization — greedy-argmax parity is the
# accuracy contract (tests/test_quant.py).
# ---------------------------------------------------------------------------


def quantize_pc_weights(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """float [in, out] -> (int8 [in, out], f32 scale [out])."""
    w = np.asarray(w, dtype=np.float32)
    amax = np.abs(w).max(axis=0)
    s = (amax / 127.0).astype(np.float32)
    inv = np.where(s > 0, 1.0 / np.where(s == 0, 1.0, s), 0.0)
    q = np.clip(np.round(w * inv[None, :]), -127, 127).astype(np.int8)
    return q, s


def pc_leaf(w: np.ndarray) -> dict:
    q, s = quantize_pc_weights(w)
    return {"i8pc:q": jnp.asarray(q), "i8pc:s": jnp.asarray(s)}


def is_pc_leaf(w) -> bool:
    return isinstance(w, dict) and "i8pc:q" in w


def pc_matmul(x: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
    """x [T, in] float x int8 W (per-channel scales [out]) -> [T, out] f32."""
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0      # [T, 1]
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (sx * s[None, :])


# ---------------------------------------------------------------------------
# pytree leaf for quantized weights
# ---------------------------------------------------------------------------

def quant_leaf(w: np.ndarray, pad_out_to: int = 1) -> dict:
    """Build a quantized pytree leaf from a float [in, out] matrix.

    `pad_out_to`: pad the out dim once at build time (kernels tile out in
    512 chunks; padding per call would copy the whole int8 matrix every
    step). The true width is sliced back in matmul_any.
    """
    w = np.asarray(w, dtype=np.float32)
    n_out = w.shape[1]
    padded = -(-n_out // pad_out_to) * pad_out_to
    if padded != n_out:
        w = np.pad(w, ((0, 0), (0, padded - n_out)))
    q, s = quantize_q8_weights(w)
    # NOTE: a padded leaf returns `padded` columns from matmul_any; callers
    # that padded must slice back to the true width with a STATIC size
    # (e.g. lm_logits slices to cfg.vocab_size) — zero columns would
    # otherwise win an argmax over all-negative logits.
    return {"q8:q": jnp.asarray(q), "q8:s": jnp.asarray(s)}


def is_quant_leaf(w) -> bool:
    return isinstance(w, dict) and "q8:q" in w


def matmul_any(x: jax.Array, w) -> jax.Array:
    """x @ w for a dense array, a Q8_0 leaf, or a per-channel int8 leaf."""
    if is_quant_leaf(w):
        return q8_matmul(x, w["q8:q"], w["q8:s"]).astype(x.dtype)
    if is_pc_leaf(w):
        return pc_matmul(x, w["i8pc:q"], w["i8pc:s"]).astype(x.dtype)
    return x @ w
