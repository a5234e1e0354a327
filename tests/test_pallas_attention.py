"""Flash-attention Pallas kernel (interpret mode) vs the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.ops.attention import mha_attention
from qwen3_asr_tpu.ops.pallas_attention import flash_attention


def ref_attention(q, k, v, valid, causal, scale):
    T, _, _ = q.shape
    S = k.shape[0]
    cols = jnp.arange(S)[None, :]
    rows = jnp.arange(T)[:, None]
    mask = cols < valid
    if causal:
        mask = mask & (cols <= rows)
    return np.asarray(mha_attention(q, k, v, mask, scale))


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("T,S,H,Hkv,D", [
    (128, 128, 4, 4, 64),      # encoder-like, MHA
    (96, 96, 4, 2, 64),        # GQA, non-multiple of block
    (300, 300, 2, 1, 128),     # padding path
])
def test_flash_matches_reference(rng, causal, T, S, H, Hkv, D):
    q = jnp.asarray(rng.standard_normal((T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((S, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((S, Hkv, D)).astype(np.float32))
    scale = 1.0 / np.sqrt(D)
    for valid in (S, S - 7):
        ref = ref_attention(q, k, v, valid, causal, scale)
        out = np.asarray(flash_attention(
            q, k, v, jnp.int32(valid), causal=causal, scale=scale,
            interpret=True,
        ))
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_batch_matches_per_item(rng, causal):
    """Batched kernel (batch = grid axis, per-item valid lens) == the
    per-item einsum reference for every item."""
    from qwen3_asr_tpu.ops.pallas_attention import flash_attention_batch

    B, T, H, Hkv, D = 3, 160, 4, 2, 64
    q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)).astype(np.float32))
    scale = 1.0 / np.sqrt(D)
    valid = jnp.asarray([T, T - 13, 5], jnp.int32)
    out = np.asarray(flash_attention_batch(
        q, k, v, valid, causal=causal, scale=scale, interpret=True))
    for b in range(B):
        ref = ref_attention(q[b], k[b], v[b], int(valid[b]), causal, scale)
        vb = int(valid[b])
        # rows past an item's valid length are padding garbage upstream;
        # compare the rows the caller reads (non-causal reads all T rows,
        # they all attend to the same valid prefix)
        np.testing.assert_allclose(out[b, :vb], ref[:vb],
                                   atol=2e-5, rtol=1e-5)
        assert np.isfinite(out[b]).all()


def test_flash_singleton_delegates_to_batch(rng):
    """flash_attention == flash_attention_batch at B=1 (the delegation)."""
    from qwen3_asr_tpu.ops.pallas_attention import flash_attention_batch

    q = jnp.asarray(rng.standard_normal((64, 2, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((64, 2, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((64, 2, 64)).astype(np.float32))
    a = np.asarray(flash_attention(q, k, v, jnp.int32(50), causal=True,
                                   scale=0.125, interpret=True))
    b = np.asarray(flash_attention_batch(
        q[None], k[None], v[None], jnp.asarray([50], jnp.int32),
        causal=True, scale=0.125, interpret=True))[0]
    np.testing.assert_array_equal(a, b)


def test_flash_fully_masked_rows_finite(rng):
    # causal row 0 with valid_len 0 would be fully masked; outputs must stay
    # finite (they're padding rows upstream)
    q = jnp.asarray(rng.standard_normal((8, 2, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((8, 2, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((8, 2, 64)).astype(np.float32))
    out = np.asarray(flash_attention(
        q, k, v, jnp.int32(0), causal=True, scale=0.125, interpret=True
    ))
    assert np.isfinite(out).all()
