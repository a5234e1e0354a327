"""int4 KV cache mode of the decode megakernel (interpret mode).

The cache stream is nibble-packed — [L, S/2, DKV] int8 bytes, byte row r =
cache rows (2r lo-nibble, 2r+1 hi-nibble), per-(row, head) f32 scales kept
at full length. Gates: packing round-trips, the step tracks the bf16-KV
kernel within int4 quantization error, the caller's read-modify-write of
the fresh row touches ONLY its own nibble, and a greedy stream through the
int4-KV while-loop yields sane tokens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.config import tiny_asr_config
from qwen3_asr_tpu.models.decoder import _quantize_kv_rows
from qwen3_asr_tpu.ops.megakernel import (
    mega_decode_step,
    mega_decode_step_i4,
    pack_kv_int4,
    pack_megakernel_params,
)
from qwen3_asr_tpu.runtime.params import (
    fuse_decoder_params,
    init_decoder_params,
    quantize_decoder_params,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_asr_config().decoder
    dec = init_decoder_params(cfg, jax.random.PRNGKey(3), jnp.bfloat16)
    dec = jax.tree.map(lambda x: np.asarray(x), dec)
    dec = fuse_decoder_params(quantize_decoder_params(dec, "int8pc"))
    mega = pack_megakernel_params(dec, cfg)
    return cfg, dec, mega


def _quantized_caches(cfg, S, rng):
    L = cfg.n_layers
    NKV, D = cfg.n_kv_heads, cfg.head_dim
    DKV = NKV * D
    k0 = jnp.asarray(rng.standard_normal((L, S, DKV)) * 0.4, jnp.bfloat16)
    v0 = jnp.asarray(rng.standard_normal((L, S, DKV)) * 0.4, jnp.bfloat16)
    kq, ks = _quantize_kv_rows(k0.reshape(L, S, NKV, D))
    vq, vs = _quantize_kv_rows(v0.reshape(L, S, NKV, D))
    return (k0, v0, kq.reshape(L, S, DKV), vq.reshape(L, S, DKV),
            ks.reshape(L, S, NKV), vs.reshape(L, S, NKV))


def test_pack_kv_int4_roundtrip():
    """Packed nibbles expand back to the requantized values and the scale
    rescale preserves the dequantized row within one int4 step."""
    rng = np.random.default_rng(0)
    L, S, DKV, NKV = 2, 16, 32, 2
    kq = jnp.asarray(rng.integers(-127, 128, (L, S, DKV)), jnp.int8)
    s8 = jnp.asarray(rng.random((L, S, NKV)) * 0.01 + 1e-3, jnp.float32)
    packed, s4 = jax.jit(pack_kv_int4)(kq, s8)
    assert packed.shape == (L, S // 2, DKV)
    b = np.asarray(packed).view(np.uint8)
    lo = (b & 0xF).astype(np.int8)
    hi = (b >> 4).astype(np.int8)
    lo[lo >= 8] -= 16
    hi[hi >= 8] -= 16
    q4 = np.empty((L, S, DKV), np.int8)
    q4[:, 0::2] = lo
    q4[:, 1::2] = hi
    expect = np.clip(np.round(np.asarray(kq, np.float32) * 7 / 127), -7, 7)
    np.testing.assert_array_equal(q4, expect.astype(np.int8))
    # dequantized parity: q4 * s4 tracks q8 * s8 within half an int4 step
    deq8 = np.asarray(kq, np.float32).reshape(L, S, NKV, -1) * np.asarray(
        s8)[..., None]
    deq4 = q4.astype(np.float32).reshape(L, S, NKV, -1) * np.asarray(
        s4)[..., None]
    step = np.asarray(s4)[..., None]
    assert np.all(np.abs(deq4 - deq8) <= 0.5 * step + 1e-6)


def test_megakernel_i4_kv_tracks_bf16(setup):
    """One int4-KV step tracks the bf16-KV kernel within KV-quantization
    error, and the fresh row written is the int4 quantization of the bf16
    fresh row."""
    cfg, dec, mega = setup
    S = 32
    L = cfg.n_layers
    NKV, D = cfg.n_kv_heads, cfg.head_dim
    DKV = NKV * D
    rng = np.random.default_rng(11)
    k0, v0, kq, vq, ks, vs = _quantized_caches(cfg, S, rng)
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)), jnp.bfloat16)
    pos = jnp.int32(19)

    _, kb, vb, h_b = mega_decode_step(mega, cfg, x, pos, jnp.array(k0),
                                      jnp.array(v0), interpret=True)

    k4, ks4 = pack_kv_int4(kq, ks)
    v4, vs4 = pack_kv_int4(vq, vs)
    _, k4b, v4b, ks4b, vs4b, h_4 = mega_decode_step_i4(
        mega, cfg, x, pos, k4, v4, ks4.transpose(0, 2, 1),
        vs4.transpose(0, 2, 1), interpret=True)

    hb = np.asarray(h_b, np.float32).ravel()
    h4 = np.asarray(h_4, np.float32).ravel()
    rel = np.linalg.norm(h4 - hb) / max(np.linalg.norm(hb), 1e-6)
    assert rel < 0.08, rel

    # fresh row: pos=19 is odd -> high nibble of byte row 9
    p = int(pos)
    byte = np.asarray(k4b)[:, p // 2, :].view(np.uint8)
    nib = (byte >> 4).astype(np.int8)
    nib[nib >= 8] -= 16
    s_new = np.asarray(ks4b)[:, :, p]                     # [L, NKV]
    deq = nib.reshape(L, NKV, D).astype(np.float32) * s_new[:, :, None]
    fb = np.asarray(kb[:, p, :], np.float32).reshape(L, NKV, D)
    step = np.abs(fb).max(axis=2, keepdims=True) / 7.0
    assert np.all(np.abs(deq - fb) <= 0.75 * step + 1e-4)


@pytest.mark.parametrize("pos", [18, 19])
def test_megakernel_i4_rmw_preserves_neighbors(setup, pos):
    """The fresh-row merge must not clobber the sibling nibble or any
    other byte row, at both write parities."""
    cfg, dec, mega = setup
    S = 32
    rng = np.random.default_rng(7)
    _, _, kq, vq, ks, vs = _quantized_caches(cfg, S, rng)
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)), jnp.bfloat16)
    k4, ks4 = pack_kv_int4(kq, ks)
    v4, vs4 = pack_kv_int4(vq, vs)
    k4_np, v4_np = np.asarray(k4), np.asarray(v4)

    _, k4b, v4b, _, _, _ = mega_decode_step_i4(
        mega, cfg, x, jnp.int32(pos), jnp.array(k4), jnp.array(v4),
        ks4.transpose(0, 2, 1), vs4.transpose(0, 2, 1), interpret=True)

    for out, orig in ((np.asarray(k4b), k4_np), (np.asarray(v4b), v4_np)):
        pr = pos // 2
        if pos % 2 == 0:   # wrote lo nibble: hi must be untouched
            assert np.array_equal(out[:, pr, :].view(np.uint8) >> 4,
                                  orig[:, pr, :].view(np.uint8) >> 4)
        else:              # wrote hi nibble: lo must be untouched
            assert np.array_equal(out[:, pr, :].view(np.uint8) & 0xF,
                                  orig[:, pr, :].view(np.uint8) & 0xF)
        assert np.array_equal(np.delete(out, pr, axis=1),
                              np.delete(orig, pr, axis=1))


def test_streaming_int4_kv_stream(setup):
    """generate_greedy_streaming(cache_dtype=jnp.int4) rides
    decode_chunk_mega_i4 (interpret): prefill runs the XLA int8 layout,
    the loop packs it once and streams int4. Tokens must be in-vocab and
    step-consistent with a manual mega_decode_step_i4 replay from the
    same packed prefill state."""
    from qwen3_asr_tpu.models.generate import (
        generate_greedy_streaming,
        prefill_only,
    )

    cfg, dec, mega = setup
    dec = dict(dec)
    dec["mega"] = mega
    rng = np.random.default_rng(3)
    P, max_tokens = 16, 6
    toks = np.zeros(P, np.int32)
    n_prompt = 12
    toks[:n_prompt] = rng.integers(1, 200, size=n_prompt)

    out = generate_greedy_streaming(
        dec, cfg, jnp.asarray(toks), jnp.int32(n_prompt), None,
        jnp.int32(0), 0, max_tokens, cache_dtype=jnp.int4, chunk=3,
        _force_mega_interpret=True)
    assert 1 <= len(out) <= max_tokens
    assert all(0 <= t < cfg.vocab_size for t in out)

    # manual replay: same prefill, pack, step loop
    S = 128  # streaming aligns S to 128 for the megakernel
    token, cache = prefill_only(
        dec, cfg, jnp.asarray(toks), jnp.int32(n_prompt), None,
        jnp.int32(0), 0, S, jnp.int8)
    L = cfg.n_layers
    DKV = cfg.n_kv_heads * cfg.head_dim
    k4, ks = pack_kv_int4(cache["k"].reshape(L, S, DKV), cache["k_s"])
    v4, vs = pack_kv_int4(cache["v"].reshape(L, S, DKV), cache["v_s"])
    ks, vs = ks.transpose(0, 2, 1), vs.transpose(0, 2, 1)
    replay = [int(token)]
    tok = token
    for i in range(len(out) - 1):
        x = jnp.take(dec["token_embd"], tok[None], axis=0)
        tok, k4, v4, ks, vs, _ = mega_decode_step_i4(
            dec["mega"], cfg, x, jnp.int32(n_prompt + i), k4, v4, ks, vs,
            interpret=True)
        replay.append(int(tok))
    assert replay == out


def test_int4_group_pinned_per_process(monkeypatch):
    """QWEN3_INT4_GROUP is read ONCE per process: the group baked into a
    pack at load time must match the one the kernel indexes with at trace
    time, so changing the env var mid-process must NOT change the
    resolved group (it would silently mis-scale every weight chunk)."""
    import os

    from qwen3_asr_tpu.ops.megakernel import _int4_group

    before = _int4_group()
    monkeypatch.setenv("QWEN3_INT4_GROUP", str(before * 2))
    assert _int4_group() == before
