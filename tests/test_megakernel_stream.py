"""Streamed-KV mode of the decode megakernel (interpret mode).

`kv_stream=True` switches the kernel's attention from resident whole-slab
K/V (VMEM grows with S, tops out at `mega_max_context`) to a flash-decoding
structure: K/V ride a KVSLOTS ring of KV_BLOCK-row tiles folded with an
online softmax, so VMEM is O(1) in S and any context length keeps the
megakernel instead of dropping to the XLA step. Gates here: the streamed
step is numerically interchangeable with the resident step for all three
cache modes (bf16 / int8 / int4-packed KV), the cache writeback lands the
same fresh rows/scales (modulo the stream mode's block-major scale
layout, `block_kv_scales`),
the ring survives wrap-around (nlive > KVSLOTS), and the long-context
`generate_greedy_streaming` path that selects it emits the same tokens as
the resident path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.config import tiny_asr_config
from qwen3_asr_tpu.models.decoder import _quantize_kv_rows
from qwen3_asr_tpu.ops.megakernel import (
    KV_BLOCK,
    KVSLOTS,
    block_kv_scales,
    mega_decode_step,
    mega_decode_step_i4,
    mega_decode_step_i8,
    pack_kv_int4,
    pack_megakernel_params,
    unblock_kv_scales,
)
from qwen3_asr_tpu.runtime.params import (
    fuse_decoder_params,
    init_decoder_params,
    quantize_decoder_params,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_asr_config().decoder
    dec = init_decoder_params(cfg, jax.random.PRNGKey(9), jnp.bfloat16)
    dec = jax.tree.map(lambda x: np.asarray(x), dec)
    dec = fuse_decoder_params(quantize_decoder_params(dec, "int8pc"))
    mega = pack_megakernel_params(dec, cfg)
    return cfg, dec, mega


def _caches(cfg, S, rng):
    L = cfg.n_layers
    NKV, D = cfg.n_kv_heads, cfg.head_dim
    DKV = NKV * D
    k0 = jnp.asarray(rng.standard_normal((L, S, DKV)) * 0.4, jnp.bfloat16)
    v0 = jnp.asarray(rng.standard_normal((L, S, DKV)) * 0.4, jnp.bfloat16)
    kq, ks = _quantize_kv_rows(k0.reshape(L, S, NKV, D))
    vq, vs = _quantize_kv_rows(v0.reshape(L, S, NKV, D))
    return (k0, v0, kq.reshape(L, S, DKV), vq.reshape(L, S, DKV),
            ks.reshape(L, S, NKV), vs.reshape(L, S, NKV))


def _rel(a, b):
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-6)


# positions probing block-count edges: mid-first-block, last row of block 0,
# first row of block 1, mid-block-2 (S=3 blocks)
@pytest.mark.parametrize("pos", [5, 255, 256, 600])
def test_stream_matches_resident_bf16(setup, pos):
    cfg, dec, mega = setup
    S = 3 * KV_BLOCK
    rng = np.random.default_rng(pos)
    k0, v0, *_ = _caches(cfg, S, rng)
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)), jnp.bfloat16)
    p = jnp.int32(pos)

    tok_r, kr, vr, h_r = mega_decode_step(
        mega, cfg, x, p, jnp.array(k0), jnp.array(v0), interpret=True)
    tok_s, ks_, vs_, h_s = mega_decode_step(
        mega, cfg, x, p, jnp.array(k0), jnp.array(v0), interpret=True,
        kv_stream=True)

    # online softmax reassociates the f32 reduction; tolerance is rounding
    assert _rel(h_s, h_r) < 2e-4, _rel(h_s, h_r)
    assert int(tok_s) == int(tok_r)
    # live rows only: rows > pos are dead (never read before their own
    # write — reads gate on col < pos) and the resident kernel's in-place
    # 32-row writeback may zero dead rows the streamed caller-side
    # scatter leaves untouched (kv_wb contract, ops/megakernel.py)
    np.testing.assert_array_equal(np.asarray(ks_)[:, :pos + 1],
                                  np.asarray(kr)[:, :pos + 1])
    np.testing.assert_array_equal(np.asarray(vs_)[:, :pos + 1],
                                  np.asarray(vr)[:, :pos + 1])


@pytest.mark.parametrize("pos", [5, 256, 600])
def test_stream_matches_resident_i8(setup, pos):
    cfg, dec, mega = setup
    S = 3 * KV_BLOCK
    rng = np.random.default_rng(100 + pos)
    _, _, kq, vq, ks, vs = _caches(cfg, S, rng)
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)), jnp.bfloat16)
    p = jnp.int32(pos)

    tok_r, krb, vrb, ksr, vsr, h_r = mega_decode_step_i8(
        mega, cfg, x, p, jnp.array(kq), jnp.array(vq),
        ks.transpose(0, 2, 1), vs.transpose(0, 2, 1), interpret=True)
    tok_s, ksb, vsb, kss, vss, h_s = mega_decode_step_i8(
        mega, cfg, x, p, jnp.array(kq), jnp.array(vq),
        block_kv_scales(jnp.array(ks)), block_kv_scales(jnp.array(vs)),
        interpret=True, kv_stream=True)

    assert _rel(h_s, h_r) < 2e-4, _rel(h_s, h_r)
    assert int(tok_s) == int(tok_r)
    # live rows only — see the bf16 variant for the kv_wb dead-row note
    np.testing.assert_array_equal(np.asarray(ksb)[:, :pos + 1],
                                  np.asarray(krb)[:, :pos + 1])
    np.testing.assert_array_equal(np.asarray(vsb)[:, :pos + 1],
                                  np.asarray(vrb)[:, :pos + 1])
    # stream scales are block-major; resident returns [L, NKV, S]
    np.testing.assert_array_equal(
        np.asarray(unblock_kv_scales(kss)).transpose(0, 2, 1),
        np.asarray(ksr))
    np.testing.assert_array_equal(
        np.asarray(unblock_kv_scales(vss)).transpose(0, 2, 1),
        np.asarray(vsr))


@pytest.mark.parametrize("pos", [18, 19, 256])
def test_stream_matches_resident_i4(setup, pos):
    """int4 nibble-packed caches: streamed attention reads the same packed
    bytes and the read-modify-write of the fresh row is identical."""
    cfg, dec, mega = setup
    S = 3 * KV_BLOCK
    rng = np.random.default_rng(200 + pos)
    _, _, kq, vq, ks, vs = _caches(cfg, S, rng)
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)), jnp.bfloat16)
    p = jnp.int32(pos)
    k4, ks4 = pack_kv_int4(kq, ks)
    v4, vs4 = pack_kv_int4(vq, vs)

    tok_r, krb, vrb, ksr, vsr, h_r = mega_decode_step_i4(
        mega, cfg, x, p, jnp.array(k4), jnp.array(v4),
        ks4.transpose(0, 2, 1), vs4.transpose(0, 2, 1), interpret=True)
    tok_s, ksb, vsb, kss, vss, h_s = mega_decode_step_i4(
        mega, cfg, x, p, jnp.array(k4), jnp.array(v4),
        block_kv_scales(jnp.array(ks4)), block_kv_scales(jnp.array(vs4)),
        interpret=True, kv_stream=True)

    assert _rel(h_s, h_r) < 2e-4, _rel(h_s, h_r)
    assert int(tok_s) == int(tok_r)
    np.testing.assert_array_equal(np.asarray(ksb), np.asarray(krb))
    np.testing.assert_array_equal(np.asarray(vsb), np.asarray(vrb))
    np.testing.assert_array_equal(
        np.asarray(unblock_kv_scales(kss)).transpose(0, 2, 1),
        np.asarray(ksr))
    np.testing.assert_array_equal(
        np.asarray(unblock_kv_scales(vss)).transpose(0, 2, 1),
        np.asarray(vsr))


def test_stream_ring_wraparound(setup):
    """nlive > KVSLOTS forces every ring slot to be reused mid-attention;
    the folded result must still match the resident kernel."""
    cfg, dec, mega = setup
    S = (KVSLOTS + 2) * KV_BLOCK
    pos = (KVSLOTS + 1) * KV_BLOCK + 37    # nlive = KVSLOTS + 2
    rng = np.random.default_rng(42)
    k0, v0, *_ = _caches(cfg, S, rng)
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)), jnp.bfloat16)
    p = jnp.int32(pos)

    tok_r, _, _, h_r = mega_decode_step(
        mega, cfg, x, p, jnp.array(k0), jnp.array(v0), interpret=True)
    tok_s, _, _, h_s = mega_decode_step(
        mega, cfg, x, p, jnp.array(k0), jnp.array(v0), interpret=True,
        kv_stream=True)
    assert _rel(h_s, h_r) < 2e-4, _rel(h_s, h_r)
    assert int(tok_s) == int(tok_r)


@pytest.mark.parametrize("cache_dtype", [jnp.bfloat16, jnp.int8])
def test_generate_greedy_long_context_selects_kv_stream(
        setup, monkeypatch, cache_dtype):
    """Same selection check for the whole-loop generate_greedy (one jit,
    lax.while_loop decode): past mega_max_context it stays on the
    megakernel in streamed mode and emits the resident path's tokens."""
    import qwen3_asr_tpu.models.generate as gen
    import qwen3_asr_tpu.ops.megakernel as mk

    cfg, dec, mega = setup
    dec = dict(dec)
    dec["mega"] = mega
    rng = np.random.default_rng(7)
    P, max_tokens = 16, 6
    toks = np.zeros(P, np.int32)
    n_prompt = 12
    toks[:n_prompt] = rng.integers(1, 200, size=n_prompt)

    def run():
        gen.generate_greedy.clear_cache()  # selection isn't a jit key
        out, n = gen.generate_greedy(
            dec, cfg, jnp.asarray(toks), jnp.int32(n_prompt), None,
            jnp.int32(0), 0, max_tokens, cache_dtype=cache_dtype,
            _force_mega_interpret=True)
        return np.asarray(out)[:int(n)].tolist()

    base = run()
    monkeypatch.setattr(mk, "mega_max_context", lambda *a, **k: 0)
    assert run() == base


def test_streaming_long_context_selects_kv_stream(setup, monkeypatch):
    """When S exceeds mega_max_context, generate_greedy_streaming stays on
    the megakernel in streamed mode (instead of the old XLA fallback) and
    emits exactly the tokens the resident megakernel path emits."""
    import qwen3_asr_tpu.models.generate as gen
    import qwen3_asr_tpu.ops.megakernel as mk

    cfg, dec, mega = setup
    dec = dict(dec)
    dec["mega"] = mega
    rng = np.random.default_rng(5)
    P, max_tokens = 16, 6
    toks = np.zeros(P, np.int32)
    n_prompt = 12
    toks[:n_prompt] = rng.integers(1, 200, size=n_prompt)

    base = gen.generate_greedy_streaming(
        dec, cfg, jnp.asarray(toks), jnp.int32(n_prompt), None,
        jnp.int32(0), 0, max_tokens, cache_dtype=jnp.int8, chunk=3,
        _force_mega_interpret=True)

    # force the long-context branch: every S is "past the VMEM budget"
    monkeypatch.setattr(mk, "mega_max_context", lambda *a, **k: 0)
    streamed = gen.generate_greedy_streaming(
        dec, cfg, jnp.asarray(toks), jnp.int32(n_prompt), None,
        jnp.int32(0), 0, max_tokens, cache_dtype=jnp.int8, chunk=3,
        _force_mega_interpret=True)

    assert streamed == base
