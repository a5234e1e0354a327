"""Decode megakernel vs the XLA int8pc decode path (interpret mode).

Same quantized weights, same cache state -> greedy tokens must match and
the cache rows written must agree. The megakernel's matmuls use the same
activation-quant math as pc_matmul, so hidden states track the XLA path to
bf16 rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.config import tiny_asr_config
from qwen3_asr_tpu.models.decoder import (
    decoder_forward,
    embed_with_audio,
    init_kv_cache,
    lm_logits,
)
from qwen3_asr_tpu.ops.megakernel import (
    mega_decode_step,
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


def _prefill(cfg, dec, prompt, S):
    cache = init_kv_cache(cfg, S, jnp.bfloat16)
    h0 = embed_with_audio(dec, prompt, None, 0, 0)
    h, cache = decoder_forward(
        dec, cfg, h0, jnp.arange(len(prompt), dtype=jnp.int32), cache,
        cache_offset=jnp.int32(0), kv_valid_len=jnp.int32(len(prompt)),
        prefill=True,
    )
    tok = jnp.argmax(lm_logits(dec, cfg, h[-1])).astype(jnp.int32)
    return tok, cache


def test_megakernel_matches_xla_decode(setup):
    cfg, dec, mega = setup
    S = 32
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(1, 200, size=12), jnp.int32)

    tok_ref, cache_ref = _prefill(cfg, dec, prompt, S)
    tok_mega = tok_ref
    L = cfg.n_layers
    DKV = cfg.n_kv_heads * cfg.head_dim
    k_mega = cache_ref["k"].reshape(L, S, DKV)
    v_mega = cache_ref["v"].reshape(L, S, DKV)
    cache = cache_ref

    n_steps = 6
    for i in range(n_steps):
        pos = jnp.int32(len(prompt) + i)

        # XLA reference step
        h0 = jnp.take(dec["token_embd"], tok_ref[None], axis=0)
        h, cache = decoder_forward(
            dec, cfg, h0, pos[None], cache,
            cache_offset=pos, kv_valid_len=pos + 1,
        )
        tok_ref = jnp.argmax(lm_logits(dec, cfg, h[0])).astype(jnp.int32)

        # megakernel step
        x = jnp.take(dec["token_embd"], tok_mega[None], axis=0)
        tok_mega, k_mega, v_mega, h_dbg = mega_decode_step(
            mega, cfg, x, pos, k_mega, v_mega, interpret=True)

        assert int(tok_mega) == int(tok_ref), f"step {i}"
        # fresh cache rows: bf16-rounding-tight early; later steps drift as
        # the two pipelines' independent activation-quant rounding
        # compounds through their own cache rows — gate on relative L2
        for name, got, want in (
            ("k", k_mega, cache["k"].reshape(L, S, DKV)),
            ("v", v_mega, cache["v"].reshape(L, S, DKV)),
        ):
            g = np.asarray(got[:, int(pos)], np.float32)
            w = np.asarray(want[:, int(pos)], np.float32)
            if i < 3:
                np.testing.assert_allclose(
                    g, w, atol=2e-2, rtol=2e-2,
                    err_msg=f"{name} row, step {i}")
            rel = np.linalg.norm(g - w) / max(np.linalg.norm(w), 1e-6)
            assert rel < 0.05, (name, i, rel)


def _dequant_dense(dec, dtype):
    """int8pc leaves -> dense f32 weights (q * per-channel scale)."""
    out = {}
    for k, v in dec.items():
        if k == "layers":
            lay = {}
            for kk, vv in v.items():
                if isinstance(vv, dict) and "i8pc:q" in vv:
                    q = np.asarray(vv["i8pc:q"], np.float32)
                    s = np.asarray(vv["i8pc:s"], np.float32)
                    lay[kk] = jnp.asarray(q * s[:, None, :], dtype)
                else:
                    lay[kk] = jnp.asarray(vv, dtype)
            out["layers"] = lay
        elif isinstance(v, dict):
            continue  # lm_head_pc — oracle reuses the tied embedding
        else:
            out[k] = jnp.asarray(v, dtype)
    return out


def test_megakernel_drift_vs_f32_oracle(setup):
    """The megakernel and the XLA int8pc path disagree at the bf16-rounding
    level (different op orderings under Mosaic vs XLA). The correctness
    criterion is NOT bit-parity with the XLA path — it is that the
    megakernel's error against an f32 dense oracle (same dequantized
    weights, f32 activations) is no worse than the XLA bf16 path's own
    error. Measured at full 28-layer scale on a v5e: mega rms 0.059 vs
    xla rms 0.062 against the oracle — the kernel is the *closer* one."""
    import dataclasses

    cfg, dec, mega = setup
    dec_f32 = _dequant_dense(dec, jnp.float32)
    cfg_noker = dataclasses.replace(cfg, use_decode_attn_kernel=False)

    S = 32
    L = cfg.n_layers
    DKV = cfg.n_kv_heads * cfg.head_dim
    rng = np.random.default_rng(7)
    k0 = jnp.asarray(rng.standard_normal((L, S, DKV)) * 0.3, jnp.bfloat16)
    v0 = jnp.asarray(rng.standard_normal((L, S, DKV)) * 0.3, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)), jnp.bfloat16)
    pos = jnp.int32(17)

    _, _, _, h_m = mega_decode_step(mega, cfg, x, pos, jnp.array(k0),
                                    jnp.array(v0), interpret=True)

    cache_b = {"k": k0.reshape(L, S, cfg.n_kv_heads, cfg.head_dim),
               "v": v0.reshape(L, S, cfg.n_kv_heads, cfg.head_dim)}
    h_x, _ = decoder_forward(dec, cfg, x, pos[None], cache_b,
                             cache_offset=pos, kv_valid_len=pos + 1)

    cache_f = {"k": k0.astype(jnp.float32).reshape(
                   L, S, cfg.n_kv_heads, cfg.head_dim),
               "v": v0.astype(jnp.float32).reshape(
                   L, S, cfg.n_kv_heads, cfg.head_dim)}
    h_o, _ = decoder_forward(dec_f32, cfg_noker, x.astype(jnp.float32),
                             pos[None], cache_f,
                             cache_offset=pos, kv_valid_len=pos + 1)

    hm = np.asarray(h_m, np.float32).ravel()
    hx = np.asarray(h_x[0], np.float32).ravel()
    ho = np.asarray(h_o[0], np.float32).ravel()
    rms_m = float(np.sqrt(((hm - ho) ** 2).mean()))
    rms_x = float(np.sqrt(((hx - ho) ** 2).mean()))
    den = float(np.abs(ho).max())
    # mega must be in the same rounding class as the XLA bf16 path
    assert rms_m <= 2.0 * rms_x + 1e-4 * den, (rms_m, rms_x, den)
    assert np.abs(hm - ho).max() <= 0.05 * den + 4.0 * np.abs(hx - ho).max()


def test_megakernel_i8_kv_tracks_bf16(setup):
    """int8-KV mode: same step on an int8-quantized copy of the cache must
    track the bf16-KV kernel within KV-quantization error, and the fresh
    rows it writes must follow decoder._quantize_kv_rows' exact math
    (prefill with cache_dtype=int8 feeds this kernel directly)."""
    from qwen3_asr_tpu.models.decoder import (
        _dequantize_kv,
        _quantize_kv_rows,
    )
    from qwen3_asr_tpu.ops.megakernel import mega_decode_step_i8

    cfg, dec, mega = setup
    S = 32
    L = cfg.n_layers
    NKV, D = cfg.n_kv_heads, cfg.head_dim
    DKV = NKV * D
    rng = np.random.default_rng(11)
    k0 = jnp.asarray(rng.standard_normal((L, S, DKV)) * 0.4, jnp.bfloat16)
    v0 = jnp.asarray(rng.standard_normal((L, S, DKV)) * 0.4, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)), jnp.bfloat16)
    pos = jnp.int32(19)

    _, kb, vb, h_b = mega_decode_step(mega, cfg, x, pos, jnp.array(k0),
                                      jnp.array(v0), interpret=True)

    kq, ks = _quantize_kv_rows(k0.reshape(L, S, NKV, D))
    vq, vs = _quantize_kv_rows(v0.reshape(L, S, NKV, D))
    _, kq2, vq2, ks2, vs2, h_i = mega_decode_step_i8(
        mega, cfg, x, pos, kq.reshape(L, S, DKV), vq.reshape(L, S, DKV),
        ks.transpose(0, 2, 1), vs.transpose(0, 2, 1), interpret=True)

    hb = np.asarray(h_b, np.float32).ravel()
    hi = np.asarray(h_i, np.float32).ravel()
    rel = np.linalg.norm(hi - hb) / max(np.linalg.norm(hb), 1e-6)
    assert rel < 0.05, rel

    # fresh rows: dequantized int8 row tracks the bf16 fresh row
    p = int(pos)
    fb = np.asarray(kb[:, p, :], np.float32)          # [L, DKV] bf16 row
    fi = np.asarray(_dequantize_kv(
        kq2.reshape(L, S, NKV, D),
        ks2.transpose(0, 2, 1))[:, p], np.float32).reshape(L, DKV)
    np.testing.assert_allclose(fi, fb, atol=0.05, rtol=0.05)


def _dequant_int4_dense(dec, cfg, dtype):
    """Reproduce pack_megakernel_params(int4=True)'s weight quantization in
    numpy: i8pc leaves -> dense f32 -> int4 per-(512-row group, out column)
    -> dequantized dense. This is the int4 kernel's own weight truth."""
    from qwen3_asr_tpu.ops.megakernel import (
        _dequant_i8pc,
        _quant_int4_groups,
    )

    out = {}
    for k, v in dec.items():
        if k == "layers":
            lay = {}
            for kk, vv in v.items():
                if isinstance(vv, dict) and "i8pc:q" in vv:
                    w = _dequant_i8pc(vv)
                    deq = []
                    for l in range(w.shape[0]):
                        q, s = _quant_int4_groups(w[l])
                        G = w[l].shape[0] // s.shape[0]
                        deq.append(q.astype(np.float32)
                                   * np.repeat(s, G, axis=0))
                    lay[kk] = jnp.asarray(np.stack(deq), dtype)
                else:
                    lay[kk] = jnp.asarray(vv, dtype)
            out["layers"] = lay
        elif k == "lm_head_pc":
            continue
        elif isinstance(v, dict):
            continue
        else:
            out[k] = jnp.asarray(v, dtype)
    return out


def test_int4_pack_roundtrip(setup):
    """Nibble packing: packed bytes expand back (numpy semantics matching
    pltpu.bitcast interleaved-lo-first) to the int4 values, and the
    dequantized tiles track the i8pc weights within int4 group error."""
    from qwen3_asr_tpu.ops.megakernel import (
        _dequant_i8pc,
        _pack_nibbles,
        _quant_int4_groups,
    )

    cfg, dec, _ = setup
    w = _dequant_i8pc(dec["layers"]["wqkv"])[0]           # [in, out] f32
    q, s = _quant_int4_groups(w)
    b = _pack_nibbles(q)
    # expand: byte row r -> rows 2r (lo nibble) / 2r+1 (hi nibble)
    b32 = b.astype(np.int32)
    hi = b32 >> 4
    lo = b32 & 0xF
    lo = np.where(lo >= 8, lo - 16, lo)
    rec = np.empty_like(q)
    rec[0::2] = lo
    rec[1::2] = hi
    np.testing.assert_array_equal(rec, q)
    # plain absmax path: per group |w - q*s| <= s/2 (round), q in [-7, 7]
    q0, s0 = _quant_int4_groups(w, search_clip=False)
    G = w.shape[0] // s0.shape[0]
    deq0 = q0.astype(np.float32) * np.repeat(s0, G, axis=0)
    assert np.abs(deq0 - w).max() <= (s0.max() / 2) + 1e-6
    # default path (MSE clip search): never worse than absmax rounding
    deq = q.astype(np.float32) * np.repeat(s, G, axis=0)
    mse = float(((deq - w) ** 2).mean())
    mse0 = float(((deq0 - w) ** 2).mean())
    assert mse <= mse0 + 1e-12, (mse, mse0)


def test_megakernel_int4_drift_vs_own_oracle(setup):
    """int4 mode: against a dense-f32 oracle built from the SAME
    int4-dequantized weights, the kernel's drift must be in the same class
    as the int8 kernel's drift vs its own (i8pc-dequantized) oracle — i.e.
    the only added error is the int4 weight quantization itself, which the
    oracle shares."""
    import dataclasses

    from qwen3_asr_tpu.ops.megakernel import pack_megakernel_params

    cfg, dec, mega8 = setup
    mega4 = pack_megakernel_params(dec, cfg, int4=True)
    # int4 pack is structurally half the rows
    assert mega4["qkv_q"].shape[2] * 2 == mega8["qkv_q"].shape[2]

    cfg_noker = dataclasses.replace(cfg, use_decode_attn_kernel=False)
    S = 32
    L = cfg.n_layers
    DKV = cfg.n_kv_heads * cfg.head_dim
    rng = np.random.default_rng(23)
    k0 = jnp.asarray(rng.standard_normal((L, S, DKV)) * 0.3, jnp.bfloat16)
    v0 = jnp.asarray(rng.standard_normal((L, S, DKV)) * 0.3, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)), jnp.bfloat16)
    pos = jnp.int32(17)

    tok4, _, _, h_m4 = mega_decode_step(mega4, cfg, x, pos, jnp.array(k0),
                                        jnp.array(v0), interpret=True)
    _, _, _, h_m8 = mega_decode_step(mega8, cfg, x, pos, jnp.array(k0),
                                     jnp.array(v0), interpret=True)

    def oracle(dec_dense):
        cache_f = {"k": k0.astype(jnp.float32).reshape(
                       L, S, cfg.n_kv_heads, cfg.head_dim),
                   "v": v0.astype(jnp.float32).reshape(
                       L, S, cfg.n_kv_heads, cfg.head_dim)}
        h, _ = decoder_forward(dec_dense, cfg_noker, x.astype(jnp.float32),
                               pos[None], cache_f,
                               cache_offset=pos, kv_valid_len=pos + 1)
        return np.asarray(h[0], np.float32).ravel()

    ho4 = oracle(_dequant_int4_dense(dec, cfg, jnp.float32))
    ho8 = oracle(_dequant_dense(dec, jnp.float32))
    hm4 = np.asarray(h_m4, np.float32).ravel()
    hm8 = np.asarray(h_m8, np.float32).ravel()
    rms4 = float(np.sqrt(((hm4 - ho4) ** 2).mean()))
    rms8 = float(np.sqrt(((hm8 - ho8) ** 2).mean()))
    den = float(np.abs(ho4).max())
    assert rms4 <= 2.0 * rms8 + 1e-4 * den, (rms4, rms8, den)


def test_megakernel_int4_generates(setup):
    """int4 decode steps run end-to-end (interpret) and emit tokens that
    match the argmax of the int4-dequantized dense f32 model — the int4
    path's own greedy truth."""
    import dataclasses

    from qwen3_asr_tpu.ops.megakernel import pack_megakernel_params

    cfg, dec, _ = setup
    mega4 = pack_megakernel_params(dec, cfg, int4=True)
    dec4 = _dequant_int4_dense(dec, cfg, jnp.float32)
    cfg_noker = dataclasses.replace(cfg, use_decode_attn_kernel=False)

    S = 32
    rng = np.random.default_rng(5)
    prompt = jnp.asarray(rng.integers(1, 200, size=12), jnp.int32)
    # shared prefill state from the dense-int4 model (f32)
    tok_ref, cache = _prefill(cfg_noker, dec4, prompt, S)
    L = cfg.n_layers
    DKV = cfg.n_kv_heads * cfg.head_dim
    k4 = cache["k"].astype(jnp.bfloat16).reshape(L, S, DKV)
    v4 = cache["v"].astype(jnp.bfloat16).reshape(L, S, DKV)
    tok_mega = tok_ref

    matches = 0
    for i in range(4):
        pos = jnp.int32(len(prompt) + i)
        h0 = jnp.take(dec4["token_embd"], tok_ref[None], axis=0)
        h, cache = decoder_forward(
            dec4, cfg_noker, h0, pos[None], cache,
            cache_offset=pos, kv_valid_len=pos + 1,
        )
        tok_ref = jnp.argmax(lm_logits(dec4, cfg_noker, h[0])).astype(jnp.int32)
        x = jnp.take(dec4["token_embd"], tok_mega[None], axis=0)
        tok_mega, k4, v4, _ = mega_decode_step(
            mega4, cfg, x.astype(jnp.bfloat16), pos, k4, v4, interpret=True)
        matches += int(tok_mega) == int(tok_ref)
    # bf16/int8-activation rounding can flip an occasional argmax on random
    # weights; the greedy streams must still track
    assert matches >= 3, matches


def test_megakernel_pack_requires_int8pc_fused(setup):
    cfg, _, _ = setup
    dense = init_decoder_params(cfg, jax.random.PRNGKey(4), jnp.bfloat16)
    with pytest.raises(ValueError, match="fused int8pc"):
        pack_megakernel_params(dense, cfg)
