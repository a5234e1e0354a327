"""Q8_0-style int8 matmul: kernel (interpret mode) vs XLA reference, and
quantized decoder accuracy vs dense."""

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
from qwen3_asr_tpu.ops.q8_matmul import (
    _q8_matmul_xla,
    dequantize_q8_weights,
    matmul_any,
    q8_matmul,
    quant_leaf,
    quantize_q8_weights,
)
from qwen3_asr_tpu.runtime.params import init_asr_params, quantize_decoder_params


def test_quantize_dequantize_error_bound(rng):
    w = rng.standard_normal((64, 96)).astype(np.float32)
    q, s = quantize_q8_weights(w)
    back = np.asarray(dequantize_q8_weights(jnp.asarray(q), jnp.asarray(s)))
    # per-block max error is scale/2
    err = np.abs(back - w)
    bound = np.repeat(s, 32, axis=0) * 0.5 + 1e-7
    assert (err <= bound).all()


@pytest.mark.parametrize("T,n_in,n_out", [(1, 1024, 512), (8, 256, 1024),
                                          (4, 3072, 1024)])
def test_kernel_matches_xla_reference(rng, T, n_in, n_out):
    x = rng.standard_normal((T, n_in)).astype(np.float32)
    w = rng.standard_normal((n_in, n_out)).astype(np.float32) * 0.05
    q, s = quantize_q8_weights(w)
    ref = np.asarray(_q8_matmul_xla(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s)))
    out = np.asarray(q8_matmul(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s),
                               interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-5)


def test_norm_matmul_kernel_matches_xla(rng):
    """Fused rms_norm + int8 matmul kernel == norm-then-matmul reference."""
    from qwen3_asr_tpu.ops.q8_matmul import _rms_norm_f32, q8_norm_matmul

    x = jnp.asarray(rng.standard_normal((1, 256)).astype(np.float32))
    nw = jnp.asarray(rng.standard_normal((256,)).astype(np.float32))
    w = rng.standard_normal((256, 640)).astype(np.float32) * 0.05
    q, s = quantize_q8_weights(w)
    leaf = {"q8:q": jnp.asarray(q), "q8:s": jnp.asarray(s)}
    ref = np.asarray(_q8_matmul_xla(_rms_norm_f32(x, nw, 1e-6),
                                    leaf["q8:q"], leaf["q8:s"]))
    out = np.asarray(q8_norm_matmul(x, leaf, nw, 1e-6, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-5)


def test_mlp_kernel_matches_reference(rng):
    """Whole-MLP kernel (norm + gate/up + silu*mul + down) == step-by-step
    reference, including the multi-phase scratch accumulation."""
    from qwen3_asr_tpu.ops.q8_matmul import _rms_norm_f32, q8_mlp

    H, F = 256, 384  # F forces TILE=F (single gate phase) — and 2 tiles below
    for tile_F in (F, 1024):  # 1024 -> TILE=512, 2 gate/up phases
        Fx = tile_F
        x = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32))
        nw = jnp.asarray(rng.standard_normal((H,)).astype(np.float32))
        w_gu = rng.standard_normal((H, 2 * Fx)).astype(np.float32) * 0.05
        w_d = rng.standard_normal((Fx, H)).astype(np.float32) * 0.05
        qgu, sgu = quantize_q8_weights(w_gu)
        qd, sd = quantize_q8_weights(w_d)
        gu_leaf = {"q8:q": jnp.asarray(qgu), "q8:s": jnp.asarray(sgu)}
        d_leaf = {"q8:q": jnp.asarray(qd), "q8:s": jnp.asarray(sd)}

        # the kernel dequantizes the MLP weights to bf16 (see q8_mlp):
        # mirror that math in the reference
        from qwen3_asr_tpu.ops.q8_matmul import dequantize_q8_weights

        def deq16(leaf):
            return dequantize_q8_weights(
                leaf["q8:q"], leaf["q8:s"]).astype(jnp.bfloat16)

        xn = _rms_norm_f32(x, nw, 1e-6).astype(jnp.bfloat16)
        gu = np.asarray(jnp.dot(xn, deq16(gu_leaf),
                                preferred_element_type=jnp.float32))
        h = (np.asarray(jax.nn.silu(gu[:, :Fx])) * gu[:, Fx:]).astype(
            jnp.bfloat16)
        ref = np.asarray(jnp.dot(jnp.asarray(h), deq16(d_leaf),
                                 preferred_element_type=jnp.float32))

        out = np.asarray(q8_mlp(x, gu_leaf, d_leaf, nw, 1e-6, Fx,
                                interpret=True))
        denom = max(1e-6, float(np.abs(ref).max()))
        assert np.abs(out - ref).max() / denom < 2e-2


def test_matmul_any_dispatch(rng):
    x = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    w = rng.standard_normal((64, 128)).astype(np.float32) * 0.05
    dense = np.asarray(matmul_any(x, jnp.asarray(w)))
    quant = np.asarray(matmul_any(x, quant_leaf(w)))
    # int8 quantization error, not exact
    np.testing.assert_allclose(quant, dense, atol=5e-2, rtol=0)


def test_quantized_decoder_close_to_dense(rng):
    cfg = tiny_asr_config()
    params = init_asr_params(cfg, seed=7, dtype=jnp.float32)
    dec = params["decoder"]
    qdec = quantize_decoder_params(dec)

    T = 10
    tokens = rng.integers(0, 100, size=T).astype(np.int32)
    h0 = embed_with_audio(dec, jnp.asarray(tokens), None, 0, 0)

    def run(d):
        cache = init_kv_cache(cfg.decoder, T, jnp.float32)
        h, _ = decoder_forward(
            d, cfg.decoder, h0, jnp.arange(T, dtype=jnp.int32), cache,
            jnp.int32(0), jnp.int32(T),
        )
        return np.asarray(lm_logits(d, cfg.decoder, h[-1]))

    dense_logits = run(dec)
    quant_logits = run(qdec)
    # greedy argmax agreement is what matters for WER parity
    assert np.argmax(dense_logits) == np.argmax(quant_logits)
    denom = np.abs(dense_logits).max()
    assert np.abs(quant_logits - dense_logits).max() / denom < 0.05


def test_pc_matmul_close_to_dense(rng):
    """Per-channel W8A8 (int8 MXU path): weight + activation quantization
    error stays within the expected band."""
    from qwen3_asr_tpu.ops.q8_matmul import pc_leaf

    x = jnp.asarray(rng.standard_normal((3, 256)).astype(np.float32))
    w = rng.standard_normal((256, 512)).astype(np.float32) * 0.05
    dense = np.asarray(matmul_any(x, jnp.asarray(w)))
    quant = np.asarray(matmul_any(x, pc_leaf(w)))
    denom = np.abs(dense).max()
    assert np.abs(quant - dense).max() / denom < 0.03


def test_int8pc_decoder_argmax_agreement(rng):
    """int8pc-quantized decoder keeps greedy-argmax parity with dense
    (the accuracy contract for the W8A8 serving mode)."""
    cfg = tiny_asr_config()
    params = init_asr_params(cfg, seed=7, dtype=jnp.float32)
    dec = params["decoder"]
    qdec = quantize_decoder_params(dec, "int8pc")
    assert "lm_head_pc" in qdec

    T = 10
    tokens = rng.integers(0, 100, size=T).astype(np.int32)
    h0 = embed_with_audio(dec, jnp.asarray(tokens), None, 0, 0)

    def run(d):
        cache = init_kv_cache(cfg.decoder, T, jnp.float32)
        h, _ = decoder_forward(
            d, cfg.decoder, h0, jnp.arange(T, dtype=jnp.int32), cache,
            jnp.int32(0), jnp.int32(T),
        )
        return np.asarray(lm_logits(d, cfg.decoder, h[-1]))

    dense_logits = run(dec)
    quant_logits = run(qdec)
    assert np.argmax(dense_logits) == np.argmax(quant_logits)
    denom = np.abs(dense_logits).max()
    assert np.abs(quant_logits - dense_logits).max() / denom < 0.08

    # fusion concatenates pc leaves losslessly
    from qwen3_asr_tpu.runtime.params import fuse_decoder_params
    fused = fuse_decoder_params(qdec)
    assert "wqkv" in fused["layers"]
    assert "i8pc:q" in fused["layers"]["wqkv"]
    fused_logits = run(fused)
    np.testing.assert_allclose(fused_logits, quant_logits, atol=1e-4)


def test_int8_kv_cache_generate_agreement(rng):
    """int8 KV cache (rows + per-(row, head) scales): greedy tokens match
    the f32-cache decode on a tiny model."""
    from qwen3_asr_tpu.models.generate import generate_greedy

    cfg = tiny_asr_config()
    params = init_asr_params(cfg, seed=3, dtype=jnp.float32)
    dec = params["decoder"]
    dcfg = cfg.decoder
    n_audio = 4
    audio = rng.standard_normal((n_audio, dcfg.hidden_size)).astype(np.float32)
    prompt = ([5, 6] + [dcfg.audio_pad_token_id] * n_audio
              + [dcfg.audio_end_token_id, 7])
    P = 16
    toks = np.full(P, dcfg.pad_token_id % dcfg.vocab_size, np.int32)
    toks[: len(prompt)] = prompt
    args = (jnp.asarray(toks), jnp.int32(len(prompt)), jnp.asarray(audio),
            jnp.int32(n_audio), 2, 8)

    base_out, base_n = generate_greedy(dec, dcfg, *args,
                                       cache_dtype=jnp.float32)
    q_out, q_n = generate_greedy(dec, dcfg, *args, cache_dtype=jnp.int8)
    assert int(base_n) == int(q_n)
    n = int(base_n)
    assert list(np.asarray(base_out)[:n]) == list(np.asarray(q_out)[:n])


def test_decode_attention_int8_cache_matches(rng):
    """The decode-attention kernel's int8-cache variant == dequantize-then-
    attend (interpret mode)."""
    from qwen3_asr_tpu.models.decoder import _quantize_kv_rows
    from qwen3_asr_tpu.ops.decode_attention import decode_attention

    n_heads, n_kv, D, S = 4, 2, 128, 64
    eps, theta, scale = 1e-6, 1e4, 1.0 / np.sqrt(D)
    pos = 37
    qkv = jnp.asarray(
        rng.standard_normal((1, (n_heads + 2 * n_kv) * D)), jnp.float32)
    kc = rng.standard_normal((S, n_kv, D)).astype(np.float32)
    vc = rng.standard_normal((S, n_kv, D)).astype(np.float32)
    qn = jnp.asarray(rng.standard_normal(D).astype(np.float32))
    kn = jnp.asarray(rng.standard_normal(D).astype(np.float32))
    kq, ks = _quantize_kv_rows(jnp.asarray(kc))
    vq, vs = _quantize_kv_rows(jnp.asarray(vc))

    kw = dict(n_heads=n_heads, n_kv=n_kv, head_dim=D, eps=eps, theta=theta,
              scale=float(scale), interpret=True)
    ref, _, _ = decode_attention(
        qkv, kq.astype(jnp.float32) * ks[..., None],
        vq.astype(jnp.float32) * vs[..., None], qn, kn,
        jnp.int32(pos), jnp.int32(pos), **kw)
    out, k_new, v_new = decode_attention(
        qkv, kq, vq, qn, kn, jnp.int32(pos), jnp.int32(pos),
        k_scale=ks, v_scale=vs, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_native_q8_gguf_load(tmp_path, rng):
    """A Q8_0 GGUF loads its blocks directly as int8 leaves (no requant),
    and the pipeline produces the same tokens as dequantized-float load."""
    import jax
    from qwen3_asr_tpu.ops.q8_matmul import is_quant_leaf
    from qwen3_asr_tpu.runtime.gguf import GGML_TYPE_Q8_0
    from qwen3_asr_tpu.runtime.params import load_asr_model
    import qwen3_asr_tpu.runtime.params as P
    from helpers import make_byte_vocab, write_tiny_gguf

    cfg = tiny_asr_config()
    params = jax.tree.map(np.asarray, init_asr_params(cfg, 17, jnp.float32))
    vocab = make_byte_vocab(cfg.decoder.vocab_size, {})
    path = str(tmp_path / "q8.gguf")
    write_tiny_gguf(path, cfg, params, vocab=vocab, merges=[],
                    weight_type=GGML_TYPE_Q8_0)

    _, loaded, _, _ = load_asr_model(path, dtype=jnp.float32)
    lw = loaded["decoder"]["layers"]
    assert is_quant_leaf(lw["wq"]) and is_quant_leaf(lw["w_down"])
    assert lw["wq"]["q8:q"].dtype == jnp.int8

    # int8 values must be the very blocks the file stores: dequantize and
    # compare against GGUFFile.get()'s float decode
    from qwen3_asr_tpu.ops.q8_matmul import dequantize_q8_weights
    from qwen3_asr_tpu.runtime.gguf import GGUFFile
    g = GGUFFile(path)
    ref = g.get("blk.0.attn_q.weight").T  # [in, out] float
    back = np.asarray(dequantize_q8_weights(lw["wq"]["q8:q"][0], lw["wq"]["q8:s"][0]))
    np.testing.assert_allclose(back, ref, atol=1e-6, rtol=0)

    # forward equivalence: quant leaves vs dequantized dense weights
    T = 6
    tokens = rng.integers(0, 100, size=T).astype(np.int32)
    h0 = embed_with_audio(loaded["decoder"], jnp.asarray(tokens), None, 0, 0)
    cache = init_kv_cache(cfg.decoder, T, jnp.float32)
    h_q, _ = decoder_forward(loaded["decoder"], cfg.decoder, h0,
                             jnp.arange(T, dtype=jnp.int32), cache,
                             jnp.int32(0), jnp.int32(T))
    dense = dict(loaded["decoder"])
    dense["layers"] = {
        k: (jnp.stack([dequantize_q8_weights(v["q8:q"][l], v["q8:s"][l])
                       for l in range(cfg.decoder.n_layers)])
            if isinstance(v, dict) else v)
        for k, v in lw.items()
    }
    cache = init_kv_cache(cfg.decoder, T, jnp.float32)
    h_d, _ = decoder_forward(dense, cfg.decoder, h0,
                             jnp.arange(T, dtype=jnp.int32), cache,
                             jnp.int32(0), jnp.int32(T))
    np.testing.assert_allclose(np.asarray(h_q), np.asarray(h_d),
                               atol=1e-4, rtol=0)
