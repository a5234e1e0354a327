"""Batched decode megakernel vs B independent single-seq i8 steps
(interpret mode). Same weights, same caches: each sequence's next token,
hidden state, and freshly written cache rows must match the single-seq
kernel exactly up to f32 reduction order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.config import tiny_asr_config
from qwen3_asr_tpu.ops.megakernel import (
    mega_decode_step_i8,
    pack_megakernel_params,
)
from qwen3_asr_tpu.ops.megakernel_batch import mega_decode_step_batch
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


def test_generate_batch_mega_matches_xla_int8(setup):
    """End-to-end glue: generate_greedy_batch_mega (interpret kernel) vs
    the vmapped XLA int8-cache greedy path — same prompts, same weights,
    token-for-token equal on the tiny config, with per-seq EOS/n_kept
    bookkeeping intact."""
    from qwen3_asr_tpu.models.generate import (
        generate_greedy,
        generate_greedy_batch_mega,
    )

    cfg, dec, mega = setup
    dec = dict(dec)
    dec["mega"] = mega
    B, P, MAX = 2, 16, 5
    rng = np.random.default_rng(9)
    tokens = jnp.asarray(rng.integers(1, 200, (B, P)), jnp.int32)
    n_prompt = jnp.asarray([12, 16], jnp.int32)
    audio = jnp.zeros((B, 4, cfg.hidden_size), jnp.bfloat16)
    n_audio = jnp.zeros((B,), jnp.int32)

    out_b, nk_b = generate_greedy_batch_mega(
        dec, cfg, tokens, n_prompt, audio, n_audio, 0, MAX,
        interpret=True)

    dec_nomega = {k: v for k, v in dec.items() if k != "mega"}
    for b in range(B):
        out_s, nk_s = generate_greedy(
            dec_nomega, cfg, tokens[b], n_prompt[b], audio[b], n_audio[b],
            0, MAX, cache_dtype=jnp.int8)
        assert int(nk_b[b]) == int(nk_s), b
        n = int(nk_s)
        np.testing.assert_array_equal(
            np.asarray(out_b[b, :n]), np.asarray(out_s[:n]),
            err_msg=f"seq {b}")


def test_batch_matches_single_seq_int4(setup):
    """int4 weight stream: the batched kernel must match the single-seq
    int4 kernel token-for-token on the same state (both use the same pack,
    so any divergence is a kernel bug, not quantization)."""
    cfg, dec, _ = setup
    mega4 = pack_megakernel_params(dec, cfg, int4=True)
    B, S = 2, 32
    L = cfg.n_layers
    NKV, D = cfg.n_kv_heads, cfg.head_dim
    DKV = NKV * D
    H = cfg.hidden_size
    rng = np.random.default_rng(29)

    kq = jnp.asarray(rng.integers(-127, 128, (B, L, S, DKV)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (B, L, S, DKV)), jnp.int8)
    ks = jnp.asarray(np.abs(rng.standard_normal((B, L, NKV, S))) * 0.01
                     + 1e-4, jnp.float32)
    vs = jnp.asarray(np.abs(rng.standard_normal((B, L, NKV, S))) * 0.01
                     + 1e-4, jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, H)), jnp.bfloat16)
    pos = jnp.asarray([9, 21], jnp.int32)

    tok_b, _, _, _, _, h_b = mega_decode_step_batch(
        mega4, cfg, x, pos, jnp.array(kq), jnp.array(vq),
        jnp.array(ks), jnp.array(vs), interpret=True)

    for b in range(B):
        tok_s, _, _, _, _, h_s = mega_decode_step_i8(
            mega4, cfg, x[b:b + 1], pos[b],
            jnp.array(kq[b]), jnp.array(vq[b]),
            jnp.array(ks[b]), jnp.array(vs[b]), interpret=True)
        assert int(tok_b[b]) == int(tok_s), b
        np.testing.assert_allclose(
            np.asarray(h_b[b], np.float32), np.asarray(h_s[0], np.float32),
            atol=1e-2, rtol=1e-2, err_msg=f"hidden, seq {b}")


def test_batched_transcribe_chunks_over_limit(setup):
    """B > mega_batch_limit no longer cliffs onto the vmapped XLA step:
    batched_transcribe_step splits the batch into <=limit chunks through
    the batched megakernel and concatenates — results must equal the
    unchunked kernel's (VERDICT r2 weak-4)."""
    from qwen3_asr_tpu.models.generate import generate_greedy_batch_mega
    from qwen3_asr_tpu.parallel.mesh import batched_transcribe_step

    cfg, dec, mega = setup
    dec = dict(dec)
    dec["mega"] = mega
    real = generate_greedy_batch_mega

    B, P, MAX = 5, 16, 4
    rng = np.random.default_rng(31)
    tokens = jnp.asarray(rng.integers(1, 200, (B, P)), jnp.int32)
    n_prompt = jnp.asarray([12, 16, 9, 14, 11], jnp.int32)
    audio = jnp.zeros((B, 4, cfg.hidden_size), jnp.bfloat16)
    n_audio = jnp.zeros((B,), jnp.int32)

    out_c, nk_c = batched_transcribe_step(
        dec, cfg, tokens, n_prompt, audio, n_audio, 0, MAX,
        cache_dtype=jnp.int8, mega_batch_limit=2, _mega_interpret=True)
    out_u, nk_u = real(dec, cfg, tokens, n_prompt, audio, n_audio, 0, MAX,
                       interpret=True)
    np.testing.assert_array_equal(np.asarray(nk_c), np.asarray(nk_u))
    for b in range(B):
        n = int(nk_u[b])
        np.testing.assert_array_equal(
            np.asarray(out_c[b, :n]), np.asarray(out_u[b, :n]),
            err_msg=f"seq {b}")


def test_batch_matches_single_seq(setup):
    cfg, dec, mega = setup
    B, S = 3, 32
    L = cfg.n_layers
    NKV, D = cfg.n_kv_heads, cfg.head_dim
    DKV = NKV * D
    H = cfg.hidden_size
    rng = np.random.default_rng(5)

    kq = jnp.asarray(rng.integers(-127, 128, (B, L, S, DKV)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (B, L, S, DKV)), jnp.int8)
    ks = jnp.asarray(np.abs(rng.standard_normal((B, L, NKV, S))) * 0.01
                     + 1e-4, jnp.float32)
    vs = jnp.asarray(np.abs(rng.standard_normal((B, L, NKV, S))) * 0.01
                     + 1e-4, jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, H)), jnp.bfloat16)
    pos = jnp.asarray([7, 19, 12], jnp.int32)

    tok_b, kq2, vq2, ks2, vs2, h_b = mega_decode_step_batch(
        mega, cfg, x, pos, jnp.array(kq), jnp.array(vq),
        jnp.array(ks), jnp.array(vs), interpret=True)

    for b in range(B):
        tok_s, kq1, vq1, ks1, vs1, h_s = mega_decode_step_i8(
            mega, cfg, x[b:b + 1], pos[b],
            jnp.array(kq[b]), jnp.array(vq[b]),
            jnp.array(ks[b]), jnp.array(vs[b]), interpret=True)
        assert int(tok_b[b]) == int(tok_s), b
        np.testing.assert_allclose(
            np.asarray(h_b[b], np.float32), np.asarray(h_s[0], np.float32),
            atol=1e-2, rtol=1e-2, err_msg=f"hidden, seq {b}")
        p = int(pos[b])
        np.testing.assert_array_equal(
            np.asarray(kq2[b, :, p, :]), np.asarray(kq1[:, p, :]),
            err_msg=f"fresh k row, seq {b}")
        np.testing.assert_allclose(
            np.asarray(ks2[b, :, :, p]), np.asarray(ks1[:, :, p]),
            rtol=1e-6, err_msg=f"fresh k scale, seq {b}")


def test_decoder_prefill_batch_matches_per_seq():
    """decoder_prefill_batch (flat [B*P] matmuls + per-seq attention) must
    reproduce B independent decoder_forward prefills: hidden states and
    fresh K/V rows, at each sequence's own valid length."""
    from qwen3_asr_tpu.models.decoder import (
        decoder_forward,
        decoder_prefill_batch,
        init_kv_cache,
    )

    cfg = tiny_asr_config().decoder
    dec = init_decoder_params(cfg, jax.random.PRNGKey(5), jnp.float32)
    rng = np.random.default_rng(0)
    B, P = 3, 16
    h0 = jnp.asarray(rng.standard_normal((B, P, cfg.hidden_size)),
                     jnp.float32)
    n_valid = jnp.asarray([16, 9, 12], jnp.int32)
    positions = jnp.arange(P, dtype=jnp.int32)

    hb, rows = decoder_prefill_batch(dec, cfg, h0, positions, n_valid)

    for b in range(B):
        cache = init_kv_cache(cfg, P, jnp.float32)
        hs, cache = decoder_forward(
            dec, cfg, h0[b], positions, cache, cache_offset=jnp.int32(0),
            kv_valid_len=n_valid[b], prefill=True)
        nv = int(n_valid[b])
        np.testing.assert_allclose(
            np.asarray(hb[b, :nv]), np.asarray(hs[:nv]),
            atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(rows["k"][:, b, :nv]), np.asarray(cache["k"][:, :nv]),
            atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(rows["v"][:, b, :nv]), np.asarray(cache["v"][:, :nv]),
            atol=2e-5, rtol=1e-5)


def test_batch_stream_matches_resident(setup):
    """Streamed-KV batched kernel (parity-halved tile ring + online
    softmax) == resident batched kernel: same weights, same caches, per
    sequence at its own position. S is a KV_BLOCK multiple so both modes
    accept the same cache."""
    from qwen3_asr_tpu.ops.megakernel import KV_BLOCK

    cfg, dec, mega = setup
    B, S = 3, 2 * KV_BLOCK
    L = cfg.n_layers
    NKV, D = cfg.n_kv_heads, cfg.head_dim
    DKV = NKV * D
    H = cfg.hidden_size
    rng = np.random.default_rng(9)

    kq = jnp.asarray(rng.integers(-127, 128, (B, L, S, DKV)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (B, L, S, DKV)), jnp.int8)
    ks = jnp.asarray(np.abs(rng.standard_normal((B, L, NKV, S))) * 0.01
                     + 1e-4, jnp.float32)
    vs = jnp.asarray(np.abs(rng.standard_normal((B, L, NKV, S))) * 0.01
                     + 1e-4, jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, H)), jnp.bfloat16)
    # positions straddling block boundaries: 0 blocks live is impossible
    # (pos >= 1 in decode), 1 block, and just past a block edge
    pos = jnp.asarray([7, KV_BLOCK - 1, KV_BLOCK + 5], jnp.int32)

    tok_r, kr, vr, ksr, vsr, h_r = mega_decode_step_batch(
        mega, cfg, x, pos, jnp.array(kq), jnp.array(vq),
        jnp.array(ks), jnp.array(vs), interpret=True)

    def blockify(s):  # [B, L, NKV, S] -> [B, L, NB, NKV, KVB]
        return (s.transpose(0, 1, 3, 2)
                .reshape(B, L, S // KV_BLOCK, KV_BLOCK, NKV)
                .transpose(0, 1, 2, 4, 3))

    tok_s, ks_, vs_, kss, vss, h_s = mega_decode_step_batch(
        mega, cfg, x, pos, jnp.array(kq), jnp.array(vq),
        blockify(np.asarray(ks)), blockify(np.asarray(vs)),
        interpret=True, kv_stream=True)

    np.testing.assert_array_equal(np.asarray(tok_r), np.asarray(tok_s))
    np.testing.assert_allclose(
        np.asarray(h_r, np.float32), np.asarray(h_s, np.float32),
        atol=1e-2, rtol=1e-2)
    for b in range(B):
        p = int(pos[b])
        np.testing.assert_array_equal(
            np.asarray(kr[b, :, p, :]), np.asarray(ks_[b, :, p, :]),
            err_msg=f"fresh k row, seq {b}")
        np.testing.assert_allclose(
            np.asarray(ksr[b, :, :, p]),
            np.asarray(kss[b, :, p // KV_BLOCK, :, p % KV_BLOCK]),
            rtol=1e-6, err_msg=f"fresh k scale, seq {b}")


def test_generate_batch_mega_stream_matches_resident(setup):
    """Whole-loop batched generation with kv_stream=True (prefill ->
    block-major scales -> streamed kernel steps) produces the same tokens
    as the resident mode."""
    from qwen3_asr_tpu.models.generate import generate_greedy_batch_mega

    cfg, dec, mega = setup
    import dataclasses

    dcfg = dataclasses.replace(cfg, eos_token_id=-1)
    dec = dict(dec)
    dec["mega"] = mega
    rng = np.random.default_rng(3)
    B, P, NA = 2, 16, 4
    toks = np.full((B, P), dcfg.pad_token_id % dcfg.vocab_size, np.int32)
    n_prompt = np.zeros((B,), np.int32)
    audio = rng.standard_normal((B, NA, dcfg.hidden_size)) * 0.1
    for b in range(B):
        pr = [5, 6 + b] + [dcfg.audio_pad_token_id] * NA + [7]
        toks[b, : len(pr)] = pr
        n_prompt[b] = len(pr)
    args = (dec, dcfg, jnp.asarray(toks), jnp.asarray(n_prompt),
            jnp.asarray(audio, jnp.bfloat16),
            jnp.asarray([NA] * B, jnp.int32), 2, 6)
    out_r, nk_r = generate_greedy_batch_mega(*args, interpret=True)
    out_s, nk_s = generate_greedy_batch_mega(*args, interpret=True,
                                             kv_stream=True)
    np.testing.assert_array_equal(np.asarray(nk_r), np.asarray(nk_s))
    np.testing.assert_array_equal(np.asarray(out_r), np.asarray(out_s))
