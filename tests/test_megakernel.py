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


def test_megakernel_pack_requires_int8pc_fused(setup):
    cfg, _, _ = setup
    dense = init_decoder_params(cfg, jax.random.PRNGKey(4), jnp.bfloat16)
    with pytest.raises(ValueError, match="fused int8pc"):
        pack_megakernel_params(dense, cfg)
