"""Multi-chip execution: data-parallel batching + tensor-parallel weights.

The reference is strictly single-process/single-device (SURVEY.md §2:
"Parallelism inventory: zero"), so there is no distributed surface to
replicate — this module is the TPU-native scaling story instead:

- **dp**: independent utterances shard over the `dp` mesh axis (pure data
  parallelism over ICI — the only collective-free axis; one 0.6B model fits
  on every chip),
- **tp**: attention heads and the FFN intermediate dimension shard over the
  `tp` axis for serving larger models / lower per-token latency; XLA inserts
  the (all-reduce) collectives from the NamedSharding annotations on the
  weights — no hand-written communication.

Layout rules (leading L = layer axis from the stacked pytree):
  wq/wk/wv [L, h, out]  -> shard out (head dim groups)  = P(None, None, 'tp')
  wo       [L, qd, h]   -> shard in                      = P(None, 'tp', None)
  w_gate/w_up [L,h,int] -> shard out                     = P(None, None, 'tp')
  w_down   [L, int, h]  -> shard in                      = P(None, 'tp', None)
  everything else replicated over tp.
KV caches shard their n_kv_heads axis over tp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tp: int = 1) -> Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices % tp == 0, (n_devices, tp)
    dp = n_devices // tp
    dev_array = np.asarray(devices[:n_devices]).reshape(dp, tp)
    return Mesh(dev_array, axis_names=("dp", "tp"))


def _dec_layer_specs() -> dict:
    return {
        "attn_norm": P(),
        "wq": P(None, None, "tp"),
        "wk": P(None, None, "tp"),
        "wv": P(None, None, "tp"),
        "wo": P(None, "tp", None),
        "q_norm": P(),
        "k_norm": P(),
        "ffn_norm": P(),
        "w_gate": P(None, None, "tp"),
        "w_up": P(None, None, "tp"),
        "w_down": P(None, "tp", None),
        # fused single-chip leaves (fuse_decoder_params): tp-sharding their
        # out dim would cut Q from K/V mid-matrix. shard_decoder_params
        # auto-unfuses them for tp > 1; these specs only apply at tp == 1,
        # where P() is exact (no tp axis to shard over).
        "wqkv": P(),
        "w_gate_up": P(),
    }


def decoder_param_specs(params: dict) -> dict:
    specs = {
        "token_embd": P(),
        "output_norm": P(),
        # int8pc lm head: the int8 copy of the tied head, read in full
        # every step — shard the vocab dim (argmax reduces over it; XLA
        # inserts the cross-shard argmax collective)
        "lm_head_pc": P(None, "tp"),
        "layers": _dec_layer_specs(),
    }
    if "classify_w" in params:
        specs["classify_w"] = P(None, "tp")
        specs["classify_b"] = None if params.get("classify_b") is None else P("tp")
    return specs


def _quant_leaf_spec(wspec: P, leaf_key: str) -> P:
    """Spec for one subleaf of a quantized weight dict, derived from the
    weight's own spec over [..., in, out]:

      *:q     [..., in, out]      -> the weight spec itself
      q8:s    [..., in//32, out]  -> same rank, same spec
      i8pc:s  [..., out]          -> weight spec minus the `in` axis
    """
    if leaf_key == "i8pc:s":
        axes = list(wspec)
        return P(*(axes[:-2] + axes[-1:]))
    return wspec


def encoder_param_specs(params: dict) -> dict:
    lsp = {
        "attn_norm_w": P(), "attn_norm_b": P(),
        "wq": P(None, None, "tp"), "bq": P(None, "tp"),
        "wk": P(None, None, "tp"), "bk": P(None, "tp"),
        "wv": P(None, None, "tp"), "bv": P(None, "tp"),
        "wo": P(None, "tp", None), "bo": P(),
        "ffn_norm_w": P(), "ffn_norm_b": P(),
        "w_up": P(None, None, "tp"), "b_up": P(None, "tp"),
        "w_down": P(None, "tp", None), "b_down": P(),
    }
    return {
        "conv1_w": P(), "conv1_b": P(), "conv2_w": P(), "conv2_b": P(),
        "conv3_w": P(), "conv3_b": P(),
        "conv_out_w": P(), "layers": lsp,
        "ln_post_w": P(), "ln_post_b": P(),
        "proj1_w": P(), "proj1_b": P(), "proj2_w": P(), "proj2_b": P(),
    }


def _shard(params: dict, specs: dict, mesh: Mesh) -> dict:
    def place(path, leaf):
        if leaf is None:
            return None
        spec = specs
        quant_key = None
        for k in path:
            if not isinstance(spec, dict):
                quant_key = k.key  # inside a quantized leaf dict
                break
            spec = spec.get(k.key, P())  # unknown leaves replicate
        if spec is None or isinstance(spec, dict):
            spec = P()
        if quant_key is not None:
            spec = _quant_leaf_spec(spec, quant_key)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_decoder_params(params: dict, mesh: Mesh, cfg=None) -> dict:
    """Place decoder params on the mesh per the tp layout rules.

    tp > 1 handles every shipping weight layout:
    - fused (`wqkv`/`w_gate_up`): auto-unfused first (pass `cfg`) — an
      out-dim shard of the fused matrices would split Q from K/V,
    - int8pc dicts: int8 weights shard like the dense weight, per-channel
      scales shard their out axis,
    - q8_0 dicts: unsupported under tp — the Q8_0 path runs Pallas grid
      kernels that expect whole weights on one chip; use int8pc (the
      faster config anyway) for multi-chip.
    """
    tp = mesh.shape.get("tp", 1)
    if tp > 1:
        layers = params["layers"]
        if "wqkv" in layers or "w_gate_up" in layers:
            if cfg is None:
                raise ValueError(
                    "fused decoder params need cfg to auto-unfuse for tp>1")
            from qwen3_asr_tpu.runtime.params import unfuse_decoder_params

            params = unfuse_decoder_params(params, cfg)
        has_q8 = "lm_head_q8" in params or any(
            isinstance(v, dict) and "q8:q" in v
            for v in params["layers"].values()
        )
        if has_q8:
            raise NotImplementedError(
                "q8_0 (Pallas) layout cannot tp-shard; quantize with "
                "'int8pc' for multi-chip")
    return _shard(params, decoder_param_specs(params), mesh)


def shard_encoder_params(params: dict, mesh: Mesh) -> dict:
    return _shard(params, encoder_param_specs(params), mesh)


# ---------------------------------------------------------------------------
# batched (data-parallel) serving step
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("cfg", "audio_offset", "max_tokens", "mesh",
                     "cache_dtype", "mega_batch_limit", "_mega_interpret"),
)
def batched_transcribe_step(
    dec_params: dict,
    cfg,
    tokens,        # [B, P] int32 — per-utterance prompts, dp-sharded
    n_prompt,      # [B] int32
    audio,         # [B, N_max, hidden]
    n_audio,       # [B] int32
    audio_offset: int,
    max_tokens: int,
    mesh: Mesh | None = None,
    cache_dtype=jnp.bfloat16,
    mega_batch_limit: int = 16,
    _mega_interpret: bool = False,
):
    """vmapped greedy generation over a batch of utterances.

    With `tokens`/`audio` sharded over the `dp` axis and weights sharded per
    the tp rules, XLA runs dp-many independent decodes with tp-sharded
    matmuls — the multi-file batch mode of BASELINE.json config 5.

    cache_dtype=jnp.int8 on a Pallas device routes through the batched
    decode megakernel (int8 KV is its only mode) — the serving daemon's
    default. On a pure-dp mesh (tp == 1) the kernel runs under shard_map:
    decode is communication-free across sequences, so every chip advances
    its local batch shard through the same chunked kernel loop with the
    replicated weight stream read once per chip per step. tp > 1 takes
    the vmapped XLA step (the in-kernel DMA ring has no cross-chip
    story — XLA inserts the tp collectives from the weight shardings).
    bf16 keeps the vmapped XLA step so the KV numerics follow the
    caller's setting, never the routing.
    """
    from qwen3_asr_tpu.models.generate import generate_greedy

    dp = mesh.shape.get("dp", 1) if mesh is not None else 1
    tp = mesh.shape.get("tp", 1) if mesh is not None else 1
    if cache_dtype == jnp.int4:
        # the batched megakernel's per-seq KV slab ring is int8-only;
        # int4 KV is a single-seq-stream feature. int8 here beats falling
        # to the vmapped XLA step (~4.8x slower aggregate).
        cache_dtype = jnp.int8
    use_mega_batch = ("mega" in dec_params and tp == 1
                      and cache_dtype == jnp.int8)
    kv_stream = False
    if use_mega_batch:
        # long-context routing: the resident kernel keeps NSLAB whole
        # per-seq KV slabs in VMEM; past its budget the SAME kernel
        # switches to streamed-KV mode (per-seq KV_BLOCK tiles + online
        # softmax, VMEM O(1) in context) with a possibly smaller launch
        # chunk — the vmapped XLA step (~4.8x slower aggregate) is only
        # the last resort when even the stream's per-seq outputs don't fit
        from qwen3_asr_tpu.ops.megakernel_batch import (
            mega_batch_max_context,
            mega_batch_stream_max_batch,
        )

        S_need = -(-(tokens.shape[1] + max_tokens) // 128) * 128
        # per-launch batch: sequences run through the kernel in
        # <=mega_batch_limit chunks, and the kernel's VMEM outputs
        # (fresh K/V rows + scales) scale with that launch batch
        B_launch = min(tokens.shape[0], max(1, mega_batch_limit))
        if S_need > mega_batch_max_context(
                dec_params["mega"], cfg, batch=B_launch):
            b_stream = mega_batch_stream_max_batch(dec_params["mega"], cfg)
            if b_stream >= 1:
                kv_stream = True
                mega_batch_limit = min(mega_batch_limit, b_stream)
            else:
                use_mega_batch = False
    if use_mega_batch:
        from qwen3_asr_tpu.ops.support import has_pallas_tpu

        if has_pallas_tpu() or _mega_interpret:
            # batched megakernel: one Pallas launch advances up to
            # `mega_batch_limit` sequences one token; the int8 weight
            # stream is read once per step instead of once per
            # sequence. 3880 tok/s aggregate at B=8 vs 803 for the
            # vmapped XLA step (v5e). The kernel unrolls attention per
            # sequence, so past ~16 sequences compile time and kernel
            # code size outgrow the win — larger batches run as
            # sequential <=16-sequence chunks (weights re-read once per
            # chunk: at B=32 that is 2 weight streams per global step,
            # still ~8x fewer than 32 single streams; no cliff onto the
            # vmapped XLA step).
            from qwen3_asr_tpu.models.generate import (
                generate_greedy_batch_mega,
            )

            # call the unjitted body: we are already inside this jit, and
            # nesting the inner jit at two chunk shapes trips an XLA
            # closed_call lowering-cache bug (jax 0.9.0)
            fn = getattr(generate_greedy_batch_mega, "__wrapped__",
                         generate_greedy_batch_mega)
            lim = max(1, mega_batch_limit)

            def run_mega(p, tk, npr, au, na):
                outs, nks = [], []
                for s in range(0, tk.shape[0], lim):
                    e = min(tk.shape[0], s + lim)
                    o, nk = fn(
                        p, cfg, tk[s:e], npr[s:e], au[s:e], na[s:e],
                        audio_offset, max_tokens, _mega_interpret,
                        kv_stream)
                    outs.append(o)
                    nks.append(nk)
                if len(outs) == 1:
                    return outs[0], nks[0]
                return jnp.concatenate(outs, 0), jnp.concatenate(nks, 0)

            if dp == 1:
                return run_mega(dec_params, tokens, n_prompt, audio,
                                n_audio)
            # dp-sharded megakernel (shard_map over 'dp'): weights enter
            # replicated (P()), the batch axes split across chips, and
            # each chip runs the chunk loop on its local shard with no
            # collectives. check_vma off: the kernel's manual DMAs carry
            # no varying-manual-axes info.
            B = tokens.shape[0]
            pad = -B % dp
            if pad:
                ext = lambda x: jnp.concatenate(
                    [x, jnp.repeat(x[:1], pad, axis=0)], axis=0)
                tokens, n_prompt, audio, n_audio = (
                    ext(tokens), ext(n_prompt), ext(audio), ext(n_audio))
            out, nk = jax.shard_map(
                run_mega,
                mesh=mesh,
                in_specs=(P(), P("dp"), P("dp"), P("dp"), P("dp")),
                out_specs=(P("dp"), P("dp")),
                check_vma=False,
            )(dec_params, tokens, n_prompt, audio, n_audio)
            return out[:B], nk[:B]
    if "mega" in dec_params:
        # the single-seq megakernel has no batch dim, and under tp the
        # manual DMA ring has no cross-chip sharding story — the vmapped
        # XLA step takes over
        dec_params = {k: v for k, v in dec_params.items() if k != "mega"}

    # note: the pallas decode-attention kernel stays ON under vmap —
    # measured FASTER than the masked-XLA batched attention (B=4: 754 vs
    # 660 tok/s aggregate; B=8: 803 vs 750). cfg.use_decode_attn_kernel
    # remains the off-switch if a future shape regresses.

    def one(tk, npr, au, na):
        return generate_greedy(
            dec_params, cfg, tk, npr, au, na, audio_offset, max_tokens,
            cache_dtype=cache_dtype,
        )

    out, n_kept = jax.vmap(one)(tokens, n_prompt, audio, n_audio)
    if mesh is not None:
        out = jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P("dp", None))
        )
    return out, n_kept
