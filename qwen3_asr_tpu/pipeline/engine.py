"""Continuous (in-flight) batching: a slot-pool decode engine.

The reference binary serves one utterance per process (main.cpp); the
repo's ASRServer batches concurrent arrivals into one device dispatch,
but a batch formed at launch is CLOSED: a request arriving one step
after launch waits for the whole batch to decode to completion
(head-of-line blocking of up to max_tokens x step time), and slots
whose sequence hit EOS early ride along frozen until the longest
member finishes (models/generate.py::generate_greedy_batch_mega).

TPU-shaped continuous batching: per-step admission (vLLM-style) would
put the host inside the decode loop — one link round trip per token,
ruinous on a network-attached chip — so the engine decodes in
fixed-size ROUNDS instead. One round = `round_tokens` batched-decode-
megakernel steps in ONE jitted dispatch (compiled once for the pool
shape); between rounds the batch re-opens — finished slots (EOS or
token budget) retire and deliver, queued requests prefill into the
free slots, and the next round launches. Admission latency is bounded
by one round (round_tokens x ~1-2 ms/step), dead-slot waste by
round_tokens - 1 steps, and the while-loop stays on device.

State split: the KV cache pool lives on device and is DONATED through
every round/insert (XLA updates it in place — no pool-sized copies);
the per-slot bookkeeping (current token, cache position, live flag)
is host-side numpy, re-uploaded each round (a few bytes), so retiring
and admitting slots never touches device state beyond the newcomer's
own slab.

No reference counterpart (main.cpp is single-utterance); the batched
kernel contract is ops/megakernel_batch.py::mega_decode_step_batch
(per-sequence positions make the slot pool possible).
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.config import DecoderConfig
from qwen3_asr_tpu.models.generate import prefill_batch_mega_cache
from qwen3_asr_tpu.pipeline.asr import (
    TranscribeResult,
    frontend_feats_batch,
)
from qwen3_asr_tpu.text import build_asr_prompt
from qwen3_asr_tpu.text.prompt import audio_start_pos


def _round_impl(
    dec_params: dict,
    k_cache: jax.Array,   # [B, L, S, DKV] int8
    v_cache: jax.Array,
    k_scale: jax.Array,   # [B, L, NKV, S] f32 (resident layout)
    v_scale: jax.Array,
    cur: jax.Array,       # [B] int32 — token each live slot feeds next
    pos: jax.Array,       # [B] int32 — cache row cur's KV lands in
    live: jax.Array,      # [B] bool — False: slot is empty/retired (its
                          # lane still computes, outputs are masked)
    cfg: DecoderConfig,
    n_steps: int,
    interpret: bool = False,
    kv_stream: bool = False,
):
    """One decode round: n_steps batched megakernel steps. Returns
    (out [B, n_steps] int32 with -1 in dead lanes, cur, pos, live,
    caches...). A lane that emits EOS mid-round records the EOS token,
    then freezes (its pos stops advancing so the lane keeps overwriting
    one scratch row). Unjitted body shared by the single-device round
    and the dp shard_map round."""
    from qwen3_asr_tpu.ops.megakernel_batch import mega_decode_step_batch

    B = cur.shape[0]
    out0 = jnp.full((B, n_steps), -1, jnp.int32)

    def body(i, st):
        cur, pos, live, kq, vq, ks, vs, out = st
        x = jnp.take(dec_params["token_embd"], cur, axis=0)
        nxt, kq, vq, ks, vs, _ = mega_decode_step_batch(
            dec_params["mega"], cfg, x, pos, kq, vq, ks, vs,
            interpret=interpret, kv_stream=kv_stream)
        nxt = jnp.where(live, nxt, cur)
        out = out.at[:, i].set(jnp.where(live, nxt, -1))
        pos = jnp.where(live, pos + 1, pos)
        live = live & (nxt != cfg.eos_token_id)
        return nxt, pos, live, kq, vq, ks, vs, out

    cur, pos, live, k_cache, v_cache, k_scale, v_scale, out = (
        jax.lax.fori_loop(
            0, n_steps, body,
            (cur, pos, live, k_cache, v_cache, k_scale, v_scale, out0)))
    return out, cur, pos, live, k_cache, v_cache, k_scale, v_scale


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "interpret", "kv_stream"),
    donate_argnums=(1, 2, 3, 4),
)
def _decode_round(dec_params, k_cache, v_cache, k_scale, v_scale,
                  cur, pos, live, cfg, n_steps,
                  interpret=False, kv_stream=False):
    """Single-device decode round (see _round_impl; caches donated)."""
    return _round_impl(dec_params, k_cache, v_cache, k_scale, v_scale,
                       cur, pos, live, cfg, n_steps, interpret, kv_stream)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "mesh", "interpret", "kv_stream"),
    donate_argnums=(1, 2, 3, 4),
)
def _decode_round_dp(dec_params, k_cache, v_cache, k_scale, v_scale,
                     cur, pos, live, cfg, n_steps, mesh,
                     interpret=False, kv_stream=False):
    """dp-sharded decode round: the slot pool's batch axis splits over
    the mesh's 'dp' axis via shard_map — each chip runs the SAME chunked
    megakernel loop on its local pool shard with the replicated weight
    stream, zero collectives (decode is communication-free across
    sequences). The pool size must divide dp; weights enter P()
    (replicated). check_vma off: the kernel's manual DMAs carry no
    varying-manual-axes info (same setting as parallel/mesh.py's
    dp megakernel)."""
    from jax.sharding import PartitionSpec as P

    f = functools.partial(_round_impl, cfg=cfg, n_steps=n_steps,
                          interpret=interpret, kv_stream=kv_stream)
    return jax.shard_map(
        lambda dec, kq, vq, ks, vs, c, p, lv: f(dec, kq, vq, ks, vs,
                                                c, p, lv),
        mesh=mesh,
        in_specs=(P(), P("dp"), P("dp"), P("dp"), P("dp"),
                  P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp"),) * 8,
        check_vma=False,
    )(dec_params, k_cache, v_cache, k_scale, v_scale, cur, pos, live)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _insert_slots(
    k_cache: jax.Array,   # pool [B, L, S, DKV] int8 (donated)
    v_cache: jax.Array,
    k_scale: jax.Array,
    v_scale: jax.Array,
    new_kq: jax.Array,    # newcomers [b, L, S, DKV]
    new_vq: jax.Array,
    new_ks: jax.Array,
    new_vs: jax.Array,
    idx: jax.Array,       # [b] int32 slot indices
):
    """Scatter freshly prefilled slabs into the pool (in place via
    donation). Whole-slab replacement: no stale rows from the slot's
    previous occupant can survive, so position gating is the only
    correctness condition the kernel needs."""
    return (k_cache.at[idx].set(new_kq), v_cache.at[idx].set(new_vq),
            k_scale.at[idx].set(new_ks), v_scale.at[idx].set(new_vs))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "audio_offset", "cache_len", "kv_stream"),
)
def _prefill_slab(dec_params, cfg, tokens, n_prompt, audio, n_audio,
                  audio_offset, cache_len, kv_stream=False):
    """Batched prefill of newcomers into pool-sized cache slabs
    (generate.py::prefill_batch_mega_cache jitted standalone with the
    pool's S so the slabs insert shape-exactly)."""
    return prefill_batch_mega_cache(
        dec_params, cfg, tokens, n_prompt, audio, n_audio, audio_offset,
        cache_len, kv_stream=kv_stream)


@dataclasses.dataclass
class _Slot:
    """One occupied pool lane."""
    ticket: object               # caller's handle (request/future/...)
    tokens: list                 # emitted token ids (EOS excluded)
    max_tokens: int
    t_start: float
    finished: bool = False       # EOS seen or budget hit
    notified: int = 0            # tokens already reported via on_progress


class ContinuousEngine:
    """Slot-pool continuous batching over the batched decode megakernel.

    Drive it from ONE thread (the server worker): `admit()` newcomers
    into free slots, `run_round()` to decode; completed requests come
    back from run_round as (ticket, TranscribeResult). The engine owns
    no threads and no queues — scheduling policy (windows, fairness,
    what to do with ineligible requests) stays in the caller.

    Requirements: packed decode megakernel ('mega' in the decoder tree)
    and the int8 KV cache (the batched kernel's only mode). Requests
    whose bucketed prompt + max_tokens exceed the pool's context (see
    `eligible`) must go down the caller's closed-batch path.
    """

    def __init__(self, asr, pool: int = 8, round_tokens: int = 64,
                 max_tokens: int = 1024, prompt_bucket: int = 128,
                 mel_bucket: int = 800, s_pool: int | None = None,
                 kv_stream: bool = False, interpret: bool = False,
                 mesh=None):
        dec = asr.params["decoder"]
        if "mega" not in dec:
            raise ValueError("continuous engine needs the packed decode "
                             "megakernel (quantize int8pc/int4)")
        if asr._cache_dtype() != jnp.int8:
            raise ValueError("continuous engine needs the int8 KV cache "
                             "(the batched megakernel's only mode)")
        from qwen3_asr_tpu.ops.megakernel import KV_BLOCK
        from qwen3_asr_tpu.ops.megakernel_batch import (
            mega_batch_max_context,
            mega_batch_stream_max_batch,
        )

        self.asr = asr
        self.dcfg: DecoderConfig = dataclasses.replace(
            asr.cfg.decoder)  # engine is EOS-aware itself
        self.pool = int(pool)
        if not 1 <= self.pool <= 16:
            raise ValueError("pool must be 1..16 (batched kernel unroll)")
        self.round_tokens = int(round_tokens)
        self.max_tokens = int(max_tokens)
        self.prompt_bucket = int(prompt_bucket)
        self.mel_bucket = int(mel_bucket)
        self.kv_stream = bool(kv_stream)
        self.interpret = bool(interpret)
        # mesh: dp-shard the slot pool over a pure-dp jax.sharding.Mesh —
        # each chip decodes its local pool shard through the batched
        # megakernel under shard_map (zero collectives; weights
        # replicated). Bookkeeping/admission stay host-side and global.
        self.mesh = mesh
        if mesh is not None:
            if mesh.shape.get("tp", 1) != 1:
                raise ValueError("engine mesh must be pure-dp (tp == 1): "
                                 "the batched kernel's DMA ring has no "
                                 "cross-chip story")
            dp = mesh.shape.get("dp", 1)
            if self.pool % dp:
                raise ValueError(f"pool {self.pool} must divide the mesh's "
                                 f"dp={dp} (equal local pool shards)")
        # the engine's view of the decoder weights: replicated over the
        # mesh when dp-sharded (shard_map wants every operand on the
        # mesh's device set; prefill then also runs mesh-wide), otherwise
        # the pipeline's own (single-device) tree
        self._dec = asr.params["decoder"]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as Ps

            self._dec = jax.device_put(self._dec,
                                       NamedSharding(mesh, Ps()))
        align = KV_BLOCK if self.kv_stream else 128
        if self.kv_stream:
            # streamed-KV pool: VMEM is O(1) in context (the kernel folds
            # KV_BLOCK tiles through a ring), so S is bounded by HBM, not
            # VMEM — only the per-seq outputs bound the batch
            b_max = mega_batch_stream_max_batch(dec["mega"], self.dcfg)
            if self.pool > b_max and not interpret:
                raise ValueError(f"kv_stream pool {self.pool} exceeds the "
                                 f"streamed kernel's batch bound {b_max}")
            if s_pool is None:
                raise ValueError("kv_stream pools must size their context "
                                 "explicitly (s_pool) — the VMEM bound "
                                 "that sizes resident pools doesn't apply")
            s_max = int(s_pool)
        else:
            s_max = mega_batch_max_context(dec["mega"], self.dcfg,
                                           batch=self.pool)
        self.S = int(s_pool) if s_pool else s_max
        if self.S % align or self.S <= 0:
            raise ValueError(f"pool context must be a positive multiple "
                             f"of {align}, got {self.S}")
        if self.S > s_max and not interpret:
            raise ValueError(f"pool context {self.S} exceeds the batched "
                             f"kernel's VMEM budget ({s_max})")

        self._alloc_pool()
        B = self.pool
        self._cur = np.zeros(B, np.int32)
        self._pos = np.ones(B, np.int32)  # dead lanes scribble row 1
        self._slots: list = [None] * B
        # optional per-round progress hook: called on the driving thread
        # as on_progress(ticket, new_token_ids) after every round for each
        # slot that gained tokens (streaming deltas ride this — serve.py)
        self.on_progress = None
        # stats (serving observability)
        self.n_rounds = 0
        self.n_admitted = 0
        self.n_completed = 0
        self.busy_slot_steps = 0   # live-lane steps actually used
        self.total_slot_steps = 0  # pool lanes x steps run

    def _alloc_pool(self) -> None:
        """(Re)allocate the device-side KV cache pool (zeros)."""
        from qwen3_asr_tpu.ops.megakernel import KV_BLOCK

        L = self.dcfg.n_layers
        DKV = self.dcfg.n_kv_heads * self.dcfg.head_dim
        NKV = self.dcfg.n_kv_heads
        B, S = self.pool, self.S
        self._kq = jnp.zeros((B, L, S, DKV), jnp.int8)
        self._vq = jnp.zeros((B, L, S, DKV), jnp.int8)
        if self.kv_stream:  # block-major scales [B, L, NB, NKV, KVB]
            sshape = (B, L, S // KV_BLOCK, NKV, KV_BLOCK)
            self._ks = jnp.zeros(sshape, jnp.float32)
            self._vs = jnp.zeros(sshape, jnp.float32)
        else:
            self._ks = jnp.zeros((B, L, NKV, S), jnp.float32)
            self._vs = jnp.zeros((B, L, NKV, S), jnp.float32)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = lambda a: jax.device_put(
                a, NamedSharding(self.mesh, P(*(("dp",) + (None,) *
                                                (a.ndim - 1)))))
            self._kq, self._vq = shard(self._kq), shard(self._vq)
            self._ks, self._vs = shard(self._ks), shard(self._vs)

    # -- capacity ---------------------------------------------------------

    def free_slots(self) -> list[int]:
        return [i for i, s in enumerate(self._slots) if s is None]

    def n_active(self) -> int:
        return sum(s is not None for s in self._slots)

    def eligible(self, n_samples: int,
                 max_tokens: int | None = None) -> bool:
        """Whether an utterance of n_samples 16 kHz samples fits a pool
        slot: bucketed prompt + its token budget within the pool's S."""
        from qwen3_asr_tpu.audio.mel import num_mel_frames
        from qwen3_asr_tpu.text.timestamps import (
            get_feat_extract_output_lengths,
        )

        n_audio = get_feat_extract_output_lengths(
            num_mel_frames(int(n_samples)))
        n_prompt = len(build_asr_prompt(n_audio, self.dcfg))
        P = -(-n_prompt // self.prompt_bucket) * self.prompt_bucket
        return P + (max_tokens or self.max_tokens) <= self.S

    # -- admission --------------------------------------------------------

    def admit(self, tickets: list, samples: list) -> None:
        """Prefill `samples[i]` (int16/float32 16 kHz numpy) into free
        slots, one per ticket. Caller guarantees len(tickets) <=
        len(free_slots()) and eligibility. One batched frontend dispatch
        per mel bucket + one batched prefill per (count-bucket, prompt-
        bucket) shape."""
        if not tickets:
            return
        free = self.free_slots()
        assert len(tickets) <= len(free), "admit() overflows the pool"
        dcfg = self.dcfg
        feats = frontend_feats_batch(self.asr, list(samples),
                                     self.mel_bucket)

        prompts = [build_asr_prompt(f[1], dcfg) for f in feats]
        offset = audio_start_pos(prompts[0], dcfg)
        P = max(-(-len(p) // self.prompt_bucket) * self.prompt_bucket
                for p in prompts)
        if P >= self.S:
            raise ValueError(
                f"admit(): bucketed prompt {P} does not fit the pool "
                f"context {self.S} — caller must gate on eligible()")
        b_real = len(tickets)
        b = 1 << (b_real - 1).bit_length()  # pad count to a power of two
        toks = np.full((b, P), dcfg.pad_token_id, np.int32)
        n_prompt = np.ones(b, np.int32)
        n_audio = np.zeros(b, np.int32)
        audio_pad = jnp.zeros((b, P, dcfg.hidden_size), self.asr.dtype)
        for j, (f, p) in enumerate(zip(feats, prompts)):
            toks[j, : len(p)] = p
            n_prompt[j] = len(p)
            n_audio[j] = f[1]
            # mel-bucket padding can out-run the prompt bucket; the splice
            # reads only the first n_audio (< P) rows, so clip the pad tail
            rows = min(int(f[0].shape[0]), P)
            audio_pad = audio_pad.at[j, :rows].set(
                f[0][:rows].astype(self.asr.dtype))

        toks_d, n_prompt_d, audio_d, n_audio_d = (
            jnp.asarray(toks), jnp.asarray(n_prompt), audio_pad,
            jnp.asarray(n_audio))
        if self.mesh is not None:
            # a dp-sharded pool runs admission mesh-wide too: replicate
            # the prefill inputs so every operand shares the mesh's
            # device set (admission is rare and the newcomer count
            # small — replication cost is negligible vs decode rounds)
            from jax.sharding import NamedSharding, PartitionSpec as Ps

            rep = NamedSharding(self.mesh, Ps())
            toks_d, n_prompt_d, audio_d, n_audio_d = (
                jax.device_put(x, rep)
                for x in (toks_d, n_prompt_d, audio_d, n_audio_d))
        first, kq, vq, ks, vs = _prefill_slab(
            self._dec, dcfg, toks_d, n_prompt_d, audio_d, n_audio_d,
            offset, self.S, kv_stream=self.kv_stream)
        first = np.asarray(first)

        idx = np.asarray(free[:b_real], np.int32)
        idx_d = jnp.asarray(idx)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as Ps

            idx_d = jax.device_put(idx_d, NamedSharding(self.mesh, Ps()))
        self._kq, self._vq, self._ks, self._vs = _insert_slots(
            self._kq, self._vq, self._ks, self._vs,
            kq[:b_real], vq[:b_real], ks[:b_real], vs[:b_real], idx_d)
        now = time.perf_counter()
        for j, ticket in enumerate(tickets):
            slot = int(idx[j])
            tok0 = int(first[j])
            s = _Slot(ticket=ticket, tokens=[], max_tokens=self.max_tokens,
                      t_start=now)
            if tok0 == dcfg.eos_token_id:
                s.finished = True     # degenerate: empty transcript
            else:
                s.tokens.append(tok0)
                s.finished = s.max_tokens <= 1
            self._slots[slot] = s
            self._cur[slot] = tok0
            self._pos[slot] = int(n_prompt[j])
            self.n_admitted += 1

    # -- decode -----------------------------------------------------------

    def run_round(self) -> list:
        """One decode round over the pool. Returns completed requests as
        [(ticket, TranscribeResult), ...]; their slots are free again."""
        live_mask = np.array(
            [s is not None and not s.finished for s in self._slots])
        done: list = []
        if live_mask.any():
            if self.mesh is not None:
                out, cur, pos, _, self._kq, self._vq, self._ks, self._vs = (
                    _decode_round_dp(
                        self._dec, self._kq, self._vq,
                        self._ks, self._vs, jnp.asarray(self._cur),
                        jnp.asarray(self._pos), jnp.asarray(live_mask),
                        self.dcfg, self.round_tokens, self.mesh,
                        interpret=self.interpret,
                        kv_stream=self.kv_stream))
            else:
                out, cur, pos, _, self._kq, self._vq, self._ks, self._vs = (
                    _decode_round(
                        self._dec, self._kq, self._vq,
                        self._ks, self._vs, jnp.asarray(self._cur),
                        jnp.asarray(self._pos), jnp.asarray(live_mask),
                        self.dcfg, self.round_tokens,
                        interpret=self.interpret,
                        kv_stream=self.kv_stream))
            out, cur, pos = jax.device_get((out, cur, pos))
            # device_get hands back read-only views; admission writes
            # per-slot entries, so keep mutable host copies
            self._cur = np.array(cur)
            self._pos = np.array(pos)
            self.n_rounds += 1
            self.total_slot_steps += self.pool * self.round_tokens
            eos = self.dcfg.eos_token_id
            for i, slot in enumerate(self._slots):
                if slot is None or slot.finished:
                    continue
                for t in out[i]:
                    t = int(t)
                    self.busy_slot_steps += 1
                    if t == eos:
                        slot.finished = True
                        break
                    slot.tokens.append(t)
                    if len(slot.tokens) >= slot.max_tokens:
                        slot.finished = True
                        break

        if self.on_progress is not None:
            # token-level progress (before the completion scan frees
            # slots): covers tokens from this round AND the admit-time
            # first token of slots that never saw a live round. A raising
            # callback must not escape run_round — the serving worker's
            # except path calls fail_active() and would evict EVERY
            # active slot over one bad streaming consumer.
            for slot in self._slots:
                if slot is None or len(slot.tokens) <= slot.notified:
                    continue
                try:
                    self.on_progress(slot.ticket,
                                     slot.tokens[slot.notified:])
                except Exception as e:  # noqa: BLE001 — log and continue
                    import sys as _sys

                    print(f"engine: on_progress callback raised {e!r} "
                          "(ignored)", file=_sys.stderr, flush=True)
                slot.notified = len(slot.tokens)

        for i, slot in enumerate(self._slots):
            if slot is None or not slot.finished:
                continue
            r = TranscribeResult()
            r.tokens = list(slot.tokens)
            r.text = self.asr.tokenizer.decode(r.tokens)
            r.success = True
            r.t_total_ms = (time.perf_counter() - slot.t_start) * 1e3
            done.append((slot.ticket, r))
            self._slots[i] = None
            self.n_completed += 1
        return done

    def fail_active(self, exc: Exception) -> list:
        """Evict every occupied slot after a decode failure: returns
        [(ticket, exc), ...] so the caller can fail their futures. The
        pool caches are REALLOCATED — a failed donated round may have
        invalidated the old buffers — and bookkeeping resets so the next
        arrivals start clean."""
        out = []
        for i, slot in enumerate(self._slots):
            if slot is not None:
                out.append((slot.ticket, exc))
                self._slots[i] = None
        self._cur[:] = 0
        self._pos[:] = 1
        self._alloc_pool()
        return out

    def stats(self) -> dict:
        return {
            "pool": self.pool,
            "context": self.S,
            "kv_stream": self.kv_stream,
            "round_tokens": self.round_tokens,
            "rounds": self.n_rounds,
            "admitted": self.n_admitted,
            "completed": self.n_completed,
            "active": self.n_active(),
            "slot_utilization": round(
                self.busy_slot_steps / max(self.total_slot_steps, 1), 3),
        }
