"""Continuous-batching LLM decode engine — the TPU-native vLLM replacement.

Role of vLLM in the reference serving stack (FunASR ``funasr/models/fun_asr_nano/
inference_vllm.py``, ``auto/auto_model_vllm.py``): admit prompt-embedding requests,
batch the decode loop, stream tokens out.

Design for XLA: a fixed pool of B slots sharing pre-allocated (B, cache_len) kv
caches. The decode step advances ALL active slots one token per call — a single
fixed-shape program, so new requests join between steps with zero recompilation
(the continuous-batching property). Two vLLM properties are provided in
TPU-idiomatic form:

* **Chunked prefill** (vLLM's answer to head-of-line blocking): admission does
  NOT run the whole prompt in one pass. Prompts prefill in ``prefill_chunk``-
  sized slices, at most one slice per engine step, interleaved with the batch
  decode — so a 2k-token prompt admitting never stalls in-flight decodes for
  more than one chunk's forward.
* **Occupancy-proportional KV memory** (vLLM's paged KV role): the cache
  starts at ``init_cache_len`` and doubles (power-of-two buckets, bounded
  recompiles) only when a live sequence needs it. On TPU a contiguous
  (B, S) cache layout keeps the attention fusable by XLA — a block-table
  gather per step would fight the compiler for no memory win beyond this
  length bucketing, since HBM is reclaimed at the bucket level anyway.
* **Prefix caching** (vLLM's automatic-prefix-cache role): requests carry
  ``prefix_len`` marking a shared leading span (the ChatML system+user
  prefix every ASR request repeats). On the first sight of a prefix the
  engine snapshots its KV rows (K/V are per-position projections, so the
  rows are reusable bit-exactly); later requests with the same prefix skip
  straight to prefilling their unique tail.

Sampling is seeded: engine ``seed`` + ``request_id`` derive a per-request
generator, so temperature sampling is reproducible run-to-run.
"""

from __future__ import annotations

import collections
import dataclasses
import hashlib
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.utils.bucket import bucket_length

_EOS_PAD = 8  # fixed eos-id column width in the multi-step decode program


@dataclasses.dataclass
class Request:
    request_id: int
    input_embeds: Optional[np.ndarray] = None  # (T, D) prompt embeddings
    max_new_tokens: int = 256
    eos_token_ids: tuple = ()
    temperature: float = 0.0          # 0 = greedy
    prefix_len: int = 0               # leading rows shared across requests
    # device-resident prompt (submit_prompt_batch): row dev_row of a shared
    # (B, T, D) on-device buffer, prompt_len valid rows — the prompt never
    # round-trips through the host (the audio encoder's output feeds the LLM
    # directly, vLLM's prompt-embeds path)
    dev_buffer: Optional[object] = None
    dev_row: int = 0
    prompt_len: int = 0
    # filled by the engine:
    output_ids: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    stream_cb: Optional[Callable[[int], None]] = None
    _rng: Optional[np.random.Generator] = None
    _prefix_key: Optional[tuple] = None

    def __post_init__(self):
        if self.input_embeds is not None:
            self.prompt_len = int(self.input_embeds.shape[0])


class LLMEngine:
    def __init__(self, lm, params, num_slots: int = 8, max_len: int = 2048,
                 dtype=jnp.bfloat16, prefill_chunk: int = 128,
                 init_cache_len: int = 256, seed: int = 0):
        self.lm = lm
        self.params = params
        self.num_slots = num_slots
        self.max_len = max_len
        self.dtype = dtype
        self.prefill_chunk = max(32, int(prefill_chunk))
        self.seed = seed
        self.cache_len = 1
        while self.cache_len < min(init_cache_len, max_len):
            self.cache_len *= 2
        self.cache_len = min(self.cache_len, max_len)
        self.kv = lm.init_kv_cache(num_slots, self.cache_len, dtype)
        self.slot_req: List[Optional[Request]] = [None] * num_slots
        self.slot_len = np.zeros((num_slots,), np.int32)      # valid cache rows
        self.slot_new = np.zeros((num_slots,), np.int32)      # generated so far
        self.slot_prefill_pos = np.zeros((num_slots,), np.int32)
        self.last_token_embed = jnp.zeros((num_slots, 1, lm.cfg.hidden_size),
                                          dtype)
        self.queue: List[Request] = []
        self.n_cache_grows = 0
        # prefix cache: key -> (plen, [(k_rows, v_rows) per layer]) — LRU
        self.prefix_cache: collections.OrderedDict = collections.OrderedDict()
        self.prefix_cache_max = 16
        self.min_prefix_len = 8
        self.n_prefix_hits = 0
        self._prefill_jit = jax.jit(self._prefill, static_argnames=("t",),
                                    donate_argnums=(1,))
        self._prefill_dev_jit = jax.jit(self._prefill_dev,
                                        static_argnames=("t", "start"),
                                        donate_argnums=(1,))
        self._decode_jit = jax.jit(self._decode, donate_argnums=(1,))
        self._decode_multi_jit = jax.jit(self._decode_multi,
                                         static_argnames=("k",),
                                         donate_argnums=(1,))
        # device steps per host sync (see _decode_multi): each sync pays a
        # host<->device roundtrip, so at steady state the scan runs 32 greedy
        # steps per fetch — EOS/budget tracking lives inside the program, so
        # overshoot past a finished slot costs nothing but masked lanes
        self.decode_chunk = 32

    # -- jitted kernels ------------------------------------------------------

    def _prefill(self, params, kv, embeds, slots, starts, valids, t):
        """Prompt slices for S slots in ONE program: embeds (S, t, D) covers
        global positions starts[i]..starts[i]+t of each slot's sequence
        (valids[i] <= t real rows). Rows may repeat the same slot (shape
        padding): duplicate scatter indices write identical values, so the
        result is unchanged. Returns (kv, last-position logits (S, V), greedy
        first tokens (S,), their embeds (S, 1, D)) — the token fetch is a few
        bytes, so greedy admission never pulls the (S, V) logits to host.

        Only the LAST valid position of each slice goes through the vocab
        projection (lm.forward_hidden + gather, then lm.logits_head on a
        (S, 1, D) row): the 150k-vocab matmul over a whole (S, t, D) chunk
        would cost ~t x the needed FLOPs and materialize a GB-scale f32
        logits tensor."""
        positions = starts[:, None] + jnp.arange(t)[None]
        sub_kv = [{"k": c["k"][slots], "v": c["v"][slots]} for c in kv]
        x, sub_kv = self.lm.forward_hidden(params, embeds, positions, sub_kv,
                                           starts, starts + valids)
        for c, s in zip(kv, sub_kv):
            c["k"] = c["k"].at[slots].set(s["k"])
            c["v"] = c["v"].at[slots].set(s["v"])
        idx = (valids - 1)[:, None, None]
        last_x = jnp.take_along_axis(
            x, idx.repeat(x.shape[-1], -1), axis=1)
        last = self.lm.logits_head(params, last_x)[:, 0]
        first_tok = jnp.argmax(last, -1).astype(jnp.int32)
        first_emb = self.lm.embed(params, first_tok[:, None], self.dtype)
        return kv, last, first_tok, first_emb

    def _prefill_dev(self, params, kv, buffer, rows, slots, starts, valids,
                     t, start):
        """:meth:`_prefill` fed from a shared DEVICE prompt buffer: rows
        ``rows`` of ``buffer`` (B, T, D), slice [start, start+t). The slice +
        gather happen inside the program, so prompt embeds never leave the
        device (the host-numpy assembly path costs a device->host fetch plus
        a re-upload per prompt — on a tunneled chip that dwarfs the prefill
        compute itself). ``start`` is static: chunk starts are multiples of
        prefill_chunk, so the compile count stays max_len/prefill_chunk."""
        chunk = jax.lax.dynamic_slice_in_dim(buffer, start, t, axis=1)
        embeds = chunk[rows].astype(self.dtype)
        return self._prefill(params, kv, embeds, slots, starts, valids, t)

    def _decode(self, params, kv, token_embeds, slot_lens):
        """One step for all slots. token_embeds: (B, 1, D); slot_lens: (B,)
        current cache lengths; returns (new kv, next logits (B, V)). Inactive
        and still-prefilling slots produce garbage rows that are either
        ignored (free slots restart prefill at 0) or overwritten by the next
        prefill slice (which covers position slot_len)."""
        positions = slot_lens[:, None]
        logits, kv = self.lm.forward(params, token_embeds, positions, kv,
                                     slot_lens, slot_lens + 1)
        return kv, logits[:, 0]

    def _decode_multi(self, params, kv, token_embeds, slot_lens, active,
                      eos_ids, remaining, k):
        """``k`` GREEDY decode steps fully on-device between host syncs, with
        EOS and budget tracking inside the program.

        Fetching the (B, V) logits to host every token costs ~10 MB + a
        roundtrip per step; argmax'ing on-device and syncing every k steps
        fetches (B, k) int32 instead — the host loop then only does slot
        bookkeeping. vLLM keeps its sampler on-GPU for the same reason.
        temperature>0 requests never take this path (step() routes them
        through the host-rng logits path), so no sampling code runs here.

        token_embeds: (B, 1, D) embeds of each slot's last token;
        active: (B,) bool; eos_ids: (B, E) int32 padded with -2;
        remaining: (B,) token budgets. Returns (kv, tokens (B, k) int32
        [-1 where not generated], last embeds, lens, active, remaining).
        Finished/inactive slots stop advancing, so their cache writes stay
        at a position the next prefill overwrites — same garbage-row
        contract as ``_decode``."""

        def body(carry, _):
            kv, embeds, lens, act, rem = carry
            logits, kv = self.lm.forward(params, embeds, lens[:, None], kv,
                                         lens, lens + 1)
            tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            tok = jnp.where(act, tok, -1)
            hit_eos = jnp.any(tok[:, None] == eos_ids, axis=1)
            rem2 = rem - act.astype(jnp.int32)
            new_act = act & ~hit_eos & (rem2 > 0)
            lens = lens + act.astype(jnp.int32)
            next_emb = self.lm.embed(params, jnp.maximum(tok, 0)[:, None],
                                     self.dtype)
            embeds = jnp.where(act[:, None, None], next_emb, embeds)
            return (kv, embeds, lens, new_act, rem2), tok

        (kv, embeds, lens, act, rem), toks = jax.lax.scan(
            body, (kv, token_embeds, slot_lens, active, remaining), None,
            length=k)
        return kv, toks.T, embeds, lens, act, rem

    # -- cache growth ----------------------------------------------------------

    def _ensure_capacity(self, needed: int):
        needed = min(needed, self.max_len)
        if needed <= self.cache_len:
            return
        new_len = self.cache_len
        while new_len < needed:
            new_len *= 2
        new_len = min(new_len, self.max_len)
        old = self.cache_len
        self.kv = [
            {k: jnp.zeros(v.shape[:1] + (new_len,) + v.shape[2:], v.dtype)
                .at[:, :old].set(v) for k, v in c.items()}
            for c in self.kv
        ]
        self.cache_len = new_len
        self.n_cache_grows += 1

    # -- host loop -----------------------------------------------------------

    def submit(self, req: Request):
        self.queue.append(req)

    def submit_prompt_batch(self, embeds, lens, max_new_tokens: int = 256,
                            eos_token_ids: tuple = (),
                            request_ids: Optional[List[int]] = None,
                            stream_cbs: Optional[List] = None
                            ) -> List[Request]:
        """Submit a batch of prompts that LIVE ON DEVICE: ``embeds`` is a
        (B, T, D) jax array (e.g. the audio encoder's output), ``lens`` the
        per-row valid prompt lengths. The prompts are prefilled by in-program
        slicing of the shared buffer (:meth:`_prefill_dev`) — zero
        host<->device prompt traffic, the TPU twin of vLLM's on-GPU
        prompt-embeds handoff (reference ``inference_vllm.py`` passes
        prompt_embeds GPU-side). Greedy-only (on-device sampling path)."""
        lens = np.asarray(lens)
        b, t = int(embeds.shape[0]), int(embeds.shape[1])
        pad = -t % self.prefill_chunk
        if pad:  # _prefill_dev slices [start, start+tb) — keep it in bounds
            embeds = jnp.pad(embeds, ((0, 0), (0, pad), (0, 0)))
        reqs = []
        for i in range(b):
            req = Request(
                request_id=(request_ids[i] if request_ids else i),
                dev_buffer=embeds, dev_row=i,
                prompt_len=int(min(lens[i], self.max_len - 1)),
                max_new_tokens=max_new_tokens, eos_token_ids=eos_token_ids,
                stream_cb=stream_cbs[i] if stream_cbs else None)
            reqs.append(req)
            self.submit(req)
        return reqs

    def _prefix_key(self, req: Request) -> Optional[tuple]:
        if req.input_embeds is None:
            return None  # device-resident prompt: bytes never reach the host
        plen = int(req.prefix_len)
        if plen < self.min_prefix_len or plen >= req.input_embeds.shape[0]:
            return None
        if req._prefix_key is None:
            digest = hashlib.blake2b(
                np.ascontiguousarray(req.input_embeds[:plen]).tobytes(),
                digest_size=16).hexdigest()
            req._prefix_key = (plen, digest)
        return req._prefix_key

    def _admit(self):
        """Assign queued requests to free slots (bookkeeping only — the prompt
        prefills chunk-by-chunk in subsequent steps). A prefix-cache hit seeds
        the slot's KV rows and skips the shared span entirely."""
        for slot in range(self.num_slots):
            if self.slot_req[slot] is None and self.queue:
                req = self.queue.pop(0)
                if req.prompt_len >= self.max_len:
                    req.prompt_len = self.max_len - 1
                    if req.input_embeds is not None:
                        req.input_embeds = req.input_embeds[: self.max_len - 1]
                self.slot_req[slot] = req
                self.slot_len[slot] = 0
                self.slot_new[slot] = 0
                self.slot_prefill_pos[slot] = 0
                key = self._prefix_key(req)
                if key is not None and key in self.prefix_cache:
                    plen, rows = self.prefix_cache[key]
                    self.prefix_cache.move_to_end(key)
                    self._ensure_capacity(plen + 1)
                    for c, (k_rows, v_rows) in zip(self.kv, rows):
                        c["k"] = c["k"].at[slot, :plen].set(k_rows)
                        c["v"] = c["v"].at[slot, :plen].set(v_rows)
                    self.slot_prefill_pos[slot] = plen
                    self.slot_len[slot] = plen
                    self.n_prefix_hits += 1

    def _maybe_store_prefix(self, slot: int, prev_pos: int):
        """On the chunk that crossed ``prefix_len``, snapshot rows 0..plen of
        the slot's KV (correct up to slot_prefill_pos after every chunk)."""
        req = self.slot_req[slot]
        key = self._prefix_key(req)
        if key is None or key in self.prefix_cache:
            return
        plen = key[0]
        if not (prev_pos < plen <= int(self.slot_prefill_pos[slot])):
            return
        rows = [(c["k"][slot, :plen], c["v"][slot, :plen]) for c in self.kv]
        self.prefix_cache[key] = (plen, rows)
        if len(self.prefix_cache) > self.prefix_cache_max:
            self.prefix_cache.popitem(last=False)

    def _prefilling_slots(self) -> List[int]:
        return [i for i, r in enumerate(self.slot_req)
                if r is not None and self.slot_prefill_pos[i] < r.prompt_len]

    def _prefill_one_chunk(self):
        """Advance EVERY prefilling slot by one chunk, batched into one
        program per chunk-size bucket. Throughput-over-latency tradeoff: a
        fleet of fresh prompts admits in O(chunks), not O(slots x chunks),
        dispatches, but the per-step prefill batch spans up to num_slots
        rows — in-flight decode streams stall for one BATCHED chunk forward
        during an admission burst, not a single-slot one."""
        slots = self._prefilling_slots()
        if not slots:
            return
        # group by padded chunk length so each group is one fixed-shape call;
        # device-resident prompts additionally group by their shared buffer +
        # chunk start (the slice index is static in _prefill_dev)
        groups = {}
        for slot in slots:
            req = self.slot_req[slot]
            start = int(self.slot_prefill_pos[slot])
            valid = min(self.prefill_chunk, req.prompt_len - start)
            tb = bucket_length(valid, minimum=32, multiple=32)
            # never let the padded slice spill past max_len: the kv scatter
            # wraps modulo cache length and would overwrite the prompt's own
            # rows 0..31 (prompts are truncated to max_len-1, so valid fits)
            tb = min(tb, self.max_len - start)
            if req.dev_buffer is not None:
                key = (tb, id(req.dev_buffer), start)
            else:
                key = (tb, None, None)
            groups.setdefault(key, []).append((slot, start, valid))
        for (tb, buf_id, _), entries in groups.items():
            self._ensure_capacity(
                max(start + tb for _, start, _ in entries) + 1)
            # pad the slot axis to a power-of-two bucket by REPEATING entry 0
            # (duplicate scatter rows write identical values — harmless) so
            # compile count stays log2(num_slots) per tb
            s = 1
            while s < len(entries):
                s *= 2
            padded = entries + [entries[0]] * (s - len(entries))
            slots_arr = jnp.asarray([e[0] for e in padded], jnp.int32)
            starts_arr = jnp.asarray([e[1] for e in padded], jnp.int32)
            valids_arr = jnp.asarray([e[2] for e in padded], jnp.int32)
            if buf_id is not None:
                buffer = self.slot_req[padded[0][0]].dev_buffer
                # tb may exceed a short buffer's padded T on the final chunk —
                # the slice is clamped to the buffer, extra rows are masked
                # by valids
                t_eff = min(tb, buffer.shape[1] - padded[0][1])
                rows = jnp.asarray(
                    [self.slot_req[e[0]].dev_row for e in padded], jnp.int32)
                self.kv, last_logits, first_toks, first_embs = \
                    self._prefill_dev_jit(
                        self.params, self.kv, buffer, rows, slots_arr,
                        starts_arr, valids_arr, t=t_eff, start=padded[0][1])
            else:
                dim = self.slot_req[padded[0][0]].input_embeds.shape[1]
                embeds = np.zeros((s, tb, dim), np.float32)
                for i, (slot, start, valid) in enumerate(padded):
                    req = self.slot_req[slot]
                    embeds[i, :valid] = req.input_embeds[start: start + valid]
                self.kv, last_logits, first_toks, first_embs = \
                    self._prefill_jit(
                        self.params, self.kv, jnp.asarray(embeds, self.dtype),
                        slots_arr, starts_arr, valids_arr, t=tb)
            finals = []
            for i, (slot, start, valid) in enumerate(entries):
                req = self.slot_req[slot]
                self.slot_prefill_pos[slot] = start + valid
                self.slot_len[slot] = start + valid
                self._maybe_store_prefix(slot, start)
                if start + valid >= req.prompt_len:
                    finals.append((i, slot))
            if not finals:
                continue
            greedy = all((self.slot_req[slot].temperature or 0.0) == 0.0
                         for _, slot in finals)
            toks_np = np.asarray(first_toks) if greedy else None
            rows = None if greedy else np.asarray(last_logits)
            set_slots, set_embeds = [], []
            for i, slot in finals:  # final slice: emit the first token
                req = self.slot_req[slot]
                if greedy:
                    tok = int(toks_np[i])
                else:
                    tok = self._sample(rows[i], req)
                req.output_ids.append(tok)
                if req.stream_cb:
                    req.stream_cb(tok)
                self.slot_new[slot] = 1
                if greedy:
                    set_slots.append(i)
                else:
                    self.last_token_embed = self.last_token_embed.at[slot].set(
                        self.lm.embed(self.params, jnp.asarray([tok]),
                                      self.dtype))
                if tok in req.eos_token_ids or req.max_new_tokens <= 1:
                    self._finish(slot)
            if set_slots:
                idx = jnp.asarray([entries[i][0] for i in set_slots])
                self.last_token_embed = self.last_token_embed.at[idx].set(
                    first_embs[jnp.asarray(set_slots)])

    def _sample(self, logits, req: Request) -> int:
        if req.temperature and req.temperature > 0:
            if req._rng is None:
                req._rng = np.random.default_rng(
                    np.random.SeedSequence([self.seed, req.request_id]))
            x = (logits - logits.max()) / req.temperature
            probs = np.exp(x)
            probs /= probs.sum()
            return int(req._rng.choice(len(probs), p=probs))
        return int(np.argmax(logits))

    def _finish(self, slot: int):
        req = self.slot_req[slot]
        req.done = True
        self.slot_req[slot] = None
        self.slot_len[slot] = 0
        self.slot_new[slot] = 0
        self.slot_prefill_pos[slot] = 0

    def step(self) -> bool:
        """Admit + one prefill slice + one decode step for all active slots.
        Returns True while anything is in flight."""
        self._admit()
        self._prefill_one_chunk()
        prefilling = set(self._prefilling_slots())
        active_slots = [i for i, r in enumerate(self.slot_req)
                        if r is not None and i not in prefilling
                        and self.slot_new[i] > 0]
        if not active_slots:
            return bool(self.queue) or bool(prefilling) or any(
                r is not None for r in self.slot_req)
        # greedy batches sample ON-DEVICE (fetching (B, V) logits per token
        # costs ~10 MB + a roundtrip; fetching (B, k) int32 doesn't): k=1
        # while something wants to interleave (queued admission, a prefill
        # slice in flight, per-token stream callbacks), k=decode_chunk device
        # steps per host sync at steady state. temperature>0 keeps the
        # host-rng logits path so seeded sampling stays reproducible.
        if all((self.slot_req[s].temperature or 0.0) == 0.0
               and len(self.slot_req[s].eos_token_ids) <= _EOS_PAD
               for s in active_slots):
            interleave = (bool(self.queue) or bool(prefilling)
                          or any(self.slot_req[s].stream_cb is not None
                                 for s in active_slots))
            k = 1 if interleave else self.decode_chunk
            return self._step_multi(active_slots, k)
        self._ensure_capacity(int(self.slot_len[active_slots].max()) + 2)
        self.kv, logits = self._decode_jit(
            self.params, self.kv, self.last_token_embed,
            jnp.asarray(self.slot_len))
        logits_np = np.asarray(logits)
        new_embeds = np.zeros((self.num_slots,), np.int64)
        for slot in active_slots:
            req = self.slot_req[slot]
            tok = self._sample(logits_np[slot], req)
            req.output_ids.append(tok)
            if req.stream_cb:
                req.stream_cb(tok)
            self.slot_len[slot] += 1
            self.slot_new[slot] += 1
            new_embeds[slot] = tok
            if tok in req.eos_token_ids or self.slot_new[slot] >= req.max_new_tokens \
                    or self.slot_len[slot] >= self.max_len - 1:
                self._finish(slot)
        self.last_token_embed = self.lm.embed(
            self.params, jnp.asarray(new_embeds)[:, None], self.dtype)
        return True

    def _step_multi(self, active_slots, k: int) -> bool:
        """k on-device decode steps + one host sync (see _decode_multi)."""
        self._ensure_capacity(int(self.slot_len[active_slots].max()) + k + 1)
        b = self.num_slots
        active = np.zeros((b,), bool)
        remaining = np.zeros((b,), np.int32)
        eos_ids = np.full((b, _EOS_PAD), -2, np.int32)
        for s in active_slots:
            req = self.slot_req[s]
            active[s] = True
            remaining[s] = max(1, min(req.max_new_tokens - self.slot_new[s],
                                      self.max_len - 1 - self.slot_len[s]))
            for j, e in enumerate(req.eos_token_ids):
                eos_ids[s, j] = e
        self.kv, toks, embeds, _, _, _ = self._decode_multi_jit(
            self.params, self.kv, self.last_token_embed,
            jnp.asarray(self.slot_len), jnp.asarray(active),
            jnp.asarray(eos_ids), jnp.asarray(remaining), k=k)
        toks = np.asarray(toks)  # (B, k) — the only per-chunk fetch
        self.last_token_embed = embeds
        for s in active_slots:
            req = self.slot_req[s]
            for t in toks[s]:
                tok = int(t)
                if tok < 0:
                    break
                req.output_ids.append(tok)
                if req.stream_cb:
                    req.stream_cb(tok)
                self.slot_len[s] += 1
                self.slot_new[s] += 1
                if (tok in req.eos_token_ids
                        or self.slot_new[s] >= req.max_new_tokens
                        or self.slot_len[s] >= self.max_len - 1):
                    self._finish(s)
                    break
        return True

    def generate(self, requests: List[Request]) -> List[Request]:
        """Blocking batch generate (continuous batching under the hood)."""
        for r in requests:
            self.submit(r)
        while any(not r.done for r in requests):
            if not self.step() and any(not r.done for r in requests):
                break
        return requests
