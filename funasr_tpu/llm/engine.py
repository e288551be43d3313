"""Continuous-batching LLM decode engine — the TPU-native vLLM replacement.

Role of vLLM in the reference serving stack (FunASR ``funasr/models/fun_asr_nano/
inference_vllm.py``, ``auto/auto_model_vllm.py``): admit prompt-embedding requests,
batch the decode loop, stream tokens out.

Design for XLA: a fixed pool of B slots sharing pre-allocated (B, max_len) kv caches.
Admission prefilleds one request into its slot (bucketed prompt lengths -> bounded
compile count); the decode step advances ALL active slots one token per call — a single
fixed-shape program, so new requests join between steps with zero recompilation
(the continuous-batching property).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.utils.bucket import bucket_length


@dataclasses.dataclass
class Request:
    request_id: int
    input_embeds: np.ndarray          # (T, D) prompt embeddings
    max_new_tokens: int = 256
    eos_token_ids: tuple = ()
    temperature: float = 0.0          # 0 = greedy
    # filled by the engine:
    output_ids: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    stream_cb: Optional[Callable[[int], None]] = None


class LLMEngine:
    def __init__(self, lm, params, num_slots: int = 8, max_len: int = 2048,
                 dtype=jnp.bfloat16):
        self.lm = lm
        self.params = params
        self.num_slots = num_slots
        self.max_len = max_len
        self.dtype = dtype
        self.kv = lm.init_kv_cache(num_slots, max_len, dtype)
        self.slot_req: List[Optional[Request]] = [None] * num_slots
        self.slot_len = np.zeros((num_slots,), np.int32)     # tokens in cache
        self.slot_new = np.zeros((num_slots,), np.int32)     # generated so far
        self.last_token_embed = jnp.zeros((num_slots, 1, lm.cfg.hidden_size), dtype)
        self.queue: List[Request] = []
        self._prefill_jit = jax.jit(self._prefill, static_argnames=("t",),
                                    donate_argnums=(1,))
        self._decode_jit = jax.jit(self._decode, donate_argnums=(1,))

    # -- jitted kernels ------------------------------------------------------

    def _prefill(self, params, kv, embeds, slot, prompt_len, t):
        """embeds: (1, t, D) padded prompt -> writes slot's cache, returns next-token
        logits for the last valid position."""
        positions = jnp.arange(t)[None]
        sub_kv = [{"k": c["k"][slot][None], "v": c["v"][slot][None]} for c in kv]
        logits, sub_kv = self.lm.forward(params, embeds, positions, sub_kv,
                                         jnp.zeros((1,), jnp.int32),
                                         prompt_len[None])
        for c, s in zip(kv, sub_kv):
            c["k"] = c["k"].at[slot].set(s["k"][0])
            c["v"] = c["v"].at[slot].set(s["v"][0])
        last = jnp.take_along_axis(
            logits, (prompt_len - 1)[None, None, None].repeat(logits.shape[-1], -1),
            axis=1)[0, 0]
        return kv, last

    def _decode(self, params, kv, token_embeds, slot_lens, active):
        """One step for all slots. token_embeds: (B, 1, D); slot_lens: (B,) current
        cache lengths; returns (next logits (B, V), new kv)."""
        positions = slot_lens[:, None]
        logits, kv = self.lm.forward(params, token_embeds, positions, kv,
                                     slot_lens, slot_lens + 1)
        return kv, logits[:, 0]

    # -- host loop -----------------------------------------------------------

    def submit(self, req: Request):
        self.queue.append(req)

    def _admit(self):
        for slot in range(self.num_slots):
            if self.slot_req[slot] is None and self.queue:
                req = self.queue.pop(0)
                t = req.input_embeds.shape[0]
                tb = bucket_length(t, minimum=32, multiple=32)
                embeds = np.zeros((1, tb, req.input_embeds.shape[1]), np.float32)
                embeds[0, :t] = req.input_embeds
                self.kv, last_logits = self._prefill_jit(
                    self.params, self.kv, jnp.asarray(embeds, self.dtype),
                    jnp.asarray(slot), jnp.asarray(t, jnp.int32), t=tb)
                tok = self._sample(np.asarray(last_logits), req)
                req.output_ids.append(tok)
                if req.stream_cb:
                    req.stream_cb(tok)
                self.slot_req[slot] = req
                self.slot_len[slot] = t
                self.slot_new[slot] = 1
                self.last_token_embed = self.last_token_embed.at[slot].set(
                    self.lm.embed(self.params, jnp.asarray([tok]),
                                  self.dtype))
                if tok in req.eos_token_ids or req.max_new_tokens <= 1:
                    self._finish(slot)

    def _sample(self, logits, req) -> int:
        if req.temperature and req.temperature > 0:
            probs = np.exp((logits - logits.max()) / req.temperature)
            probs /= probs.sum()
            return int(np.random.default_rng().choice(len(probs), p=probs))
        return int(np.argmax(logits))

    def _finish(self, slot: int):
        req = self.slot_req[slot]
        req.done = True
        self.slot_req[slot] = None
        self.slot_len[slot] = 0
        self.slot_new[slot] = 0

    def step(self) -> bool:
        """Admit + one decode step. Returns True while anything is in flight."""
        self._admit()
        active_slots = [i for i, r in enumerate(self.slot_req) if r is not None]
        if not active_slots:
            return bool(self.queue)
        active = np.zeros((self.num_slots,), bool)
        active[active_slots] = True
        self.kv, logits = self._decode_jit(
            self.params, self.kv, self.last_token_embed,
            jnp.asarray(self.slot_len), jnp.asarray(active))
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

    def generate(self, requests: List[Request]) -> List[Request]:
        """Blocking batch generate (continuous batching under the hood)."""
        for r in requests:
            self.submit(r)
        while any(not r.done for r in requests):
            if not self.step() and any(not r.done for r in requests):
                break
        return requests
