"""Fun-ASR-Nano: LLM-based ASR (SAN-M audio encoder + adaptor + Qwen3 decoder).

TPU-native rebuild of the reference (FunASR ``funasr/models/fun_asr_nano/
model.py:33-1100``: frozen SANM audio encoder, Linear/Transformer adaptor to the LLM
width, HF CausalLM with ChatML prompting — ``get_prompt:725`` hotword/language/itn
prompt, ``generate_chatml:747`` with ``<|startofspeech|>!!<|endofspeech|>`` audio
placeholder; batched LLM inference ``_inference_llm_batch:810``).

The decoder is the JAX QwenLM; batched decoding goes through the continuous-batching
``LLMEngine`` (the vLLM-equivalent path of ``inference_vllm.py``).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import funasr_tpu.models.llm_asr.adaptor  # noqa: F401 (registers adaptors)
from funasr_tpu.llm.engine import LLMEngine, Request
from funasr_tpu.models.llm.qwen import QwenConfig, QwenLM
from funasr_tpu.register import tables


@jax.jit
def _assemble_prompts_jit(prefix, audio, audio_lens, suffix):
    """Splice [prefix | audio rows | suffix] per batch row ON DEVICE.

    prefix (P, D) / suffix (S, D) token embeds, audio (B, Ta, D) with
    per-row valid lengths -> ((B, P+Ta+S, D) prompts, (B,) prompt lens).
    Pure gather/where (no per-row dynamic shapes), so one fixed-shape
    program covers every batch; rows beyond a prompt's length are garbage
    the engine masks via the returned lens."""
    b, ta, _ = audio.shape
    p, s = prefix.shape[0], suffix.shape[0]
    pos = jnp.arange(p + ta + s)[None]                 # (1, T)
    al = audio_lens[:, None]                           # (B, 1)
    in_prefix = (pos < p)[..., None]
    in_audio = ((pos >= p) & (pos < p + al))[..., None]
    pre_idx = jnp.clip(pos, 0, p - 1)                  # (1, T)
    aud_idx = jnp.clip(pos - p, 0, ta - 1)             # (B, T) after bcast
    suf_idx = jnp.clip(pos - p - al, 0, s - 1)         # (B, T)
    aud_rows = jnp.take_along_axis(
        audio, jnp.broadcast_to(aud_idx, (b, pos.shape[1]))[..., None], axis=1)
    out = jnp.where(in_prefix, prefix[pre_idx],
                    jnp.where(in_audio, aud_rows, suffix[suf_idx]))
    return out, p + audio_lens + s


@tables.register("model_classes", "FunASRNano")
class FunASRNano:
    def __init__(self, audio_encoder: str = "SANMEncoder",
                 audio_encoder_conf: Optional[dict] = None,
                 audio_adaptor: str = "Linear",
                 audio_adaptor_conf: Optional[dict] = None,
                 llm_conf: Optional[dict] = None, input_size: int = 560,
                 vocab_size: int = -1, ctc_conf: Optional[dict] = None,
                 ctc_weight: float = 0.0, **kwargs):
        self.audio_encoder = tables.encoder_classes[audio_encoder](
            input_size=input_size, **(audio_encoder_conf or {}))
        enc_out = self.audio_encoder.output_size()
        llm_conf = dict(llm_conf or {})
        self.llm_cfg = QwenConfig(**{k: v for k, v in llm_conf.items()
                                     if k in QwenConfig._fields}) \
            if llm_conf else QwenConfig()
        adaptor_conf = dict(audio_adaptor_conf or {})
        adaptor_conf.setdefault("encoder_dim", enc_out)
        adaptor_conf.setdefault("llm_dim", self.llm_cfg.hidden_size)
        self.audio_adaptor = tables.adaptor_classes[audio_adaptor](**adaptor_conf)
        self.llm = QwenLM(self.llm_cfg)
        # CTC branch (reference model.py:153-206): an adaptor-class module over
        # the encoder output + a CTC head over the CTC tokenizer's vocab — used
        # for character timestamps via forced alignment and as a fast fallback
        self.ctc = None
        self.ctc_decoder = None
        self.blank_id = kwargs.get("blank_id", 0)
        ctc_decoder = kwargs.get("ctc_decoder")
        if ctc_decoder is not None or ctc_weight > 0:
            from funasr_tpu.models.ctc.ctc import CTC
            ctc_dec_conf = dict(kwargs.get("ctc_decoder_conf") or {})
            ctc_dec_conf.setdefault("encoder_dim", enc_out)
            ctc_dim = enc_out
            if ctc_decoder is not None:
                self.ctc_decoder = tables.adaptor_classes[ctc_decoder](
                    **ctc_dec_conf)
                ctc_dim = ctc_dec_conf.get("llm_dim",
                                           getattr(self.ctc_decoder, "llm_dim",
                                                   enc_out))
            ctc_conf = dict(ctc_conf or {})
            ctc_vocab = int(ctc_conf.pop("ctc_vocab_size",
                                         vocab_size if vocab_size > 0 else 8404))
            self.ctc = CTC(odim=ctc_vocab, encoder_output_size=ctc_dim,
                           **ctc_conf)
        self.ctc_weight = ctc_weight
        self._engine: Optional[LLMEngine] = None
        self.kwargs = kwargs

    def init_params(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        p = {"audio_encoder": self.audio_encoder.init(k1),
             "audio_adaptor": self.audio_adaptor.init(k2),
             "llm": self.llm.init_params(k3)}
        if self.ctc_decoder is not None:
            p["ctc_decoder"] = self.ctc_decoder.init(jax.random.fold_in(rng, 3))
        if self.ctc is not None:
            p["ctc"] = self.ctc.init(jax.random.fold_in(rng, 4))
        return p

    # ------------------------------------------------------------------

    def forward_jit(self, params, speech, speech_lengths, text, text_lengths,
                    rng=None, prompt_ids=None, suffix_ids=None):
        """LLM fine-tune objective (reference ``forward:287-408``): splice
        [prompt | audio embeds | suffix | target embeds] and apply CE on the
        target positions (+ weighted CTC on the encoder branch)."""
        from funasr_tpu.core.layers import make_pad_mask

        b = speech.shape[0]
        audio, audio_lens = self.encode_audio(params, speech, speech_lengths)
        t_a = audio.shape[1]
        if prompt_ids is None:
            prompt_ids = jnp.asarray([151644], jnp.int32)  # <|im_start|>
        if suffix_ids is None:
            suffix_ids = jnp.asarray([151645], jnp.int32)  # <|im_end|>
        dt = jnp.float32
        prefix = jnp.broadcast_to(
            self.llm.embed(params["llm"], prompt_ids, dt)[None],
            (b, prompt_ids.shape[0], self.llm_cfg.hidden_size))
        suffix = jnp.broadcast_to(
            self.llm.embed(params["llm"], suffix_ids, dt)[None],
            (b, suffix_ids.shape[0], self.llm_cfg.hidden_size))
        tgt = jnp.maximum(text, 0)
        tgt_emb = self.llm.embed(params["llm"], tgt, dt)
        inputs = jnp.concatenate(
            [prefix, audio.astype(dt), suffix, tgt_emb], axis=1)
        logits = self.llm.forward_embeds(params["llm"], inputs)
        # CE on target positions: logits predicting token t sit one step left
        off = prefix.shape[1] + t_a + suffix.shape[1]
        pred = logits[:, off - 1: off - 1 + tgt.shape[1]]
        logp = jax.nn.log_softmax(pred.astype(jnp.float32), -1)
        tgt_mask = (make_pad_mask(text_lengths, tgt.shape[1])
                    & (text >= 0)).astype(jnp.float32)
        ce = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        denom = jnp.maximum(jnp.sum(tgt_mask), 1.0)
        loss_llm = jnp.sum(ce * tgt_mask) / denom
        acc = jnp.sum((jnp.argmax(pred, -1) == tgt) * tgt_mask) / denom
        stats = {"loss_llm": loss_llm, "acc": acc}
        loss = loss_llm
        if self.ctc is not None and self.ctc_weight > 0:
            enc, enc_lens = self.audio_encoder(params["audio_encoder"], speech,
                                               speech_lengths)
            if self.ctc_decoder is not None:
                enc, enc_lens = self.ctc_decoder(params["ctc_decoder"], enc,
                                                 enc_lens)
            loss_ctc = self.ctc.loss(params["ctc"], enc, enc_lens, text,
                                     text_lengths)
            stats["loss_ctc"] = loss_ctc
            loss = loss_llm + self.ctc_weight * loss_ctc
        stats["loss"] = loss
        return loss, stats, b

    def ctc_branch(self, params, speech, speech_lengths):
        """Encoder -> ctc_decoder -> CTC log-probs (host arrays)."""
        enc, enc_lens = self.audio_encoder(params["audio_encoder"],
                                           jnp.asarray(speech),
                                           jnp.asarray(speech_lengths))
        if self.ctc_decoder is not None and "ctc_decoder" in params:
            enc, enc_lens = self.ctc_decoder(params["ctc_decoder"], enc,
                                             enc_lens)
        logp = self.ctc.log_softmax(params["ctc"], enc)
        return np.asarray(logp, np.float32), np.asarray(enc_lens)

    # ------------------------------------------------------------------

    def get_prompt(self, hotwords: Optional[List[str]] = None,
                   language: Optional[str] = None, itn: bool = True) -> str:
        prompt = ""
        if hotwords:
            joined = ", ".join(hotwords)
            prompt = ("请结合上下文信息，更加准确地完成语音转写任务。如果没有相关信息，"
                      "我们会留空。\n\n\n**上下文信息：**\n\n\n")
            prompt += f"热词列表：[{joined}]\n"
        prompt += "语音转写" if language is None else f"语音转写成{language}"
        if not itn:
            prompt += "，不进行文本规整"
        return prompt + "："

    def build_chatml_ids(self, tokenizer, prompt: str, prev_text: str = ""):
        """-> (prefix_ids, suffix_ids) around the audio embedding span.

        ``prev_text`` is appended after the assistant turn opener as a forced
        continuation prefix — the streaming SDK's stage-2 stabilizer
        (reference ``inference_vllm_streaming.py:175-189`` _build_embeds)."""
        prefix = ("<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
                  f"<|im_start|>user\n{prompt}")
        suffix = "<|im_end|>\n<|im_start|>assistant\n" + prev_text
        return tokenizer.encode(prefix), tokenizer.encode(suffix)

    def encode_audio(self, params, speech, speech_lengths):
        enc, enc_lens = self.audio_encoder(params["audio_encoder"], speech,
                                           speech_lengths)
        return self.audio_adaptor(params["audio_adaptor"], enc, enc_lens)

    def engine(self, params, num_slots: int = 8, max_len: int = 2048) -> LLMEngine:
        if self._engine is None:
            self._engine = LLMEngine(self.llm, params["llm"], num_slots=num_slots,
                                     max_len=max_len)
        return self._engine

    # ------------------------------------------------------------------

    def inference(self, params, data_in, data_lengths=None, key: Optional[List] = None,
                  tokenizer=None, frontend=None, **kwargs):
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)

        meta: Dict = {}
        t0 = time.perf_counter()
        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs, audio_fs=kwargs.get("fs", 16000),
            data_type=kwargs.get("data_type", "sound"))
        meta["load_data"] = f"{time.perf_counter() - t0:0.3f}"
        speech, speech_lengths = extract_fbank(audio_list, frontend=frontend)
        meta["batch_data_time"] = (float(np.sum(speech_lengths))
                                   * frontend.frame_shift_ms * frontend.lfr_n / 1000)

        audio_embeds, audio_lens = self.encode_audio(
            params, jnp.asarray(speech), jnp.asarray(speech_lengths))
        audio_lens = np.asarray(audio_lens)

        prompt = self.get_prompt(
            hotwords=(kwargs.get("hotword") or "").split() if kwargs.get("hotword")
            else None,
            language=kwargs.get("language"),
            itn=kwargs.get("use_itn", True))
        prefix_ids, suffix_ids = self.build_chatml_ids(
            tokenizer, prompt, prev_text=kwargs.get("prev_text", ""))

        eos_ids = tuple(kwargs.get("eos_token_ids", ()))
        if not eos_ids:
            for tok in ("<|im_end|>", "<|endoftext|>"):
                try:
                    ids = tokenizer.encode(tok)
                    if len(ids) == 1:
                        eos_ids += (ids[0],)
                except Exception:  # noqa: BLE001
                    pass

        engine = self.engine(params, num_slots=kwargs.get("num_slots", 8),
                             max_len=kwargs.get("max_model_len", 2048))
        temperature = kwargs.get("temperature", 0.0)
        max_new = kwargs.get("max_new_tokens", 256)
        if not temperature:
            # greedy serving path: splice prefix/audio/suffix ON DEVICE and
            # hand the (B, T, D) prompt buffer to the engine — zero
            # host<->device prompt traffic (vLLM prompt_embeds twin)
            prompts, prompt_lens = _assemble_prompts_jit(
                self.llm.embed(params["llm"], jnp.asarray(prefix_ids),
                               jnp.float32),
                audio_embeds.astype(jnp.float32), jnp.asarray(audio_lens),
                self.llm.embed(params["llm"], jnp.asarray(suffix_ids),
                               jnp.float32))
            requests = engine.submit_prompt_batch(
                prompts, np.asarray(prompt_lens), max_new_tokens=max_new,
                eos_token_ids=eos_ids)
            while any(not r.done for r in requests):
                if not engine.step():
                    break
        else:
            prefix_emb = np.asarray(self.llm.embed(
                params["llm"], jnp.asarray(prefix_ids), jnp.float32))
            suffix_emb = np.asarray(self.llm.embed(
                params["llm"], jnp.asarray(suffix_ids), jnp.float32))
            audio_np = np.asarray(audio_embeds, np.float32)
            requests = []
            for i in range(audio_np.shape[0]):
                emb = np.concatenate(
                    [prefix_emb, audio_np[i, : audio_lens[i]], suffix_emb],
                    axis=0)
                requests.append(Request(
                    request_id=i, input_embeds=emb,
                    max_new_tokens=max_new,
                    eos_token_ids=eos_ids,
                    temperature=temperature,
                    # every request repeats the same ChatML prefix — the
                    # engine's prefix cache prefills it once per lifetime
                    prefix_len=prefix_emb.shape[0]))
            engine.generate(requests)

        if key is None:
            key = [f"rand_key_{i}" for i in range(len(requests))]
        results = []
        for i, req in enumerate(requests):
            out_ids = [t for t in req.output_ids if t not in eos_ids]
            text = tokenizer.decode(out_ids) if tokenizer is not None else ""
            results.append({"key": key[i], "text": text})

        # CTC branch: greedy ctc_text + character timestamps by forced
        # alignment of both texts (reference model.py:965-1070; 60 ms frames)
        ctc_tokenizer = kwargs.get("ctc_tokenizer")
        if self.ctc is not None and "ctc" in params and ctc_tokenizer is not None:
            from funasr_tpu.ops.ctc_align import ctc_forced_align
            logp, ctc_lens = self.ctc_branch(params, speech, speech_lengths)
            frame_s = 0.06  # lfr6 x 10 ms

            def path_to_ts(path):
                out = []
                prev = self.blank_id
                for t, lab in enumerate(path):
                    if lab != self.blank_id:
                        if lab != prev:  # new emission starts
                            out.append({
                                "token": ctc_tokenizer.decode([int(lab)]),
                                "start_time": round(t * frame_s, 3),
                                "end_time": round((t + 1) * frame_s, 3)})
                        else:  # same emission continues
                            out[-1]["end_time"] = round((t + 1) * frame_s, 3)
                    prev = lab
                return out

            def align(x, text):
                ids = np.asarray(ctc_tokenizer.encode(text), np.int64)
                ids = ids[(ids >= 0) & (ids < x.shape[-1])]  # drop OOV ids
                if ids.size == 0 or 2 * ids.size + 1 > x.shape[0]:
                    return []
                return path_to_ts(ctc_forced_align(x, ids, x.shape[0],
                                                   len(ids),
                                                   blank_id=self.blank_id))

            for i, res in enumerate(results):
                x = logp[i, : int(ctc_lens[i])]
                yseq = x.argmax(-1)
                keep = np.concatenate([[True], yseq[1:] != yseq[:-1]])
                toks = yseq[keep]
                toks = toks[toks != self.blank_id].tolist()
                ctc_text = ctc_tokenizer.decode(toks)
                res["ctc_text"] = ctc_text.replace("<|nospeech|>", "")
                res["ctc_timestamps"] = align(x, res["ctc_text"])
                res["timestamps"] = align(x, res["text"])
        return results, meta
