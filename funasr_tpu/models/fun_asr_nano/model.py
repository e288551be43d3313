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
        self.ctc = None
        if ctc_weight > 0:
            from funasr_tpu.models.ctc.ctc import CTC
            self.ctc = CTC(odim=vocab_size, encoder_output_size=enc_out,
                           **(ctc_conf or {}))
        self._engine: Optional[LLMEngine] = None
        self.kwargs = kwargs

    def init_params(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        p = {"audio_encoder": self.audio_encoder.init(k1),
             "audio_adaptor": self.audio_adaptor.init(k2),
             "llm": self.llm.init_params(k3)}
        if self.ctc is not None:
            p["ctc"] = self.ctc.init(jax.random.fold_in(rng, 4))
        return p

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

    def build_chatml_ids(self, tokenizer, prompt: str):
        """-> (prefix_ids, suffix_ids) around the audio embedding span."""
        prefix = ("<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
                  f"<|im_start|>user\n{prompt}")
        suffix = "<|im_end|>\n<|im_start|>assistant\n"
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
        audio_embeds = np.asarray(audio_embeds, np.float32)
        audio_lens = np.asarray(audio_lens)

        prompt = self.get_prompt(
            hotwords=(kwargs.get("hotword") or "").split() if kwargs.get("hotword")
            else None,
            language=kwargs.get("language"),
            itn=kwargs.get("use_itn", True))
        prefix_ids, suffix_ids = self.build_chatml_ids(tokenizer, prompt)

        eos_ids = tuple(kwargs.get("eos_token_ids", ()))
        if not eos_ids:
            for tok in ("<|im_end|>", "<|endoftext|>"):
                try:
                    ids = tokenizer.encode(tok)
                    if len(ids) == 1:
                        eos_ids += (ids[0],)
                except Exception:  # noqa: BLE001
                    pass

        prefix_emb = np.asarray(self.llm.embed(
            params["llm"], jnp.asarray(prefix_ids), jnp.float32))
        suffix_emb = np.asarray(self.llm.embed(
            params["llm"], jnp.asarray(suffix_ids), jnp.float32))

        engine = self.engine(params, num_slots=kwargs.get("num_slots", 8),
                             max_len=kwargs.get("max_model_len", 2048))
        requests = []
        for i in range(audio_embeds.shape[0]):
            emb = np.concatenate(
                [prefix_emb, audio_embeds[i, : audio_lens[i]], suffix_emb], axis=0)
            requests.append(Request(
                request_id=i, input_embeds=emb,
                max_new_tokens=kwargs.get("max_new_tokens", 256),
                eos_token_ids=eos_ids,
                temperature=kwargs.get("temperature", 0.0)))
        engine.generate(requests)

        if key is None:
            key = [f"rand_key_{i}" for i in range(len(requests))]
        results = []
        for i, req in enumerate(requests):
            out_ids = [t for t in req.output_ids if t not in eos_ids]
            text = tokenizer.decode(out_ids) if tokenizer is not None else ""
            results.append({"key": key[i], "text": text})
        return results, meta
