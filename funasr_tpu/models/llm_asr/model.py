"""LLM-ASR model family: audio encoder + adaptor + causal-LM decoder.

TPU-native rebuilds of the reference speech-LLM wrappers (FunASR
``funasr/models/llm_asr/model.py`` LLMASR = Whisper/SANM encoder + adaptor + HF LLM;
``glm_asr/`` GLMASR; ``qwen_audio/`` chat wrappers; ``llm_asr_nar/`` NAR variant).
All share the FunASRNano machinery (JAX QwenLM decoder + continuous-batching engine);
they differ in encoder family, prompt format, and decode mode.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.models.fun_asr_nano.model import FunASRNano
from funasr_tpu.register import tables

#: ``<|startofspeech|>!/path.wav<|endofspeech|>`` span inside a user turn
#: (reference ``llm_asr/model.py:706`` pattern; ``!`` marks a file path).
SPEECH_SPAN = re.compile(r"(<\|startofspeech\|>.*?<\|endofspeech\|>)")
IGNORE_INDEX = -100


@tables.register("model_classes", "LLMASR")
class LLMASR(FunASRNano):
    """Generic speech-LLM: any registered encoder + adaptor + Qwen-style decoder
    (reference ``llm_asr/model.py:28``). Prompt is a plain instruction string.

    Beyond plain-audio transcription (inherited from FunASRNano), this family
    speaks the reference's multiturn OpenAI-message format: ``generate(input=
    [messages])`` where ``messages`` is a list of ``{"role", "content"}`` dicts
    whose user turns may embed ``<|startofspeech|>!path<|endofspeech|>`` audio
    spans (reference ``data_template:666`` / ``data_load_speech:693`` /
    ``inference:820`` and LLMASR4's ``inference_prepare:1433``)."""

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

    # ------------------------------------------------------------------
    # Multiturn OpenAI-message machinery (reference llm_asr/model.py:666-945,
    # 1258-1620). TPU-native redesign: instead of the reference's per-row
    # python loop writing encoder frames into ``inputs_embeds`` in place, the
    # audio splice is a vectorized mask-gather (cumsum over the audio-slot
    # mask indexes into the packed audio embeddings), so the training step
    # stays one jitted program with static shapes.

    def audio_token_len(self, fbank_len: int) -> int:
        """LLM token slots one audio span occupies (reference sub_token_len
        math ``model.py:770-786``, generalized via the adaptor)."""
        enc_len = int(fbank_len)
        if hasattr(self.audio_encoder, "output_len"):
            enc_len = int(self.audio_encoder.output_len(enc_len))
        if hasattr(self.audio_adaptor, "audio_token_len"):
            return int(self.audio_adaptor.audio_token_len(enc_len))
        return max(enc_len, 1)

    @staticmethod
    def data_template(data) -> Dict[str, List[str]]:
        """OpenAI role list -> parallel system/user/assistant turn lists
        (reference ``model.py:666-691``; system broadcast over turns)."""
        if isinstance(data, dict):  # already template-form
            return {"system": list(data.get("system") or [""]),
                    "user": list(data.get("user") or []),
                    "assistant": list(data.get("assistant") or [])}
        system, user, assistant = [], [], []
        for item in data:
            role, content = item["role"], item["content"]
            if role == "system":
                system.append(content)
            elif role == "user":
                user.append(content)
            elif role == "assistant":
                assistant.append(content)
        if not system:
            system = [""]
        system = system * len(user)
        return {"system": system, "user": user, "assistant": assistant}

    def data_load_speech(self, contents: Dict, tokenizer, frontend,
                         meta_data: Optional[Dict] = None, **kwargs) -> Dict:
        """Build one sample's token/label/audio tensors from template turns
        (reference ``model.py:693-818``): audio spans load + fbank, reserve
        ``audio_token_len`` placeholder ids, record per-span begin offsets;
        labels mask every non-assistant position with -100.

        Returns numpy arrays: ``speech (S, T, D)`` padded fbank per span,
        ``speech_lengths (S,)``, ``input_ids/labels_ids/fbank_mask (L,)``,
        ``source_ids`` (everything before the final assistant turn — the
        generation prompt), ``fbank_beg/fake_token_len (S,)``."""
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)
        meta_data = meta_data if meta_data is not None else {}
        input_ids: List[int] = []
        labels: List[int] = []
        fbank_mask: List[float] = []
        fbank_beg: List[int] = []
        fake_token_len: List[int] = []
        fbanks: List[np.ndarray] = []
        source_end = 0
        turns = zip(contents["system"], contents["user"], contents["assistant"])
        for sys_p, user_p, target in turns:
            source = (f"<|im_start|>system\n{sys_p}<|im_end|>\n"
                      f"<|im_start|>user\n{user_p}<|im_end|>\n"
                      f"<|im_start|>assistant\n")
            for sub in SPEECH_SPAN.split(source):
                if not sub.startswith("<|startofspeech|>"):
                    toks = list(tokenizer.encode(sub))
                    input_ids += toks
                    labels += [IGNORE_INDEX] * len(toks)
                    fbank_mask += [0.0] * len(toks)
                    continue
                src = sub[len("<|startofspeech|>"):-len("<|endofspeech|>")]
                if src.startswith("!"):
                    src = src[1:]
                audio = load_audio_text_image_video(
                    [src], fs=frontend.fs,
                    audio_fs=kwargs.get("fs", 16000))
                speech, speech_lengths = extract_fbank(audio, frontend=frontend)
                fbanks.append(np.asarray(speech[0], np.float32))
                n = self.audio_token_len(int(speech_lengths[0]))
                fbank_beg.append(len(input_ids))
                fake_token_len.append(n)
                input_ids += [0] * n
                labels += [IGNORE_INDEX] * n
                fbank_mask += [1.0] * n
            source_end = len(input_ids)
            target_ids = list(tokenizer.encode(f"{target}<|im_end|>"))
            input_ids += target_ids
            labels += target_ids
            fbank_mask += [0.0] * len(target_ids)
        n_span = len(fbanks)
        t_max = max((f.shape[0] for f in fbanks), default=1)
        d = fbanks[0].shape[1] if fbanks else 1
        speech = np.zeros((n_span, t_max, d), np.float32)
        speech_lengths = np.zeros((n_span,), np.int32)
        for s, f in enumerate(fbanks):
            speech[s, : f.shape[0]] = f
            speech_lengths[s] = f.shape[0]
        meta_data["batch_data_time"] = sum(
            f.shape[0] for f in fbanks) * getattr(
                frontend, "frame_shift_ms", 10) * getattr(
                    frontend, "lfr_n", 1) / 1000
        return {
            "speech": speech, "speech_lengths": speech_lengths,
            "input_ids": np.asarray(input_ids, np.int32),
            "labels_ids": np.asarray(labels, np.int32),
            "source_ids": np.asarray(input_ids[:source_end], np.int32),
            "fbank_mask": np.asarray(fbank_mask, np.float32),
            "fbank_beg": np.asarray(fbank_beg, np.int32),
            "fake_token_len": np.asarray(fake_token_len, np.int32),
            "attention_mask": np.ones((len(input_ids),), np.int32),
        }

    def splice_audio_embeds(self, embeds, audio, audio_lens, fbank_mask):
        """Vectorized audio splice: positions where ``fbank_mask`` is set take
        successive frames of the packed audio embeddings (one span per row).
        jnp in / jnp out; jittable (the reference's in-place row loop,
        ``model.py:869-878``, re-expressed as cumsum + gather)."""
        mask = fbank_mask > 0
        idx = jnp.clip(jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1, 0,
                       audio.shape[1] - 1)
        gathered = jnp.take_along_axis(audio, idx[..., None], axis=1)
        return jnp.where(mask[..., None], gathered.astype(embeds.dtype), embeds)

    def forward_jit_batch(self, params, batch, rng=None):
        """Multiturn fine-tune objective over collated OpenAI-format batches
        (reference LLMASR4 ``forward:1135-1244``): splice audio embeddings
        into the token-embedding sequence at the placeholder slots, next-token
        CE on assistant positions only (labels >= 0). One span per row (the
        ASR fine-tune case; multi-span rows stay on the host inference path).
        """
        speech = batch["speech"]
        if speech.ndim == 2:  # raw waveforms: frontend runs inside the step
            raise ValueError("forward_jit_batch expects fbank features")
        audio, audio_lens = self.encode_audio(params, speech,
                                              batch["speech_lengths"])
        ids = jnp.maximum(batch["input_ids"], 0)
        emb = self.llm.embed(params["llm"], ids, jnp.float32)
        spliced = self.splice_audio_embeds(emb, audio, audio_lens,
                                           batch["fbank_mask"])
        logits = self.llm.forward_embeds(params["llm"], spliced)
        pred = logits[:, :-1]
        tgt = batch["labels_ids"][:, 1:]
        valid = (tgt != IGNORE_INDEX).astype(jnp.float32)
        logp = jax.nn.log_softmax(pred.astype(jnp.float32), -1)
        ce = -jnp.take_along_axis(logp, jnp.maximum(tgt, 0)[..., None],
                                  -1)[..., 0]
        denom = jnp.maximum(jnp.sum(valid), 1.0)
        loss = jnp.sum(ce * valid) / denom
        acc = jnp.sum((jnp.argmax(pred, -1) == jnp.maximum(tgt, 0)) * valid) \
            / denom
        stats = {"loss": loss, "loss_llm": loss, "acc": acc}
        return loss, stats, speech.shape[0]

    # ------------------------------------------------------------------

    @staticmethod
    def _is_messages(x) -> bool:
        return (isinstance(x, (list, tuple)) and len(x) > 0
                and isinstance(x[0], dict) and "role" in x[0]) or (
                    isinstance(x, dict) and ("user" in x or "messages" in x))

    def inference(self, params, data_in, data_lengths=None,
                  key: Optional[List] = None, tokenizer=None, frontend=None,
                  **kwargs):
        """Messages-mode inference when ``data_in`` carries OpenAI-format
        conversations (reference LLMASR2 ``inference:820-945``); plain audio
        falls through to the FunASRNano path."""
        is_msgs = (isinstance(data_in, (list, tuple)) and len(data_in) > 0
                   and self._is_messages(data_in[0]))
        if not is_msgs:
            # plain audio (path / ndarray / bytes) — FunASRNano ASR path
            return super().inference(params, data_in, data_lengths, key,
                                     tokenizer, frontend, **kwargs)
        meta: Dict = {}
        results = []
        teacher_forcing = kwargs.get("teacher_forcing",
                                     kwargs.get("tearchforing", False))
        for i, messages in enumerate(data_in):
            if isinstance(messages, dict) and "messages" in messages:
                messages = messages["messages"]
            contents = self.data_template(messages)
            sample = self.data_load_speech(contents, tokenizer, frontend,
                                           meta_data=meta, **kwargs)
            if sample["speech"].shape[0] > 0:
                audio, audio_lens = self.encode_audio(
                    params, jnp.asarray(sample["speech"]),
                    jnp.asarray(sample["speech_lengths"]))
                audio = np.asarray(audio, np.float32)
                audio_lens = np.asarray(audio_lens)
                packed = np.concatenate(
                    [audio[s, : audio_lens[s]]
                     for s in range(audio.shape[0])], axis=0)
            else:
                packed = np.zeros((0, self.llm_cfg.hidden_size), np.float32)
            label = (contents["assistant"][-1]
                     if contents["assistant"] else "")
            k = (key[i] if key is not None and i < len(key)
                 else f"rand_key_{i}")
            if teacher_forcing:
                res = self._teacher_forcing_eval(params, sample, packed,
                                                 tokenizer, **kwargs)
            else:
                res = self._generate_from_prompt(params, sample, packed,
                                                 tokenizer, **kwargs)
            res.update({"key": k, "label": label})
            res["text_tn"] = re.sub(r"[^\w\s　一-鿿]+", "",
                                    res["text"])
            results.append(res)
        return results, meta

    def _splice_np(self, ids: np.ndarray, packed: np.ndarray, params,
                   fbank_mask: np.ndarray) -> np.ndarray:
        emb = np.array(self.llm.embed(
            params["llm"], jnp.asarray(np.maximum(ids, 0)), jnp.float32))
        pos = np.nonzero(fbank_mask[: len(ids)] > 0)[0]
        n = min(len(pos), len(packed))
        emb[pos[:n]] = packed[:n]
        return emb

    def _generate_from_prompt(self, params, sample, packed, tokenizer,
                              **kwargs) -> Dict:
        from funasr_tpu.llm.engine import Request
        emb = self._splice_np(sample["source_ids"], packed, params,
                              sample["fbank_mask"])
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
        req = Request(request_id=0, input_embeds=emb,
                      max_new_tokens=kwargs.get("max_new_tokens",
                                                kwargs.get("max_length", 512)),
                      eos_token_ids=eos_ids,
                      temperature=kwargs.get("temperature", 0.0))
        engine.generate([req])
        out_ids = [t for t in req.output_ids if t not in eos_ids]
        return {"text": tokenizer.decode(out_ids) if tokenizer else ""}

    def _teacher_forcing_eval(self, params, sample, packed, tokenizer,
                              **kwargs) -> Dict:
        """Teacher-forcing loss + prediction on the assistant span (reference
        ``tearchforing`` branch ``model.py:908-928``)."""
        emb = self._splice_np(sample["input_ids"], packed, params,
                              sample["fbank_mask"])
        logits = np.asarray(self.llm.forward_embeds(
            params["llm"], jnp.asarray(emb)[None]))[0]
        labels = sample["labels_ids"]
        pred = logits[:-1]
        tgt = labels[1:].astype(np.int64)
        valid = tgt != IGNORE_INDEX
        logp = jax.nn.log_softmax(jnp.asarray(pred), -1)
        ce = -np.asarray(jnp.take_along_axis(
            logp, jnp.maximum(jnp.asarray(tgt), 0)[:, None], -1))[:, 0]
        loss = float((ce * valid).sum() / max(valid.sum(), 1))
        n_src = len(sample["source_ids"])
        preds = pred[n_src - 1:].argmax(-1)
        out = [int(t) for t, v in zip(preds, tgt[n_src - 1:]) if v]
        return {"text": tokenizer.decode(out) if tokenizer else "",
                "loss": loss}


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

    def build_chatml_ids(self, tokenizer, prompt: str, prev_text: str = ""):
        """GLM chat template: [gMASK]<sop><|user|> prompt + audio ...
        <|assistant|> (the apply_chat_template layout of GLM-edge).
        ``prev_text`` is the streaming stage-2 forced continuation prefix."""
        prefix = f"[gMASK]<sop><|user|>\n{prompt}\n<|begin_of_audio|>"
        suffix = "<|end_of_audio|><|assistant|>\n" + prev_text
        return tokenizer.encode(prefix), tokenizer.encode(suffix)


@tables.register("model_classes", "QwenAudio")
@tables.register("model_classes", "QwenAudioChat")
@tables.register("model_classes", "QwenAudioWarp")
class QwenAudio(LLMASR):
    """Qwen-Audio chat wrapper (reference ``qwen_audio/model.py``): audio encoder is
    whisper-style; ChatML chat prompting."""

    def build_chatml_ids(self, tokenizer, prompt: str, prev_text: str = ""):
        prefix = ("<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
                  "<|im_start|>user\nAudio 1:<audio>")
        suffix = (f"</audio>\n{prompt}<|im_end|>\n<|im_start|>assistant\n"
                  + prev_text)
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
    """Versioned LLMASR configs (reference ``llm_asr/model.py`` LLMASR2:403 /
    LLMASR3:947 / LLMASR4:977). All three speak the multiturn OpenAI-message
    format (``data_template``/``data_load_speech``/messages ``inference`` —
    inherited above). The reference's version deltas collapse here: LLMASR2 vs
    LLMASR3 differ only in whether ``encode`` permutes and passes lengths
    (``model.py:654`` vs ``:964``) — our functional encoders always take
    (B, T, D) + lengths; LLMASR4's multi-span ``inference_prepare:1433`` maps
    to the host-side packed splice in ``inference``; checkpoint-layout
    differences live in the converter."""


@tables.register("model_classes", "LLMASRNARPrompt")
class LLMASRNARPrompt(LLMASRNAR):
    """NAR variant with a learned prompt prefix (reference ``llm_asr_nar``)."""


@tables.register("model_classes", "MinMo")
class MinMo(LLMASR):
    """MinMo placeholder parity (reference ``minmo/`` is an empty stub, 0 LoC)."""
