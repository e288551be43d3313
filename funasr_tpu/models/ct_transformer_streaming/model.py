"""Streaming (VAD-aware) CT-Transformer punctuation.

TPU-native rebuild of FunASR ``funasr/models/ct_transformer_streaming/model.py``
(``CTTransformerStreaming:32``): online punctuation used as the punc_model of 2-pass
streaming pipelines. Differences from the offline model:

- the encoder is :class:`SANMVadEncoder` — causal self-attention everywhere except
  the last layer, whose mask keeps pre-text queries from attending to new text
  (``punc_forward:61-76`` passes ``vad_indexes``);
- ``inference`` carries ``cache["pre_text"]`` (words after the last sentence end)
  between calls, prepends it to the new text, and only emits the new words
  (``inference:100-222``); a trailing punctuation mark is withheld (replaced by "_")
  so the next chunk can revise it.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import funasr_tpu.models.ct_transformer_streaming.encoder  # noqa: F401 (registers)
from funasr_tpu.core.layers import embedding_apply, linear_apply
from funasr_tpu.models.ct_transformer.model import CTTransformer
from funasr_tpu.models.ct_transformer.utils import (split_to_mini_sentence,
                                                    split_words)
from funasr_tpu.register import tables
from funasr_tpu.utils.bucket import bucket_length


@tables.register("model_classes", "CTTransformerStreaming")
class CTTransformerStreaming(CTTransformer):
    """Output per call: {"key", "text" (new words only, punctuated), "punc_array"}."""

    def __init__(self, encoder: str = "SANMVadEncoder", **kwargs):
        super().__init__(encoder=encoder, **kwargs)
        self._jit_vad_forward = jax.jit(self._vad_forward)

    def with_vad(self) -> bool:
        return True

    def _vad_forward(self, params, text, text_lengths, vad_indexes):
        x = embedding_apply(params["embed"], text)
        h, _ = self.encoder(params["encoder"], x, text_lengths,
                            vad_indexes=vad_indexes)
        return linear_apply(params["decoder"], h)

    def punc_forward(self, params, text, text_lengths, vad_indexes=None):
        if vad_indexes is None:
            vad_indexes = np.zeros((np.shape(text)[0],), np.int32)
        return self._jit_vad_forward(params, jnp.asarray(text),
                                     jnp.asarray(text_lengths),
                                     jnp.asarray(vad_indexes))

    def _window_logits(self, params, ids: np.ndarray, vad_pos: int) -> np.ndarray:
        n = len(ids)
        nb = bucket_length(n, minimum=8, multiple=8)
        padded = np.zeros((1, nb), np.int32)
        padded[0, :n] = ids
        y = self.punc_forward(params, padded, np.asarray([n], np.int32),
                              np.asarray([vad_pos], np.int32))
        return np.asarray(y)[0, :n]

    def inference(self, params, data_in, data_lengths=None, key: Optional[list] = None,
                  tokenizer=None, frontend=None, cache: Optional[dict] = None,
                  **kwargs):
        if cache is None:
            cache = {}
        cache.setdefault("pre_text", [])
        text = data_in[0] if isinstance(data_in, list) else data_in
        text = "".join(cache["pre_text"]) + " " + str(text)

        split_size = kwargs.get("split_size", 20)
        cache_pop_trigger_limit = 200

        tokens = split_words(text, jieba_usr_dict=self.jieba_usr_dict)
        tokens_int = [tokenizer.token2id.get(t, tokenizer.unk_id) for t in tokens]

        mini_sents = split_to_mini_sentence(tokens, split_size)
        mini_ids = split_to_mini_sentence(tokens_int, split_size)
        cache_sent: List[str] = []
        cache_ids = np.array([], dtype=np.int32)
        punc_strs: List[str] = []
        words: List[str] = []
        puncs = np.array([], dtype=np.int64)
        vad_pos = len(cache["pre_text"])

        for si in range(len(mini_sents)):
            sent = cache_sent + mini_sents[si]
            ids = np.concatenate([cache_ids, np.asarray(mini_ids[si], np.int32)])
            logits = self._window_logits(params, ids, vad_pos)
            puncs = logits.argmax(-1).astype(np.int64)
            assert len(puncs) == len(sent)

            if si < len(mini_sents) - 1:
                sentence_end = -1
                last_comma = -1
                for i in range(len(puncs) - 2, 1, -1):
                    p = self.punc_list[puncs[i]]
                    if p in ("。", "？"):
                        sentence_end = i
                        break
                    if last_comma < 0 and p == "，":
                        last_comma = i
                if sentence_end < 0 and len(sent) > cache_pop_trigger_limit \
                        and last_comma >= 0:
                    sentence_end = last_comma
                    puncs[sentence_end] = self.sentence_end_id
                cache_sent = sent[sentence_end + 1:]
                cache_ids = ids[sentence_end + 1:]
                sent = sent[: sentence_end + 1]
                puncs = puncs[: sentence_end + 1]

            punc_strs += [self.punc_list[int(x)] for x in puncs]
            words += sent

        # emit only the words past the carried pre-text, with their punctuation
        pieces: List[str] = []
        emitted_punc: List[str] = []
        skip_num = 0
        for i in range(len(words)):
            if i > 0 and len(words[i][0].encode()) == 1 \
                    and len(words[i - 1][-1].encode()) == 1:
                words[i] = " " + words[i]
            if skip_num < vad_pos:
                skip_num += 1
            else:
                pieces.append(words[i])
            if skip_num >= vad_pos:
                emitted_punc.append(punc_strs[i])
                if punc_strs[i] != "_":
                    pieces.append(punc_strs[i])
        sentence_out = "".join(pieces)

        # carry words after the last full stop into the next call
        sentence_end = -1
        for i in range(len(punc_strs) - 2, 1, -1):
            if punc_strs[i] in ("。", "？"):
                sentence_end = i
                break
        cache["pre_text"] = words[sentence_end + 1:]
        if sentence_out and sentence_out[-1] in self.punc_list:
            sentence_out = sentence_out[:-1]
            if emitted_punc:
                emitted_punc[-1] = "_"

        result = [{"key": key[0] if key else "punc", "text": sentence_out,
                   "punc_array": puncs}]
        return result, {}
