"""CT-Transformer punctuation restoration (comma/period/question over raw token
streams), controllable time-delay transformer (arXiv 2003.01309).

TPU-native rebuild of the reference (FunASR ``funasr/models/ct_transformer/model.py``:
``punc_forward:113`` = embed -> SANM encoder -> linear punc head; ``inference:290+`` =
20-word sliding mini-sentence windows with sentence-boundary cache carried between
windows; output {"key", "text", "punc_array"} with ids {1:_,2:，,3:。,4:？,...}).

The per-window forward is jitted with bucketed window lengths; the window/cache logic
stays host-side.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import (
    embedding_apply,
    embedding_init,
    linear_apply,
    linear_init,
)
from funasr_tpu.models.ct_transformer.utils import split_to_mini_sentence, split_words
from funasr_tpu.register import tables
from funasr_tpu.utils.bucket import bucket_length


@tables.register("model_classes", "CTTransformer")
class CTTransformer:
    """Output: {"key", "text" (punctuated), "punc_array" np.ndarray}."""

    def __init__(self, encoder: str = "SANMEncoder", encoder_conf: Optional[dict] = None,
                 vocab_size: int = -1, punc_list: Optional[list] = None,
                 punc_weight: Optional[list] = None, embed_unit: int = 128,
                 att_unit: int = 256, ignore_id: int = -1, sos: int = 1, eos: int = 2,
                 sentence_end_id: int = 3, **kwargs):
        self.punc_list = punc_list or ["<unk>", "_", "，", "。", "？", "、"]
        self.punc_weight = punc_weight or [1.0] * len(self.punc_list)
        self.vocab_size = vocab_size
        self.embed_unit = embed_unit
        self.att_unit = att_unit
        self.ignore_id = ignore_id
        self.sentence_end_id = sentence_end_id
        enc_conf = dict(encoder_conf or {})
        enc_conf.setdefault("input_size", embed_unit)
        self.encoder = tables.encoder_classes[encoder](**enc_conf)
        self.jieba_usr_dict = None
        if kwargs.get("jieba_usr_dict"):
            try:
                import jieba
                jieba.load_userdict(kwargs["jieba_usr_dict"])
                self.jieba_usr_dict = jieba
            except ImportError:
                pass
        self._jit_forward = jax.jit(self._forward)

    def init_params(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "embed": embedding_init(k1, self.vocab_size, self.embed_unit),
            "encoder": self.encoder.init(k2),
            "decoder": linear_init(k3, self.att_unit, len(self.punc_list)),
        }

    def _forward(self, params, text, text_lengths):
        x = embedding_apply(params["embed"], text)
        h, _ = self.encoder(params["encoder"], x, text_lengths)
        return linear_apply(params["decoder"], h)

    def punc_forward(self, params, text, text_lengths):
        """(B, L) ids -> (B, L, punc) logits; jitted, bucketed length."""
        return self._jit_forward(params, jnp.asarray(text), jnp.asarray(text_lengths))

    def forward_jit(self, params, text, punc, text_lengths, rng=None):
        """Training loss: weighted CE over punc ids with padding ignore."""
        logits = self._forward(params, text, text_lengths)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        valid = punc != self.ignore_id
        tgt = jnp.where(valid, punc, 0)
        w = jnp.asarray(self.punc_weight, jnp.float32)[tgt]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0] * w * valid
        ntokens = jnp.sum(valid)
        loss = jnp.sum(nll) / jnp.maximum(ntokens, 1)
        return loss, {"loss": loss}, ntokens

    # ------------------------------------------------------------------

    def _window_logits(self, params, ids: np.ndarray) -> np.ndarray:
        n = len(ids)
        nb = bucket_length(n, minimum=8, multiple=8)
        padded = np.zeros((1, nb), np.int32)
        padded[0, :n] = ids
        y = self.punc_forward(params, padded, np.asarray([n], np.int32))
        return np.asarray(y)[0, :n]

    def inference(self, params, data_in, data_lengths=None, key: Optional[list] = None,
                  tokenizer=None, frontend=None, **kwargs):
        """Sliding 20-word window punctuation with sentence-boundary cache
        (reference ``inference:290+`` semantics, restructured)."""
        assert len(data_in) == 1 if isinstance(data_in, list) else True
        text = data_in[0] if isinstance(data_in, list) else data_in
        if not text or not str(text).strip():
            return [{"key": key[0] if key else "", "text": "",
                     "punc_array": None}], {"batch_data_time": -1}

        split_size = kwargs.get("split_size", 20)
        cache_pop_trigger_limit = 200

        tokens = split_words(text, jieba_usr_dict=self.jieba_usr_dict)
        tokens_int = tokenizer.encode(" ".join(tokens)) if hasattr(
            tokenizer, "seg_dict") and tokenizer.seg_dict else [
            tokenizer.token2id.get(t, tokenizer.unk_id) for t in tokens]

        mini_sents = split_to_mini_sentence(tokens, split_size)
        mini_ids = split_to_mini_sentence(tokens_int, split_size)
        cache_sent: List[str] = []
        cache_ids = np.array([], dtype=np.int32)
        out_text = ""
        punc_array: Optional[np.ndarray] = None

        def is_ascii(w):
            return len(w[0].encode()) == 1

        for si in range(len(mini_sents)):
            sent = cache_sent + mini_sents[si]
            ids = np.concatenate([cache_ids, np.asarray(mini_ids[si], np.int32)])
            logits = self._window_logits(params, ids)
            puncs = logits.argmax(-1).astype(np.int64)
            assert len(puncs) == len(sent)

            if si < len(mini_sents) - 1:
                # carry words after the last sentence end into the next window
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

            # assemble surface text (capitalization + latin punctuation forms)
            pieces = []
            for i, w in enumerate(sent):
                if (i == 0 or self.punc_list[puncs[i - 1]] in ("。", "？")) \
                        and is_ascii(w):
                    w = w.capitalize()
                if is_ascii(w) and (i == 0 or is_ascii(sent[i - 1])):
                    w = " " + w
                pieces.append(w)
                p = self.punc_list[puncs[i]]
                if p != "_":
                    if is_ascii(sent[i]):
                        p = {"，": ",", "。": ".", "？": "?"}.get(p, p)
                    pieces.append(p)
            out_text += "".join(pieces)

            if si == len(mini_sents) - 1 and out_text:
                # force a sentence end at the very end
                if out_text[-1] in ("，", "、"):
                    out_text = out_text[:-1] + "。"
                    if len(puncs):
                        puncs[-1] = self.sentence_end_id
                elif out_text[-1] == ",":
                    out_text = out_text[:-1] + "."
                    if len(puncs):
                        puncs[-1] = self.sentence_end_id
                elif out_text[-1] not in ("。", "？") and len(out_text[-1].encode()) != 1:
                    out_text += "。"
                    if len(puncs):
                        puncs[-1] = self.sentence_end_id
                elif out_text[-1] not in (".", "?") and len(out_text[-1].encode()) == 1:
                    out_text += "."
                    if len(puncs):
                        puncs[-1] = self.sentence_end_id

            punc_array = puncs if punc_array is None else np.concatenate(
                [punc_array, puncs])

        result = [{"key": key[0] if key else "punc",
                   "text": out_text, "punc_array": punc_array}]
        return result, {}
