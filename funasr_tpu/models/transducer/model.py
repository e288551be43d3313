"""Transducer (RNN-T) ASR: encoder + LSTM prediction net + joint network.

TPU-native rebuild of FunASR ``funasr/models/transducer/model.py:39`` (+ joint
network): training = RNN-T lattice loss (``funasr_tpu.ops.rnnt_loss``); inference =
batched greedy transducer decode as a host loop over a jitted per-frame step.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import (
    embedding_apply, embedding_init, linear_apply, linear_init, lstm_apply,
    lstm_init, lstm_step)
from funasr_tpu.ops.rnnt_loss import rnnt_loss
from funasr_tpu.register import tables


class JointNetwork:
    """joint(enc, pred) = W_out tanh(W_enc enc + W_pred pred)
    (reference joint_network conventions)."""

    def __init__(self, vocab_size: int, encoder_size: int, decoder_size: int,
                 joint_space_size: int = 640):
        self.vocab_size = vocab_size
        self.encoder_size = encoder_size
        self.decoder_size = decoder_size
        self.joint_space = joint_space_size

    def init(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        return {"lin_enc": linear_init(k1, self.encoder_size, self.joint_space),
                "lin_dec": linear_init(k2, self.decoder_size, self.joint_space),
                "lin_out": linear_init(k3, self.joint_space, self.vocab_size)}

    def __call__(self, params, enc, dec):
        """enc: (..., E), dec: (..., D) broadcastable -> (..., V)."""
        h = jnp.tanh(linear_apply(params["lin_enc"], enc)
                     + linear_apply(params["lin_dec"], dec))
        return linear_apply(params["lin_out"], h)


@partial(jax.jit,
         static_argnames=("self", "max_symbols_per_step", "max_tokens"))
def _transducer_greedy_jit(self, params, enc, enc_lens, pred0, states0,
                           max_symbols_per_step, max_tokens):
    return self._greedy_decode_jit_impl(params, enc, enc_lens, pred0, states0,
                                        max_symbols_per_step, max_tokens)


@tables.register("model_classes", "Transducer")
class Transducer:
    def __init__(self, encoder: str = "ConformerEncoder", encoder_conf=None,
                 decoder_conf=None, joint_network_conf=None, specaug=None,
                 specaug_conf=None, input_size: int = 80, vocab_size: int = -1,
                 blank_id: int = 0, ignore_id: int = -1, **kwargs):
        import funasr_tpu.models.conformer.model  # noqa: F401 (registers encoder)
        self.encoder = tables.encoder_classes[encoder](input_size=input_size,
                                                       **(encoder_conf or {}))
        enc_out = self.encoder.output_size()
        dec_conf = dict(decoder_conf or {})
        self.embed_size = dec_conf.get("embed_size", 256)
        self.hidden_size = dec_conf.get("hidden_size", 256)
        self.num_layers = dec_conf.get("num_layers", 1)
        jn_conf = dict(joint_network_conf or {})
        self.joint = JointNetwork(vocab_size, enc_out, self.hidden_size,
                                  jn_conf.get("joint_space_size", 640))
        self.specaug = (tables.specaug_classes[specaug](**(specaug_conf or {}))
                        if specaug else None)
        self.vocab_size = vocab_size
        self.blank_id = blank_id
        self.ignore_id = ignore_id

    def init_params(self, rng):
        keys = jax.random.split(rng, 3 + self.num_layers)
        return {
            "encoder": self.encoder.init(keys[0]),
            "embed": embedding_init(keys[1], self.vocab_size, self.embed_size),
            "pred_lstm": [lstm_init(keys[2 + i],
                                    self.embed_size if i == 0 else self.hidden_size,
                                    self.hidden_size)
                          for i in range(self.num_layers)],
            "joint": self.joint.init(keys[-1]),
        }

    def _predict(self, params, ys):
        """(B, U) label prefix (with leading blank) -> (B, U, H)."""
        x = embedding_apply(params["embed"], ys)
        for lp in params["pred_lstm"]:
            x = lstm_apply(lp, x)
        return x

    def _predict_init(self, batch: int = 1):
        return [(jnp.zeros((batch, self.hidden_size), jnp.float32),
                 jnp.zeros((batch, self.hidden_size), jnp.float32))
                for _ in range(self.num_layers)]

    def _predict_step(self, params, token, states):
        """One prediction-network step: token (B,) -> ((B, H), new states)."""
        x = embedding_apply(params["embed"], token[:, None])[:, 0]
        new_states = []
        for lp, st in zip(params["pred_lstm"], states):
            x, st = lstm_step(lp, x, st)
            new_states.append(st)
        return x, new_states

    def forward_jit(self, params, speech, speech_lengths, text, text_lengths, rng):
        if self.specaug is not None and rng is not None:
            speech, speech_lengths = self.specaug(speech, speech_lengths, rng)
        enc, enc_lens = self.encoder(params["encoder"], speech, speech_lengths,
                                     rng=rng)
        b, u = text.shape
        tgt = jnp.where(jnp.arange(u)[None] < text_lengths[:, None], text, 0)
        ys_in = jnp.concatenate(
            [jnp.full((b, 1), self.blank_id, tgt.dtype), tgt], axis=1)
        pred = self._predict(params, ys_in)  # (B, U+1, H)
        logits = self.joint(params["joint"], enc[:, :, None, :],
                            pred[:, None, :, :])  # (B, T, U+1, V)
        nll = rnnt_loss(logits, tgt, enc_lens, text_lengths, self.blank_id)
        loss = jnp.mean(nll)
        return loss, {"loss": loss}, b

    # ------------------------------------------------------------------

    def greedy_decode(self, params, enc, enc_lens, max_symbols_per_step: int = 3):
        """Batched greedy transducer decode as ONE jitted lax.scan over frames
        (bounded inner symbol loop with emit masking) — the per-frame host
        loop paid thousands of device dispatches per utterance. Matches the
        host oracle (`_greedy_decode_host`) token-for-token."""
        enc = jnp.asarray(enc)
        b, tmax, _ = enc.shape
        max_tokens = tmax * max_symbols_per_step
        states0 = self._predict_init(b)
        pred0, states0 = self._predict_step(
            params, jnp.full((b,), self.blank_id, jnp.int32), states0)
        out, n, _, _ = _transducer_greedy_jit(
            self, params, enc, jnp.asarray(enc_lens, jnp.int32), pred0,
            states0, max_symbols_per_step, max_tokens)
        out, n = np.asarray(out), np.asarray(n)
        return [[int(x) for x in out[i, : n[i]]] for i in range(b)]

    def _greedy_decode_jit_impl(self, params, enc, enc_lens, pred0, states0,
                                max_symbols_per_step, max_tokens):
        b = enc.shape[0]
        out0 = jnp.zeros((b, max_tokens), jnp.int32)
        n0 = jnp.zeros((b,), jnp.int32)
        rows = jnp.arange(b)

        def frame_step(carry, inp):
            pred, states, out, n = carry
            enc_t, t_idx = inp
            active0 = t_idx < enc_lens

            def sym_step(c, _):
                pred, states, out, n, active = c
                logits = self.joint(params["joint"], enc_t, pred)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                emit = active & (tok != self.blank_id) & (n < max_tokens)
                idx = jnp.minimum(n, max_tokens - 1)
                out = out.at[rows, idx].set(
                    jnp.where(emit, tok, out[rows, idx]))
                n = n + emit.astype(jnp.int32)
                new_pred, new_states = self._predict_step(params, tok, states)
                pred = jnp.where(emit[:, None], new_pred, pred)
                states = [(jnp.where(emit[:, None], h2, h1),
                           jnp.where(emit[:, None], c2, c1))
                          for (h1, c1), (h2, c2) in zip(states, new_states)]
                return (pred, states, out, n, emit), None

            (pred, states, out, n, _), _ = jax.lax.scan(
                sym_step, (pred, states, out, n, active0), None,
                length=max_symbols_per_step)
            return (pred, states, out, n), None

        (pred, states, out, n), _ = jax.lax.scan(
            frame_step, (pred0, states0, out0, n0),
            (enc.swapaxes(0, 1), jnp.arange(enc.shape[1])))
        return out, n, pred, states

    def _greedy_decode_host(self, params, enc, enc_lens,
                            max_symbols_per_step: int = 3):
        """Host greedy transducer decode, one utterance at a time (the parity
        oracle for the jitted scan)."""
        enc = np.asarray(enc)
        results = []
        for i in range(enc.shape[0]):
            tokens: List[int] = []
            states = self._predict_init(1)
            pred, states = self._predict_step(
                params, jnp.full((1,), self.blank_id, jnp.int32), states)
            for t in range(int(enc_lens[i])):
                for _ in range(max_symbols_per_step):
                    logits = self.joint(params["joint"],
                                        jnp.asarray(enc[i, t])[None], pred)
                    tok = int(jnp.argmax(logits[0]))
                    if tok == self.blank_id:
                        break
                    tokens.append(tok)
                    pred, states = self._predict_step(
                        params, jnp.full((1,), tok, jnp.int32), states)
            results.append(tokens)
        return results

    # ------------------------------------------------------------------
    # streaming (stateful chunked encoder + incremental greedy)
    # ------------------------------------------------------------------

    def init_stream(self, params, batch: int = 1):
        """Streaming state for decode_chunk (requires an encoder with
        init_cache/forward_chunk, e.g. ChunkConformerEncoder — the
        cache-based stateful inference recipe of arXiv 2312.17279)."""
        if not hasattr(self.encoder, "forward_chunk"):
            raise ValueError(f"encoder {type(self.encoder).__name__} has no "
                             "forward_chunk; use ChunkConformerEncoder")
        states = self._predict_init(batch)
        pred, states = self._predict_step(
            params, jnp.full((batch,), self.blank_id, jnp.int32), states)
        return {
            "encoder": self.encoder.init_cache(batch),
            "tokens": [[] for _ in range(batch)],
            "pred_states": states,
            "preds": pred,
        }

    def decode_chunk(self, params, chunk, state, max_symbols_per_step: int = 3):
        """chunk: (B, chunk_size, D) features -> newly emitted tokens per
        utterance. The prediction-network prefix continues across chunks (the
        batched carried pred/states feed the same jitted scan as offline
        greedy), so concatenating per-chunk emissions equals offline greedy
        over the same chunk-causal encoder output — at one XLA call per chunk
        instead of a per-frame dispatch loop."""
        enc, state["encoder"] = self.encoder.forward_chunk(
            params["encoder"], jnp.asarray(chunk), state["encoder"])
        b, t_chunk = enc.shape[0], enc.shape[1]
        out, n, pred, states = _transducer_greedy_jit(
            self, params, enc, jnp.full((b,), t_chunk, jnp.int32),
            state["preds"], state["pred_states"], max_symbols_per_step,
            t_chunk * max_symbols_per_step)
        state["preds"] = pred
        state["pred_states"] = states
        out, n = np.asarray(out), np.asarray(n)
        new_tokens = []
        for i in range(b):
            emitted = [int(x) for x in out[i, : n[i]]]
            state["tokens"][i].extend(emitted)
            new_tokens.append(emitted)
        return new_tokens, state

    def inference(self, params, data_in, data_lengths=None, key: Optional[List] = None,
                  tokenizer=None, frontend=None, **kwargs):
        from funasr_tpu.utils import postprocess_utils
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)

        meta: Dict = {}
        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs, audio_fs=kwargs.get("fs", 16000))
        speech, speech_lengths = extract_fbank(audio_list, frontend=frontend)
        enc, enc_lens = self.encoder(params["encoder"], jnp.asarray(speech),
                                     jnp.asarray(speech_lengths))
        token_lists = self.greedy_decode(params, enc, np.asarray(enc_lens))
        if key is None:
            key = [f"rand_key_{i}" for i in range(len(token_lists))]
        results = []
        for i, ids in enumerate(token_lists):
            if tokenizer is not None:
                token = tokenizer.ids2tokens(ids)
                text, _ = postprocess_utils.sentence_postprocess(token)
                results.append({"key": key[i], "text": text})
            else:
                results.append({"key": key[i], "token_int": ids})
        return results, meta


@tables.register("decoder_classes", "rnnt_decoder")
@tables.register("decoder_classes", "RNNTDecoder")
class RNNTDecoder:
    """Standalone transducer prediction network (reference
    ``transducer/rnnt_decoder.py:15``): embedding + LSTM stack over the label
    prefix. The Transducer model embeds the same network inline; this class
    exposes it under the reference decoder name for configs that build it
    separately."""

    def __init__(self, vocab_size: int, embed_size: int = 256,
                 hidden_size: int = 256, num_layers: int = 1, **kwargs):
        self.vocab_size = vocab_size
        self.embed_size = embed_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers

    def output_size(self):
        return self.hidden_size

    def init(self, rng):
        keys = jax.random.split(rng, self.num_layers + 1)
        return {
            "embed": embedding_init(keys[0], self.vocab_size, self.embed_size),
            "pred_lstm": [lstm_init(keys[1 + i],
                                    self.embed_size if i == 0 else self.hidden_size,
                                    self.hidden_size)
                          for i in range(self.num_layers)],
        }

    def __call__(self, params, ys, ys_lens=None):
        x = embedding_apply(params["embed"], ys)
        for lp in params["pred_lstm"]:
            x = lstm_apply(lp, x)
        return x, ys_lens

