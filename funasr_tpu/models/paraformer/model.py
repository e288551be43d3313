"""Paraformer: non-autoregressive ASR (SAN-M encoder -> CIF -> SAN-M NAR decoder).

TPU-native rebuild of the reference model (FunASR ``funasr/models/paraformer/model.py``:
training ``forward:215-284`` = CE(label-smoothed) + predictor MAE (+ optional CTC);
glancing sampler ``sampler:408-467``; inference ``inference:534-697`` = encode ->
predictor -> decoder -> greedy argmax).

Everything on the device path is a pure jittable function over static (bucketed)
shapes: ``forward_jit`` for a training step, ``infer_jit`` for batched decoding that
returns padded token ids + lengths; host code does only tokenization/postprocess.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import make_pad_mask
from funasr_tpu.losses.label_smoothing_loss import label_smoothing_loss, th_accuracy
from funasr_tpu.models.ctc.ctc import CTC
from funasr_tpu.models.paraformer.cif_predictor import mae_token_loss
from funasr_tpu.register import tables
from funasr_tpu.utils.bucket import pad_feats_bucketed


@partial(jax.jit, static_argnames=("self", "max_tokens"))
def _infer_program(self, params, speech, speech_lengths, max_tokens):
    """Module-level jit cache for the public offline decode path: one compiled
    program per (model instance, B-bucket, T-bucket, max_tokens) — the same
    pattern the streaming decoder uses (``decoder.py:21``)."""
    return self.infer_jit(params, speech, speech_lengths, max_tokens)


@partial(jax.jit, static_argnames=("self", "max_tokens"))
def _encode_predict_program(self, params, speech, speech_lengths, max_tokens):
    """Jit cache for encoder+CIF only — the front half used by hotword variants
    (SeACo/Contextual) whose decode stage interleaves host-side logic."""
    encoder_out, encoder_out_lens = self.encode(params, speech, speech_lengths)
    pre_acoustic_embeds, pre_token_length, alphas, peaks = self.calc_predictor(
        params, encoder_out, encoder_out_lens, max_tokens)
    token_lens = jnp.clip(jnp.round(pre_token_length).astype(jnp.int32), 0,
                          pre_acoustic_embeds.shape[1])
    return (encoder_out, encoder_out_lens, pre_acoustic_embeds, token_lens,
            alphas, peaks)


def add_sos_eos_out(ys_pad, ys_lens, eos: int, ignore_id: int = -1):
    """Return ys_out = [text, eos, ignore...] (B, L+1) — the reference's
    ``add_sos_eos`` output side (tokens shifted are not used by the NAR decoder)."""
    b, l = ys_pad.shape
    out = jnp.full((b, l + 1), ignore_id, ys_pad.dtype)
    valid = make_pad_mask(ys_lens, l)
    out = out.at[:, :l].set(jnp.where(valid, ys_pad, ignore_id))
    out = out.at[jnp.arange(b), ys_lens].set(eos)
    return out


@tables.register("model_classes", "Paraformer")
class Paraformer:
    """Config-driven functional model: ``init_params(rng)``, pure jit methods."""

    def __init__(
        self,
        specaug: Optional[str] = None,
        specaug_conf: Optional[Dict] = None,
        normalize: Optional[str] = None,
        normalize_conf: Optional[Dict] = None,
        encoder: str = "SANMEncoder",
        encoder_conf: Optional[Dict] = None,
        decoder: str = "ParaformerSANMDecoder",
        decoder_conf: Optional[Dict] = None,
        predictor: str = "CifPredictorV2",
        predictor_conf: Optional[Dict] = None,
        ctc: str = "CTC",
        ctc_conf: Optional[Dict] = None,
        ctc_weight: float = 0.0,
        input_size: int = 80,
        vocab_size: int = -1,
        ignore_id: int = -1,
        blank_id: int = 0,
        sos: int = 1,
        eos: int = 2,
        lsm_weight: float = 0.0,
        length_normalized_loss: bool = False,
        predictor_weight: float = 1.0,
        predictor_bias: int = 0,
        sampling_ratio: float = 0.2,
        share_embedding: bool = False,
        **kwargs,
    ):
        enc_conf = dict(encoder_conf or {})
        self.encoder = tables.encoder_classes[encoder](input_size=input_size, **enc_conf)
        enc_out = self.encoder.output_size()

        dec_conf = dict(decoder_conf or {})
        self.decoder = tables.decoder_classes[decoder](
            vocab_size=vocab_size, encoder_output_size=enc_out, **dec_conf
        )
        pred_conf = dict(predictor_conf or {})
        self.predictor = tables.predictor_classes[predictor](**pred_conf)

        self.ctc = None
        if ctc_weight > 0.0:
            cc = dict(ctc_conf or {})
            self.ctc = CTC(odim=vocab_size, encoder_output_size=enc_out, **cc)

        self.specaug = None
        if specaug is not None:
            self.specaug = tables.specaug_classes[specaug](**(specaug_conf or {}))
        self.normalize = None
        if normalize is not None:
            self.normalize = tables.normalize_classes[normalize](**(normalize_conf or {}))

        self.vocab_size = vocab_size
        self.ignore_id = ignore_id
        self.blank_id = blank_id
        self.sos = sos if sos is not None else vocab_size - 1
        self.eos = eos if eos is not None else vocab_size - 1
        self.ctc_weight = ctc_weight
        self.lsm_weight = lsm_weight
        self.length_normalized_loss = length_normalized_loss
        self.predictor_weight = predictor_weight
        self.predictor_bias = predictor_bias
        self.sampling_ratio = sampling_ratio
        self.share_embedding = share_embedding
        self.kwargs = kwargs

    # ------------------------------------------------------------------
    # params
    # ------------------------------------------------------------------

    def init_params(self, rng) -> Dict[str, Any]:
        k_enc, k_dec, k_pred, k_ctc = jax.random.split(rng, 4)
        params = {
            "encoder": self.encoder.init(k_enc),
            "decoder": self.decoder.init(k_dec),
            "predictor": self.predictor.init(k_pred),
        }
        if self.ctc is not None:
            params["ctc"] = self.ctc.init(k_ctc)
        return params

    # ------------------------------------------------------------------
    # device path
    # ------------------------------------------------------------------

    def encode(self, params, speech, speech_lengths, rng=None):
        if self.specaug is not None and rng is not None:
            speech, speech_lengths = self.specaug(speech, speech_lengths, rng)
        if self.normalize is not None:
            speech, speech_lengths = self.normalize(speech, speech_lengths)
        return self.encoder(params["encoder"], speech, speech_lengths, rng=rng)

    def calc_predictor(self, params, encoder_out, encoder_out_lens,
                       max_tokens: Optional[int] = None):
        mask = make_pad_mask(encoder_out_lens, encoder_out.shape[1])
        k = max_tokens if max_tokens is not None else encoder_out.shape[1] + 1
        return self.predictor(params["predictor"], encoder_out, mask, k)

    def cal_decoder_with_predictor(self, params, encoder_out, encoder_out_lens,
                                   sematic_embeds, ys_pad_lens):
        logits, olens = self.decoder(params["decoder"], encoder_out, encoder_out_lens,
                                     sematic_embeds, ys_pad_lens)
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), olens

    def _sampler(self, params, rng, encoder_out, encoder_out_lens, ys_pad, ys_pad_lens,
                 pre_acoustic_embeds):
        """Glancing sampler (reference ``sampler:408-467``): replace a random subset of
        CIF embeds with target embeds, sized by first-pass error count."""
        b, l = ys_pad.shape
        tgt_mask = make_pad_mask(ys_pad_lens, l)
        ys_masked = jnp.where(tgt_mask, ys_pad, 0)
        ys_embed = self.decoder.embed(params["decoder"], ys_masked,
                                      dtype=pre_acoustic_embeds.dtype)

        dec_out, _ = self.decoder(
            jax.lax.stop_gradient(params["decoder"]),
            jax.lax.stop_gradient(encoder_out), encoder_out_lens,
            jax.lax.stop_gradient(pre_acoustic_embeds), ys_pad_lens)
        dec_out = jax.lax.stop_gradient(dec_out)
        pred = jnp.argmax(dec_out, -1)
        nonpad = ys_pad != self.ignore_id
        seq_lens = jnp.sum(nonpad, 1)
        same = jnp.sum((pred == ys_pad) & nonpad, 1)
        target_num = ((seq_lens - same).astype(jnp.float32)
                      * self.sampling_ratio).astype(jnp.int32)

        # choose target_num random valid positions per row: random scores, rank < n
        u = jax.random.uniform(rng, (b, l))
        u = jnp.where(nonpad, u, jnp.inf)
        rank = jnp.argsort(jnp.argsort(u, axis=1), axis=1)
        replace = (rank < target_num[:, None]) & nonpad

        sematic = jnp.where(replace[..., None], ys_embed, pre_acoustic_embeds)
        sematic = sematic * tgt_mask[..., None].astype(sematic.dtype)
        return sematic, dec_out * tgt_mask[..., None]

    def forward_jit(self, params, speech, speech_lengths, text, text_lengths, rng):
        """One training step's loss. All args are device arrays; fully jittable.

        Returns (loss, stats dict of scalars, weight) — the (loss, stats, weight)
        contract of the reference ``forward:215-284``.
        """
        batch_size = speech.shape[0]
        k_enc, k_smp = jax.random.split(rng)
        encoder_out, encoder_out_lens = self.encode(params, speech, speech_lengths,
                                                    rng=k_enc)
        stats = {}

        loss_ctc = 0.0
        if self.ctc is not None and self.ctc_weight > 0.0:
            loss_ctc = self.ctc.loss(params["ctc"], encoder_out, encoder_out_lens,
                                     text, text_lengths)
            stats["loss_ctc"] = loss_ctc

        ys_pad, ys_pad_lens = text, text_lengths
        if self.predictor_bias == 1:
            ys_pad = add_sos_eos_out(text, text_lengths, self.eos, self.ignore_id)
            ys_pad_lens = text_lengths + 1
        elif self.predictor_bias == 2:
            # [sos] + y + [eos] (reference add_sos_and_eos, used by EParaformer)
            b, l = text.shape
            ys = jnp.concatenate(
                [jnp.full((b, 1), self.sos, text.dtype), text,
                 jnp.full((b, 1), self.ignore_id, text.dtype)], axis=1)
            pos = jnp.arange(l + 2)[None]
            eos_pos = (text_lengths + 1)[:, None]
            ys = jnp.where(pos == eos_pos, self.eos, ys)
            ys_pad = jnp.where(pos > eos_pos, self.ignore_id, ys)
            ys_pad_lens = text_lengths + 2

        mask = make_pad_mask(encoder_out_lens, encoder_out.shape[1])
        max_tok = ys_pad.shape[1]
        pre_acoustic_embeds, pre_token_length, _, _ = self.predictor(
            params["predictor"], encoder_out, mask, max_tok,
            target_length=ys_pad_lens)

        if self.sampling_ratio > 0.0:
            sematic_embeds, dec_out_1st = self._sampler(
                params, k_smp, encoder_out, encoder_out_lens, ys_pad, ys_pad_lens,
                pre_acoustic_embeds)
        else:
            sematic_embeds, dec_out_1st = pre_acoustic_embeds, None

        decoder_out, _ = self.decoder(params["decoder"], encoder_out, encoder_out_lens,
                                      sematic_embeds, ys_pad_lens)
        if dec_out_1st is None:
            dec_out_1st = decoder_out

        loss_att = label_smoothing_loss(
            decoder_out, ys_pad, ignore_id=self.ignore_id, smoothing=self.lsm_weight,
            vocab_size=self.vocab_size,
            normalize_length=self.length_normalized_loss)
        loss_pre = mae_token_loss(ys_pad_lens, pre_token_length)
        acc_att = th_accuracy(dec_out_1st, ys_pad, self.ignore_id)

        if self.ctc is not None and self.ctc_weight > 0.0:
            loss = (self.ctc_weight * loss_ctc + (1 - self.ctc_weight) * loss_att
                    + loss_pre * self.predictor_weight)
        else:
            loss = loss_att + loss_pre * self.predictor_weight

        stats.update({"loss_att": loss_att, "loss_pre": loss_pre, "acc": acc_att,
                      "loss": loss, "batch_size": batch_size})
        weight = (jnp.sum(text_lengths + self.predictor_bias)
                  if self.length_normalized_loss else batch_size)
        return loss, stats, weight

    def infer_core(self, params, speech, speech_lengths,
                   max_tokens: Optional[int] = None):
        """Batched greedy decode, returning the encoder output too so subclasses
        (BiCif timestamps, SeACo) can extend the program without re-encoding."""
        encoder_out, encoder_out_lens = self.encode(params, speech, speech_lengths)
        pre_acoustic_embeds, pre_token_length, alphas, peaks = self.calc_predictor(
            params, encoder_out, encoder_out_lens, max_tokens)
        token_lens = jnp.round(pre_token_length).astype(jnp.int32)
        k = pre_acoustic_embeds.shape[1]
        token_lens = jnp.clip(token_lens, 0, k)
        decoder_out, _ = self.cal_decoder_with_predictor(
            params, encoder_out, encoder_out_lens, pre_acoustic_embeds, token_lens)
        yseq = jnp.argmax(decoder_out, -1).astype(jnp.int32)
        tok_valid = make_pad_mask(token_lens, k)
        score = jnp.sum(jnp.max(decoder_out, -1) * tok_valid, -1)
        yseq = jnp.where(tok_valid, yseq, self.blank_id)
        return (yseq, token_lens, score, alphas, peaks,
                encoder_out, encoder_out_lens)

    def infer_jit(self, params, speech, speech_lengths,
                  max_tokens: Optional[int] = None):
        """Batched greedy decode. Returns (token_ids (B,K), token_lens (B,),
        am_score_sums (B,), alphas (B,T+1), peaks (B,T+1)) — all static shapes."""
        return self.infer_core(params, speech, speech_lengths, max_tokens)[:5]

    # ------------------------------------------------------------------
    # host orchestration (AutoModel contract)
    # ------------------------------------------------------------------

    # static decoder token budget per T-bucket: CIF fires ~T/6 tokens on real
    # speech (LFR6 frames are 60 ms; speaking rate < ~8 tokens/s), so T/2+16
    # is a ~3x margin that still halves decoder cross-attention work vs T+1
    MAX_TOKENS_RATIO = 0.5

    def _max_tokens_for(self, t_bucket: int) -> int:
        return min(int(t_bucket * self.MAX_TOKENS_RATIO) + 16, t_bucket + 1)

    def infer_bucketed(self, params, speech, speech_lengths):
        """Public decode path: pad (B, T) to bucket grid, run the cached jitted
        program, slice back to the real batch. If any utterance saturates the
        static token budget (pathological audio), rerun with the full T+1
        budget so the transcript is never truncated.

        Returns the ``infer_jit`` tuple as numpy arrays sliced to the real B.
        """
        sp, ln, b = pad_feats_bucketed(speech, speech_lengths)
        mt = self._max_tokens_for(sp.shape[1])
        out = _infer_program(self, params, sp, ln, mt)
        # ONE device_get for all outputs: separate np.asarray calls each pay a
        # host<->device roundtrip, which dominates on tunneled transports
        host = jax.device_get(out)
        token_lens = host[1]
        if mt <= sp.shape[1] and (token_lens[:b] >= mt).any():
            logging.warning("CIF token count hit the %d-token bucket budget; "
                            "re-decoding with the full budget", mt)
            host = jax.device_get(
                _infer_program(self, params, sp, ln, sp.shape[1] + 1))
        return tuple(np.asarray(x)[:b] for x in host)

    def encode_predict_bucketed(self, params, speech, speech_lengths):
        """Bucketed + jit-cached encoder+CIF front half. Returns DEVICE arrays
        (encoder_out, encoder_out_lens, pre_acoustic_embeds, token_lens, alphas,
        peaks) still on the padded batch, plus the real batch size — downstream
        eager stages keep working on-device and slice at the end."""
        sp, ln, b = pad_feats_bucketed(speech, speech_lengths)
        mt = self._max_tokens_for(sp.shape[1])
        out = _encode_predict_program(self, params, sp, ln, mt)
        token_lens = np.asarray(out[3])
        if mt <= sp.shape[1] and (token_lens[:b] >= mt).any():
            logging.warning("CIF token count hit the %d-token bucket budget; "
                            "re-encoding with the full budget", mt)
            out = _encode_predict_program(self, params, sp, ln, sp.shape[1] + 1)
        return out + (b,)

    def inference(self, params, data_in, data_lengths=None, key=None, tokenizer=None,
                  frontend=None, **kwargs):
        """Host-level inference mirroring the reference contract
        (``model.py:534-697``): load audio -> frontend -> jitted decode -> detokenize.
        """
        return self.inference_fetch(self.inference_dispatch(
            params, data_in, data_lengths=data_lengths, key=key,
            tokenizer=tokenizer, frontend=frontend, **kwargs))

    def inference_dispatch(self, params, data_in, data_lengths=None, key=None,
                           tokenizer=None, frontend=None, **kwargs):
        """Upload + async dispatch half of :meth:`inference` — returns an
        opaque handle for :meth:`inference_fetch` WITHOUT blocking on device
        results. The AutoModel batch loop uses the pair to double-buffer:
        batch k+1's host->device upload overlaps batch k's compute+fetch, so
        multi-batch jobs cost max(IO, compute) per batch instead of the sum
        (reference role: the production batch loop at
        ``funasr/auto/auto_model.py:796-838``)."""
        from funasr_tpu.utils.load_utils import extract_fbank, load_audio_text_image_video
        import time

        meta_data = {}
        t0 = time.perf_counter()
        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs if frontend else 16000,
            audio_fs=kwargs.get("fs", 16000),
            data_type=kwargs.get("data_type", "sound"))
        t1 = time.perf_counter()
        meta_data["load_data"] = f"{t1 - t0:0.3f}"
        speech, speech_lengths = extract_fbank(
            audio_list, data_type=kwargs.get("data_type", "sound"),
            frontend=frontend, device=True)
        t2 = time.perf_counter()
        meta_data["extract_feat"] = f"{t2 - t1:0.3f}"
        meta_data["batch_data_time"] = (
            float(np.sum(speech_lengths)) * frontend.frame_shift_ms
            * frontend.lfr_n / 1000.0)

        sp, ln, b = pad_feats_bucketed(speech, speech_lengths)
        mt = self._max_tokens_for(sp.shape[1])
        out = _infer_program(self, params, sp, ln, mt)
        return {"out": out, "b": b, "sp": sp, "ln": ln, "mt": mt,
                "params": params, "key": key, "tokenizer": tokenizer,
                "kwargs": kwargs, "meta": meta_data}

    def inference_fetch(self, handle):
        """Blocking half of the dispatch/fetch pair: device_get + budget-retry
        + detokenize. Returns the (results, meta) tuple of :meth:`inference`."""
        from funasr_tpu.utils import postprocess_utils

        b, sp, mt = handle["b"], handle["sp"], handle["mt"]
        tokenizer, key, kwargs = (handle["tokenizer"], handle["key"],
                                  handle["kwargs"])
        meta_data = handle["meta"]
        # ONE device_get for all outputs: separate np.asarray calls each pay
        # a host<->device roundtrip, which dominates on tunneled transports
        host = jax.device_get(handle["out"])
        token_lens_all = host[1]
        if mt <= sp.shape[1] and (token_lens_all[:b] >= mt).any():
            logging.warning("CIF token count hit the %d-token bucket budget; "
                            "re-decoding with the full budget", mt)
            host = jax.device_get(_infer_program(
                self, handle["params"], sp, handle["ln"], sp.shape[1] + 1))
        yseq, token_lens, score, alphas, peaks = tuple(
            np.asarray(x)[:b] for x in host)

        results = []
        if key is None:
            key = [f"rand_key_{i}" for i in range(b)]
        for i in range(b):
            token_int = [int(t) for t in yseq[i, : token_lens[i]]
                         if t not in (self.blank_id, self.sos, self.eos)]
            if tokenizer is not None:
                token = tokenizer.ids2tokens(token_int)
                text = tokenizer.tokens2text(token)
                if kwargs.get("pred_timestamp", False):
                    from funasr_tpu.utils.timestamp_tools import ts_prediction_lfr6_standard
                    _, timestamp = ts_prediction_lfr6_standard(
                        np.asarray(peaks[i]), np.asarray(alphas[i]), list(token),
                        vad_offset=kwargs.get("begin_time", 0), upsample_rate=1)
                    text, timestamp, _ = postprocess_utils.sentence_postprocess(
                        token, timestamp)
                    results.append({"key": key[i], "text": text,
                                    "timestamp": timestamp})
                else:
                    if not hasattr(tokenizer, "bpemodel"):
                        text, _ = postprocess_utils.sentence_postprocess(token)
                    results.append({"key": key[i], "text": text})
            else:
                results.append({"key": key[i], "token_int": token_int})
        return results, meta_data
