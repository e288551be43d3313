"""SOND: speaker overlap-aware neural diarization, and the x-vector SV model.

TPU-native rebuilds of FunASR ``funasr/models/sond/e2e_diar_sond.py:45``
(DiarSondModel: speech encoder + speaker encoder + context-independent /
context-dependent scorers + FSMN post-net emitting power-set-encoded labels,
arXiv:2211.10243 / TOLD arXiv:2303.05397) and ``funasr/models/xvector/e2e_sv.py``
(TDNN x-vector speaker embedding).

Everything on the hot path is pure-functional and jittable: PSE label
construction, the three losses (label-smoothed PSE CE, speaker-discrimination,
internal CI/CD BCE — ref ``e2e_diar_sond.py:267-281``) and the DER counters are
all expressed as jnp ops, so the full training step compiles to one XLA program.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import linear_apply, linear_init, make_pad_mask
from funasr_tpu.losses.label_smoothing_loss import label_smoothing_loss
from funasr_tpu.models.campplus.components import stats_pool, tdnn_layer_apply, \
    tdnn_layer_init
from funasr_tpu.register import tables


@tables.register("model_classes", "XVector")
@tables.register("model_classes", "ESPnetSVModel")
class XVector:
    """TDNN x-vector: 5 dilated TDNN layers -> stats pool -> embedding."""

    TDNN_PLAN = [(512, 5, 1), (512, 3, 2), (512, 3, 3), (512, 1, 1), (1500, 1, 1)]

    def __init__(self, input_size: int = 80, embedding_size: int = 512, **kwargs):
        self.input_size = input_size
        self.embedding_size = embedding_size

    def init_params(self, rng):
        keys = jax.random.split(rng, len(self.TDNN_PLAN) + 1)
        layers = []
        c_in = self.input_size
        for i, (dim, k, d) in enumerate(self.TDNN_PLAN):
            layers.append(tdnn_layer_init(keys[i], c_in, dim, k))
            c_in = dim
        return {"tdnn": layers,
                "embedding": linear_init(keys[-1], c_in * 2, self.embedding_size)}

    def forward(self, params, feats):
        h = feats
        for lp, (dim, k, d) in zip(params["tdnn"], self.TDNN_PLAN):
            h = tdnn_layer_apply(lp, h, kernel=k, dilation=d)
        pooled = stats_pool(h)
        return linear_apply(params["embedding"], pooled)

    def inference(self, params, data_in, data_lengths=None, key=None,
                  tokenizer=None, frontend=None, **kwargs):
        from funasr_tpu.ops.fbank import fbank
        from funasr_tpu.utils.load_utils import (as_pcm16_f32,
                                                 load_audio_text_image_video)
        audio_list = load_audio_text_image_video(
            data_in, fs=16000, audio_fs=kwargs.get("fs", 16000))
        feats = []
        maxlen = 0
        for au in audio_list:
            f = np.asarray(fbank(jnp.asarray(as_pcm16_f32(au)),
                                 num_mel_bins=self.input_size))
            f = f - f.mean(0, keepdims=True)
            feats.append(f)
            maxlen = max(maxlen, f.shape[0])
        batch = np.zeros((len(feats), maxlen, self.input_size), np.float32)
        for i, f in enumerate(feats):
            batch[i, : f.shape[0]] = f
        embs = np.asarray(self.forward(params, jnp.asarray(batch)))
        return [{"spk_embedding": embs}], {}


def int2vec(x: int, vec_dim: int) -> np.ndarray:
    """Little-endian bit vector of ``x`` (ref ``funasr/utils/misc.py:27``)."""
    return np.array([(x >> i) & 1 for i in range(vec_dim)], np.float32)


def label_aggregate(labels, lengths, win_length: int = 512,
                    hop_length: int = 128, center: bool = True):
    """STFT-compatible framing of sample-level binary labels
    (ref ``funasr/models/sond/label_aggregation.py:8-88``).

    labels: (B, Nsamples, N) 0/1 -> (B, nframe, N) where a frame is active if
    more than half its window is. The reference materialises strided windows;
    here one cumsum gives every window sum (O(N), jittable).
    """
    b, t, n = labels.shape
    if center:
        pad = win_length // 2
        # the reference zero-pads then copies the edge windows inward, which
        # equals duplicating the first/last ``pad`` samples
        labels = jnp.concatenate(
            [labels[:, :pad], labels, labels[:, -pad:]], axis=1)
        t = t + 2 * pad
    nframe = (t - win_length) // hop_length + 1
    cs = jnp.concatenate(
        [jnp.zeros((b, 1, n), jnp.float32),
         jnp.cumsum(labels.astype(jnp.float32), axis=1)], axis=1)
    starts = jnp.arange(nframe) * hop_length
    wsum = cs[:, starts + win_length] - cs[:, starts]
    out = (wsum > win_length // 2).astype(jnp.float32)
    if lengths is not None:
        if center:
            lengths = lengths + 2 * (win_length // 2)
        olens = (lengths - win_length) // hop_length + 1
        out = out * make_pad_mask(olens, nframe)[..., None]
    else:
        olens = None
    return out, olens


@tables.register("model_classes", "DiarSondModel")
@tables.register("model_classes", "SOND")
class DiarSondModel:
    """Speaker overlap-aware neural diarization (ref e2e_diar_sond.py:45).

    Pipeline (``prediction_forward``, ref :550-583): speech encoder ->
    speaker (profile) encoder -> CI scorer (dot/cos frame-vs-profile) +
    CD scorer (self-attention over [frame || profile] pairs) -> FSMN post-net
    over the concatenated [cd, ci] score maps -> power-set-encoded (PSE)
    per-frame labels covering every speaker-overlap combination.
    """

    def __init__(self, token_list: Optional[List] = None,
                 vocab_size: Optional[int] = None,
                 encoder: str = "ResNet34SpL2RegDiar",
                 encoder_conf: Optional[dict] = None,
                 speaker_encoder: Optional[str] = "ConvEncoder",
                 speaker_encoder_conf: Optional[dict] = None,
                 ci_scorer: str = "DotScorer",
                 ci_scorer_conf: Optional[dict] = None,
                 cd_scorer: Optional[str] = "SelfAttentionEncoder",
                 cd_scorer_conf: Optional[dict] = None,
                 decoder: str = "FsmnEncoder",
                 decoder_conf: Optional[dict] = None,
                 label_aggregator: Optional[str] = None,
                 label_aggregator_conf: Optional[dict] = None,
                 input_size: int = 80, spk_embed_dim: int = 192,
                 max_spk_num: int = 16, lsm_weight: float = 0.1,
                 length_normalized_loss: bool = False,
                 normalize_speech_speaker: bool = False,
                 speaker_discrimination_loss_weight: float = 1.0,
                 inter_score_loss_weight: float = 0.0,
                 inputs_type: str = "raw", ignore_id: int = -1, **kwargs):
        self.input_size = input_size
        self.spk_embed_dim = spk_embed_dim
        self.max_spk_num = max_spk_num
        self.inputs_type = inputs_type
        self.normalize_speech_speaker = normalize_speech_speaker
        self.lsm_weight = lsm_weight
        self.length_normalized_loss = length_normalized_loss
        self.spk_dis_weight = speaker_discrimination_loss_weight
        self.inter_score_weight = inter_score_loss_weight
        self.ignore_id = ignore_id

        enc_conf = dict(encoder_conf or {})
        enc_conf.setdefault("input_size", input_size)
        self.encoder = tables.encoder_classes[encoder](**enc_conf) \
            if encoder else None
        self.d_speech = self.encoder.output_size() if self.encoder \
            else input_size

        if speaker_encoder:
            spk_conf = dict(speaker_encoder_conf or {})
            spk_conf.setdefault("num_layers", 3)
            spk_conf.setdefault("input_units", spk_embed_dim)
            spk_conf.setdefault("num_units", self.d_speech)
            self.speaker_encoder = tables.encoder_classes[speaker_encoder](
                **spk_conf)
            self.d_spk = self.speaker_encoder.output_size()
        else:
            self.speaker_encoder = None
            self.d_spk = spk_embed_dim

        pair_dim = self.d_speech + self.d_spk
        ci_conf = dict(ci_scorer_conf or {})
        if ci_scorer in ("DotScorer", "CosScorer"):
            self.ci_scorer = tables.encoder_classes[ci_scorer](**ci_conf)
            self.ci_is_encoder = False
        else:
            ci_conf.setdefault("input_size", pair_dim)
            ci_conf.setdefault("out_units", 1)
            self.ci_scorer = tables.encoder_classes[ci_scorer](**ci_conf)
            self.ci_is_encoder = True

        if cd_scorer:
            cd_conf = dict(cd_scorer_conf or {})
            cd_conf.setdefault("input_size", pair_dim)
            cd_conf.setdefault("input_layer", "null")
            cd_conf.setdefault("out_units", 1)
            self.cd_scorer = tables.encoder_classes[cd_scorer](**cd_conf)
        else:
            self.cd_scorer = None

        # post-net consumes [cd(N) || ci(N)] score maps per frame
        dec_conf = dict(decoder_conf or {})
        dec_conf.setdefault("in_units", max_spk_num * 2)
        dec_conf.setdefault("filter_size", 31)
        dec_conf.setdefault("fsmn_num_layers", 3)
        dec_conf.setdefault("dnn_num_layers", 1)
        dec_conf.setdefault("num_memory_units", 256)
        dec_conf.setdefault("ffn_inner_dim", 512)
        if token_list is None:
            token_list = [str(i) for i in range(2 ** min(max_spk_num, 8))]
        self.token_list = [int(t) for t in token_list]
        self.vocab_size = vocab_size or len(self.token_list)
        dec_conf.setdefault("out_units", self.vocab_size)
        self.decoder = tables.encoder_classes[decoder](**dec_conf)

        self.label_aggregator_conf = dict(label_aggregator_conf or {}) \
            if (label_aggregator or label_aggregator_conf) else None

        # PSE tables (ref e2e_diar_sond.py:130-136,159-165)
        self.pse_embedding = jnp.asarray(np.stack(
            [int2vec(t, max_spk_num) for t in self.token_list]))
        self.power_weight = jnp.asarray(
            2.0 ** np.arange(max_spk_num), jnp.float32)
        self.int_token_arr = jnp.asarray(np.array(self.token_list, np.int32))

    def init_params(self, rng):
        keys = jax.random.split(rng, 5)
        p = {"decoder": self.decoder.init(keys[3])}
        if self.encoder is not None:
            p["encoder"] = self.encoder.init(keys[0])
        if self.speaker_encoder is not None:
            p["speaker_encoder"] = self.speaker_encoder.init(keys[1])
        p["ci_scorer"] = self.ci_scorer.init(keys[2])
        if self.cd_scorer is not None:
            p["cd_scorer"] = self.cd_scorer.init(keys[4])
        return p

    # -- network forward (ref e2e_diar_sond.py:550-583) --------------------

    def encode_speech(self, params, speech, lengths):
        if self.encoder is not None and self.inputs_type == "raw":
            enc, enc_lens = self.encoder(params["encoder"], speech, lengths)
            mask = make_pad_mask(enc_lens, enc.shape[1])[..., None]
            return enc * mask.astype(enc.dtype), enc_lens
        return speech, lengths

    def encode_speaker(self, params, profile, profile_lengths):
        if profile.shape[1] < self.max_spk_num:
            profile = jnp.pad(profile, ((0, 0),
                                        (0, self.max_spk_num - profile.shape[1]),
                                        (0, 0)))
        pmask = (jnp.linalg.norm(profile, axis=2, keepdims=True) > 0) \
            .astype(profile.dtype)
        profile = profile / jnp.maximum(
            jnp.linalg.norm(profile, axis=2, keepdims=True), 1e-12)
        if self.speaker_encoder is not None:
            profile, _ = self.speaker_encoder(params["speaker_encoder"],
                                              profile, profile_lengths)
            return profile * pmask, profile_lengths
        return profile, profile_lengths

    def calc_similarity(self, params, speech, profile, seq_len):
        """(B,T,Ds) x (B,N,Dk) -> CI scores (B,T,N), CD scores (B,T,N)."""
        b, t, d_sph = speech.shape
        n = profile.shape[1]
        sp, pr = speech, profile
        if self.normalize_speech_speaker:
            sp = sp / jnp.maximum(jnp.linalg.norm(sp, axis=2, keepdims=True),
                                  1e-12)
            pr = pr / jnp.maximum(jnp.linalg.norm(pr, axis=2, keepdims=True),
                                  1e-12)
        # [frame || profile] pair grid, flattened to (B*N, T, Ds+Dk)
        ge_in = jnp.concatenate(
            [jnp.broadcast_to(sp[:, None], (b, n, t, d_sph)),
             jnp.broadcast_to(pr[:, :, None], (b, n, t, pr.shape[-1]))],
            axis=-1).reshape(b * n, t, d_sph + pr.shape[-1])
        ge_len = jnp.broadcast_to(seq_len[:, None], (b, n)).reshape(b * n)
        cd_simi = None
        if self.cd_scorer is not None:
            cd, _ = self.cd_scorer(params["cd_scorer"], ge_in, ge_len)
            cd_simi = cd.reshape(b, n, t).transpose(0, 2, 1)
        if self.ci_is_encoder:
            ci, _ = self.ci_scorer(params["ci_scorer"], ge_in, ge_len)
            ci_simi = ci.reshape(b, n, t).transpose(0, 2, 1)
        else:
            ci_simi = self.ci_scorer(params["ci_scorer"], sp, pr)
        return ci_simi, cd_simi

    def prediction_forward(self, params, speech, speech_lengths, profile,
                           profile_lengths, return_inter_outputs: bool = False):
        speech, speech_lengths = self.encode_speech(params, speech,
                                                    speech_lengths)
        profile, profile_lengths = self.encode_speaker(params, profile,
                                                       profile_lengths)
        ci, cd = self.calc_similarity(params, speech, profile, speech_lengths)
        simi = jnp.concatenate([cd, ci], axis=2) if cd is not None else ci
        logits, _ = self.decoder(params["decoder"], simi, speech_lengths)
        if return_inter_outputs:
            return logits, [(speech, speech_lengths),
                            (profile, profile_lengths), (ci, cd)]
        return logits

    # -- losses (ref e2e_diar_sond.py:267-281,342-420) ----------------------

    def speaker_discrimination_loss(self, profile):
        pmask = (jnp.linalg.norm(profile, axis=2, keepdims=True) > 0) \
            .astype(jnp.float32)  # (B, N, 1)
        mask = jnp.einsum("bni,bmi->bnm", pmask, pmask)
        mask = mask * (1.0 - jnp.eye(self.max_spk_num)[None])
        eps = 1e-12
        coding_norm = jnp.linalg.norm(
            profile * pmask + (1 - pmask) * eps, axis=2, keepdims=True) * pmask
        pn = profile / jnp.maximum(
            jnp.linalg.norm(profile, axis=2, keepdims=True), eps)
        cos = jnp.einsum("bnd,bmd->bnm", pn, pn) * mask
        cos = jnp.clip(cos, -1 + eps, 1 - eps)
        return jnp.sum(jax.nn.relu(mask * coding_norm * cos)) \
            / jnp.maximum(jnp.sum(mask), 1.0)

    def _sequence_bce(self, pred, label, lengths):
        """BCE-with-logits, padding zeroed, normalized per reference
        SequenceBinaryCrossEntropy (``label_smoothing_loss.py:67-90``)."""
        p = pred.astype(jnp.float32)
        loss = jnp.maximum(p, 0) - p * label + jnp.log1p(jnp.exp(-jnp.abs(p)))
        valid = make_pad_mask(lengths, pred.shape[1])[..., None]
        denom = jnp.sum(valid) if self.length_normalized_loss else pred.shape[0]
        return jnp.sum(loss * valid) / denom

    def forward_jit(self, params, speech, speech_lengths, profile,
                    profile_lengths=None, binary_labels=None,
                    binary_labels_lengths=None, rng=None, **_):
        """Training forward: PSE classification + speaker discrimination +
        internal score losses, with DER counter stats (all jnp)."""
        if profile_lengths is None:
            profile_lengths = jnp.full((speech.shape[0],), profile.shape[1],
                                       jnp.int32)
        if self.label_aggregator_conf is not None:
            binary_labels, binary_labels_lengths = label_aggregate(
                binary_labels, binary_labels_lengths,
                **self.label_aggregator_conf)

        # PSE labels (ref e2e_diar_sond.py:242-247)
        pad_n = self.max_spk_num - binary_labels.shape[2]
        bl = jnp.pad(binary_labels.astype(jnp.float32),
                     ((0, 0), (0, 0), (0, pad_n)))
        raw = jnp.sum(bl * self.power_weight, axis=2).astype(jnp.int32)
        pse_labels = jnp.argmax(
            (raw[..., None] == self.int_token_arr[None, None]), axis=2)

        pred, inter = self.prediction_forward(
            params, speech, speech_lengths, profile, profile_lengths,
            return_inter_outputs=True)
        (_, enc_lens), (profile_enc, _), (ci, cd) = inter

        # align lengths (subsampling tolerance, ref :258-265)
        min_len = min(pred.shape[1], pse_labels.shape[1])
        pred, pse_labels = pred[:, :min_len], pse_labels[:, :min_len]
        ci = ci[:, :min_len]
        cd = cd[:, :min_len] if cd is not None else None
        lab_lens = jnp.minimum(binary_labels_lengths, min_len)

        valid = make_pad_mask(lab_lens, min_len)
        tgt = jnp.where(valid, pse_labels, self.ignore_id)
        loss_diar = label_smoothing_loss(
            pred, tgt, ignore_id=self.ignore_id, smoothing=self.lsm_weight,
            normalize_length=self.length_normalized_loss)
        loss_spk_dis = self.speaker_discrimination_loss(profile_enc)
        multi_labels = self.pse_embedding[jnp.where(valid, pse_labels, 0)]
        loss_ci = self._sequence_bce(ci, multi_labels, lab_lens)
        loss_cd = self._sequence_bce(cd, multi_labels, lab_lens) \
            if cd is not None else 0.0
        loss = loss_diar + self.spk_dis_weight * loss_spk_dis \
            + self.inter_score_weight * (loss_ci + loss_cd)

        stats = self._diarization_error_stats(pred, pse_labels, valid)
        stats.update(loss=loss, loss_diar=loss_diar,
                     loss_spk_dis=loss_spk_dis, loss_inter_ci=loss_ci,
                     loss_inter_cd=loss_cd)
        return loss, stats, speech.shape[0]

    forward = forward_jit

    def _diarization_error_stats(self, pred, pse_labels, valid):
        """DER counters (ref e2e_diar_sond.py:655-702), expressed in jnp."""
        m = valid[..., None].astype(jnp.float32)
        pred_bin = (self.pse_embedding[jnp.argmax(pred, 2)] > 0) \
            .astype(jnp.float32) * m
        lab_bin = self.pse_embedding[pse_labels] * m
        n_ref = jnp.sum(lab_bin, 2)
        n_sys = jnp.sum(pred_bin, 2)
        speech_scored = jnp.sum(n_ref > 0)
        speaker_scored = jnp.sum(n_ref)
        speaker_miss = jnp.sum(jnp.maximum(n_ref - n_sys, 0))
        speaker_falarm = jnp.sum(jnp.maximum(n_sys - n_ref, 0))
        n_map = jnp.sum((lab_bin == 1) & (pred_bin == 1), 2)
        speaker_error = jnp.sum(jnp.minimum(n_ref, n_sys) - n_map)
        num_frames = jnp.maximum(jnp.sum(valid), 1)
        den = jnp.maximum(speaker_scored, 1.0)
        return {
            "sad_mr": jnp.sum((n_ref > 0) & (n_sys == 0))
            / jnp.maximum(speech_scored, 1),
            "sad_fr": jnp.sum((n_ref == 0) & (n_sys > 0) & valid)
            / jnp.maximum(speech_scored, 1),
            "mi": speaker_miss / den, "fa": speaker_falarm / den,
            "cf": speaker_error / den,
            "acc": jnp.sum((pred_bin == lab_bin) * m)
            / (self.max_spk_num * num_frames),
            "der": (speaker_miss + speaker_falarm + speaker_error) / den,
        }

    # -- inference -----------------------------------------------------------

    def inference(self, params, data_in, data_lengths=None, key=None,
                  tokenizer=None, frontend=None, profile=None, profiles=None,
                  **kwargs):
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)
        profile = profile if profile is not None else profiles
        assert profile is not None, "SOND requires candidate speaker profiles"
        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs if frontend else 16000,
            audio_fs=kwargs.get("fs", 16000))
        if frontend is not None:
            feats, feat_lens = extract_fbank(audio_list, frontend=frontend)
        else:
            from funasr_tpu.ops.fbank import fbank
            from funasr_tpu.utils.load_utils import as_pcm16_f32
            fb = [np.asarray(fbank(jnp.asarray(as_pcm16_f32(a)),
                                   num_mel_bins=self.input_size))
                  for a in audio_list]
            feat_lens = np.asarray([f.shape[0] for f in fb], np.int32)
            feats = np.zeros((len(fb), max(int(l) for l in feat_lens),
                              self.input_size), np.float32)
            for i, f in enumerate(fb):
                feats[i, : f.shape[0]] = f
        profile = jnp.asarray(profile)
        if profile.ndim == 2:
            profile = jnp.broadcast_to(profile[None],
                                       (feats.shape[0],) + profile.shape)
        plens = jnp.full((feats.shape[0],), profile.shape[1], jnp.int32)
        logits, inter = self.prediction_forward(
            params, jnp.asarray(feats), jnp.asarray(feat_lens), profile, plens,
            return_inter_outputs=True)
        enc_lens = np.asarray(inter[0][1])
        # PSE argmax -> binary activity per speaker (ref pse_embedding lookup)
        pse = np.asarray(jnp.argmax(logits, axis=-1))
        active = np.asarray(self.pse_embedding)[pse] > 0  # (B, T, N)
        frame_ms = kwargs.get("frame_shift_ms", 10) * (
            self.encoder.time_ds_ratio if self.encoder is not None and
            hasattr(self.encoder, "time_ds_ratio") else 1)
        results = []
        if key is None:
            key = [f"rand_key_{i}" for i in range(active.shape[0])]
        for i in range(active.shape[0]):
            act = active[i, : int(enc_lens[i])]
            segs = []
            for s in range(act.shape[1]):
                on = None
                for t_i in range(act.shape[0]):
                    if act[t_i, s] and on is None:
                        on = t_i
                    elif not act[t_i, s] and on is not None:
                        segs.append([s, on * frame_ms, t_i * frame_ms])
                        on = None
                if on is not None:
                    segs.append([s, on * frame_ms, act.shape[0] * frame_ms])
            results.append({"key": key[i],
                            "value": sorted(segs, key=lambda x: x[1])})
        return results, {}
