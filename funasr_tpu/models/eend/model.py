"""EEND-OLA: end-to-end neural diarization with encoder-decoder attractors and
power-set encoding.

TPU-native rebuild of FunASR ``funasr/models/eend/e2e_diar_eend_ola.py:90``
(``DiarEENDOLAModel``), ``encoder.py:124`` (``EENDOLATransformerEncoder``),
``encoder_decoder_attractor.py:7`` (EDA) and ``utils/power.py`` (power-set label
mapping):

* encoder: linear_in -> N x [lnorm1 -> MHSA (+res) -> lnorm2 -> FF (+res)] ->
  lnorm_out (the reference normalizes the residual stream itself — post-LN
  applied in place, not pre-LN).
* EDA: LSTM encoder over frame embeddings -> final (h, c) seeds an LSTM decoder
  driven by zero inputs; one attractor per step + sigmoid existence counter.
* PSE head: per-frame speaker logits (emb . attractor) -> PostNet LSTM over the
  max_n_speaker activity vector -> power-set label distribution; decoding
  recovers the joint speaker activity from the powerlabel argmax with
  oov-carry-forward (``recover_y_from_powerlabel:296``).
"""

from __future__ import annotations

import itertools
import math
from itertools import combinations
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import (
    layer_norm_apply, layer_norm_init, linear_apply, linear_init, lstm_apply,
    lstm_init, make_pad_mask)
from funasr_tpu.register import tables

LN_EPS_TORCH = 1e-5  # reference uses nn.LayerNorm defaults, not FunASR's 1e-12


# ---------------------------------------------------------------------------
# power-set label mapping (reference utils/power.py)
# ---------------------------------------------------------------------------


def generate_mapping_dict(max_speaker_num: int = 8,
                          max_olp_speaker_num: int = 3) -> Dict:
    """Power-set labels for up to ``max_olp_speaker_num`` overlapping speakers:
    each allowed activity bitmask (little-endian speaker bits) gets a dense
    label id; everything else maps to ``oov``."""
    kinds = {0}
    for n_olp in range(1, max_olp_speaker_num + 1):
        for com in combinations(range(max_speaker_num), n_olp):
            kinds.add(sum(1 << s for s in com))
    ordered = sorted(kinds)
    dec2label = {dec: i for i, dec in enumerate(ordered)}
    label2dec = {i: dec for i, dec in enumerate(ordered)}
    return {"dec2label": dec2label, "label2dec": label2dec,
            "oov": len(ordered)}


def powerlabel_table(mapping_dict: Dict, max_speaker_num: int) -> np.ndarray:
    """Dense (2^S,) bitmask -> label table (oov elsewhere) — jit-friendly."""
    table = np.full((1 << max_speaker_num,), mapping_dict["oov"], np.int32)
    for dec, label in mapping_dict["dec2label"].items():
        table[dec] = label
    return table


def label_to_bits_table(mapping_dict: Dict, max_speaker_num: int) -> np.ndarray:
    """(n_labels+1, S) label -> activity bits (oov row = zeros)."""
    out = np.zeros((mapping_dict["oov"] + 1, max_speaker_num), np.float32)
    for label, dec in mapping_dict["label2dec"].items():
        for s in range(max_speaker_num):
            out[label, s] = (dec >> s) & 1
    return out


# ---------------------------------------------------------------------------
# encoder (reference encoder.py:124)
# ---------------------------------------------------------------------------


@tables.register("encoder_classes", "EENDOLATransformerEncoder")
class EENDOLATransformerEncoder:
    def __init__(self, idim: int, n_layers: int = 4, n_units: int = 256,
                 e_units: int = 2048, h: int = 4, **kwargs):
        self.idim = idim
        self.n_layers = n_layers
        self.n_units = n_units
        self.e_units = e_units
        self.h = h

    def output_size(self) -> int:
        return self.n_units

    def init(self, rng):
        keys = jax.random.split(rng, self.n_layers * 6 + 2)
        params = {
            "linear_in": linear_init(keys[0], self.idim, self.n_units),
            "lnorm_out": layer_norm_init(self.n_units),
            "layers": [],
        }
        for i in range(self.n_layers):
            k = keys[2 + i * 6: 2 + (i + 1) * 6]
            params["layers"].append({
                "lnorm1": layer_norm_init(self.n_units),
                "att": {
                    "linearQ": linear_init(k[0], self.n_units, self.n_units),
                    "linearK": linear_init(k[1], self.n_units, self.n_units),
                    "linearV": linear_init(k[2], self.n_units, self.n_units),
                    "linearO": linear_init(k[3], self.n_units, self.n_units),
                },
                "lnorm2": layer_norm_init(self.n_units),
                "ff": {
                    "linear1": linear_init(k[4], self.n_units, self.e_units),
                    "linear2": linear_init(k[5], self.e_units, self.n_units),
                },
            })
        return params

    def _mhsa(self, p, x, mask):
        b, t, d = x.shape
        dk = d // self.h

        def split(y):
            return y.reshape(b, t, self.h, dk).transpose(0, 2, 1, 3)

        q = split(linear_apply(p["linearQ"], x))
        k = split(linear_apply(p["linearK"], x))
        v = split(linear_apply(p["linearV"], x))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(dk)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        att = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", att, v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, d).astype(x.dtype)
        return linear_apply(p["linearO"], ctx)

    def __call__(self, params, x, ilens=None):
        """x: (B, T, idim) -> ((B, T, n_units), ilens)."""
        mask = None if ilens is None else make_pad_mask(ilens, x.shape[1])
        e = linear_apply(params["linear_in"], x)
        for lp in params["layers"]:
            e = layer_norm_apply(lp["lnorm1"], e, eps=LN_EPS_TORCH)
            e = e + self._mhsa(lp["att"], e, mask)
            e = layer_norm_apply(lp["lnorm2"], e, eps=LN_EPS_TORCH)
            h = jax.nn.relu(linear_apply(lp["ff"]["linear1"], e))
            e = e + linear_apply(lp["ff"]["linear2"], h)
        e = layer_norm_apply(params["lnorm_out"], e, eps=LN_EPS_TORCH)
        return e, ilens


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


@tables.register("model_classes", "DiarEENDOLA")
@tables.register("model_classes", "EENDOLA")
class DiarEENDOLA:
    def __init__(self, encoder: str = "EENDOLATransformerEncoder",
                 encoder_conf: Optional[dict] = None, input_size: int = 345,
                 n_units: int = 256, max_n_speaker: int = 8,
                 attractor_threshold: float = 0.5, frame_shift_ms: int = 100,
                 attractor_loss_weight: float = 1.0, **kwargs):
        enc_conf = dict(encoder_conf or {})
        enc_conf.setdefault("n_units", n_units)
        self.encoder = tables.encoder_classes[encoder](idim=input_size,
                                                       **enc_conf)
        self.n_units = self.encoder.output_size()
        self.max_n_speaker = max_n_speaker
        self.attractor_threshold = attractor_threshold
        self.frame_shift_ms = frame_shift_ms
        self.attractor_loss_weight = attractor_loss_weight
        self.mapping_dict = generate_mapping_dict(max_speaker_num=max_n_speaker)
        self._power_table = powerlabel_table(self.mapping_dict, max_n_speaker)
        self._bits_table = label_to_bits_table(self.mapping_dict, max_n_speaker)

    def init_params(self, rng):
        keys = jax.random.split(rng, 6)
        return {
            "encoder": self.encoder.init(keys[0]),
            "eda_encoder": lstm_init(keys[1], self.n_units, self.n_units),
            "eda_decoder": lstm_init(keys[2], self.n_units, self.n_units),
            "counter": linear_init(keys[3], self.n_units, 1),
            "postnet": lstm_init(keys[4], self.max_n_speaker, self.n_units),
            "output_layer": linear_init(keys[5], self.n_units,
                                        self.mapping_dict["oov"] + 1),
        }

    # ------------------------------------------------------------------

    def _attractors(self, params, emb, n_att: int):
        """emb: (B, T, D) -> (attractors (B, n_att, D), existence logits)."""
        _, state = lstm_apply(params["eda_encoder"], emb, return_state=True)
        b = emb.shape[0]
        zeros = jnp.zeros((b, n_att, self.n_units), emb.dtype)
        attractors = lstm_apply(params["eda_decoder"], zeros, init=state)
        exist_logits = linear_apply(params["counter"], attractors)[..., 0]
        return attractors, exist_logits

    def forward_post_net(self, params, logits):
        """logits: (B, T, max_n_speaker) activity logits -> powerlabel logits."""
        h = lstm_apply(params["postnet"], logits)
        return linear_apply(params["output_layer"], h)

    def activities(self, params, speech, speech_lengths,
                   n_spk: Optional[int] = None):
        """-> (per-frame speaker activity probs (B, T, S), existence probs
        (B, S+1), enc_lens)."""
        emb, enc_lens = self.encoder(params["encoder"], speech, speech_lengths)
        s = n_spk if n_spk is not None else self.max_n_speaker
        attractors, exist_logits = self._attractors(params, emb, s + 1)
        logits = jnp.einsum("btd,bsd->bts", emb, attractors[:, :s],
                            preferred_element_type=jnp.float32)
        return jax.nn.sigmoid(logits), jax.nn.sigmoid(exist_logits), enc_lens

    # ------------------------------------------------------------------

    def forward_jit(self, params, speech, speech_lengths, labels, label_lengths,
                    rng=None):
        """labels: (B, T, S) binary speaker activities. Loss = PIT BCE over
        speaker permutations + attractor existence BCE + power-set (PSE) CE via
        the PostNet (reference ``forward:167-233``; exact permutations, so
        intended for S <= 4 training labels)."""
        emb, enc_lens = self.encoder(params["encoder"], speech, speech_lengths)
        s = labels.shape[-1]
        attractors, exist_logits = self._attractors(params, emb, s + 1)
        logits = jnp.einsum("btd,bsd->bts", emb, attractors[:, :s],
                            preferred_element_type=jnp.float32)
        probs = jax.nn.sigmoid(logits)

        t = probs.shape[1]
        mask = make_pad_mask(enc_lens, t)[..., None].astype(jnp.float32)
        labels = labels[:, :t].astype(jnp.float32)

        def bce(p, y):
            eps = 1e-7
            per = -(y * jnp.log(p + eps) + (1 - y) * jnp.log(1 - p + eps))
            return jnp.sum(per * mask, axis=(1, 2))

        perms = list(itertools.permutations(range(s)))
        losses = jnp.stack([bce(probs[:, :, list(p)], labels) for p in perms], 1)
        best = jnp.argmin(losses, axis=1)
        pit = jnp.min(losses, axis=1)
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        loss_diar = jnp.sum(pit) / denom

        # attractor existence: first n_active attractors exist, next one stops
        exist = jax.nn.sigmoid(exist_logits)
        n_active = jnp.sum(jnp.max(labels, axis=1) > 0.5, axis=-1)
        tgt_exist = (jnp.arange(exist.shape[1])[None] < n_active[:, None]) \
            .astype(jnp.float32)
        eps = 1e-7
        loss_exist = -jnp.mean(tgt_exist * jnp.log(exist + eps)
                               + (1 - tgt_exist) * jnp.log(1 - exist + eps))

        # PSE: powerlabels of the best-permutation labels via the dense
        # bitmask->label table (jittable stand-in for utils/power.py dec_trans)
        perm_arr = jnp.asarray([list(p) for p in perms])  # (P, S)
        chosen = perm_arr[best]  # (B, S)
        labels_pit = jnp.take_along_axis(labels, chosen[:, None, :], axis=2)
        bits = (labels_pit > 0.5).astype(jnp.int32)
        weights = (2 ** jnp.arange(s))[None, None, :]
        dec = jnp.sum(bits * weights, axis=-1)  # (B, T)
        power_tgt = jnp.asarray(self._power_table)[dec]
        pad = jnp.zeros(logits.shape[:2] + (self.max_n_speaker - s,),
                        logits.dtype) if s < self.max_n_speaker else None
        logits_pad = logits if pad is None else jnp.concatenate([logits, pad], -1)
        pse_logits = self.forward_post_net(params, logits_pad)
        logp = jax.nn.log_softmax(pse_logits.astype(jnp.float32), -1)
        pse_ce = -jnp.take_along_axis(logp, power_tgt[..., None], -1)[..., 0]
        loss_pse = jnp.sum(pse_ce * mask[..., 0]) / jnp.maximum(
            jnp.sum(mask[..., 0]), 1.0)

        loss = loss_pse + loss_diar + self.attractor_loss_weight * loss_exist
        return loss, {"loss": loss, "pit_loss": loss_diar,
                      "pse_loss": loss_pse, "attractor_loss": loss_exist}, \
            speech.shape[0]

    # ------------------------------------------------------------------

    def estimate_sequential(self, params, speech, speech_lengths,
                            n_speakers: Optional[int] = None,
                            threshold: float = 0.5):
        """Reference ``estimate_sequential:235`` with shuffle=False: estimate up
        to max_n_speaker attractors, cut at the first existence prob below the
        threshold, run the PostNet powerlabel decode, recover per-frame joint
        activities. Returns list of (T_i, n_spk_i) numpy activity matrices."""
        emb, enc_lens = self.encoder(params["encoder"], speech, speech_lengths)
        attractors, exist_logits = self._attractors(params, emb,
                                                    self.max_n_speaker)
        probs = np.asarray(jax.nn.sigmoid(exist_logits))
        emb_np = np.asarray(emb)
        att_np = np.asarray(attractors)
        enc_lens = (np.asarray(enc_lens) if enc_lens is not None
                    else np.full((emb_np.shape[0],), emb_np.shape[1]))

        outs = []
        for i in range(emb_np.shape[0]):
            if n_speakers is not None and n_speakers >= 0:
                n_spk = n_speakers
            else:
                silent = np.nonzero(probs[i] < threshold)[0]
                n_spk = int(silent[0]) if silent.size else self.max_n_speaker
            att = att_np[i, :n_spk]
            pad_att = np.zeros((self.max_n_speaker, self.n_units), np.float32)
            pad_att[:att.shape[0]] = att[: self.max_n_speaker]
            ys = emb_np[i, : enc_lens[i]] @ pad_att.T  # (T, max_n_speaker)
            pse_logits = np.asarray(self.forward_post_net(
                params, jnp.asarray(ys[None])))[0]
            pred = np.argmax(pse_logits, axis=-1)
            # oov carries the previous frame forward (reference :296-321)
            oov = self.mapping_dict["oov"]
            for tt in range(len(pred)):
                if pred[tt] == oov:
                    pred[tt] = pred[tt - 1] if tt > 0 else 0
            decisions = self._bits_table[pred][:, :n_spk]
            outs.append(decisions)
        return outs

    def inference(self, params, data_in, data_lengths=None,
                  key: Optional[List] = None, tokenizer=None, frontend=None,
                  **kwargs):
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)

        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs if frontend else 8000,
            audio_fs=kwargs.get("fs", 16000))
        speech, speech_lengths = extract_fbank(audio_list, frontend=frontend)
        decisions = self.estimate_sequential(
            params, jnp.asarray(speech), jnp.asarray(speech_lengths),
            n_speakers=kwargs.get("n_speakers"),
            threshold=kwargs.get("threshold", self.attractor_threshold))

        results = []
        if key is None:
            key = [f"rand_key_{i}" for i in range(len(decisions))]
        for i, act in enumerate(decisions):
            n_spk = act.shape[1]
            segments = []
            for s in range(n_spk):
                on = None
                for t in range(act.shape[0]):
                    if act[t, s] > 0.5 and on is None:
                        on = t
                    elif act[t, s] <= 0.5 and on is not None:
                        segments.append([s, on * self.frame_shift_ms,
                                         t * self.frame_shift_ms])
                        on = None
                if on is not None:
                    segments.append([s, on * self.frame_shift_ms,
                                     act.shape[0] * self.frame_shift_ms])
            results.append({"key": key[i], "n_speakers": n_spk,
                            "value": sorted(segments, key=lambda x: x[1])})
        return results, {}
