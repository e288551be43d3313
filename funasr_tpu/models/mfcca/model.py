"""MFCCA: multi-frame cross-channel attention ASR (multichannel meetings).

TPU-native rebuild of FunASR ``funasr/models/mfcca/e2e_asr_mfcca.py:53``:
per-channel features run through the MFCCA conformer encoder (every block does
cross-channel attention over a 5-frame window, then time attention; see
``encoder.py``), the encoder's conv stack fuses channels, and a standard AED
decoder + CTC computes the hybrid loss (ctc_weight mixing, ref :193-206).

Accepts (B, C, T, F) multichannel features (channels flattened into the batch
for the encoder, ref ``mfcca_encoder.py:391``) or single-channel (B, T, F).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from funasr_tpu.models.mfcca.encoder import MFCCAEncoder
from funasr_tpu.models.transformer.model import Transformer
from funasr_tpu.register import tables


@tables.register("model_classes", "MFCCA")
class MFCCA(Transformer):
    def __init__(self, encoder: str = "MFCCAEncoder", encoder_conf=None,
                 mask_channel: bool = False, **kwargs):
        enc_conf = dict(encoder_conf or {})
        enc_conf.setdefault("pos_enc_layer_type", "rel_pos")
        enc_conf.setdefault("selfattention_layer_type", "rel_selfattn")
        super().__init__(encoder=encoder, encoder_conf=enc_conf, **kwargs)
        # channel-dropout augmentation (ref e2e_asr_mfcca.py:166-170) is a
        # training-data choice; keep the flag for config parity
        self.mask_channel = mask_channel

    def _flatten_channels(self, speech, speech_lengths):
        """(B, C, T, F) -> ((B*C, T, F), lens repeated, C)."""
        if speech.ndim == 4:
            b, c, t, f = speech.shape
            flat = speech.reshape(b * c, t, f)
            lens = jnp.repeat(speech_lengths, c)
            return flat, lens, c
        return speech, speech_lengths, 1

    def encode(self, params, speech, speech_lengths, rng=None):
        flat, lens, c = self._flatten_channels(speech, speech_lengths)
        if self.specaug is not None and rng is not None:
            flat, lens = self.specaug(flat, lens, rng)
        if self.normalize is not None:
            flat, lens = self.normalize(flat, lens)
        return self.encoder(params["encoder"], flat, lens, channel_size=c)

    def forward_jit(self, params, speech, speech_lengths, text, text_lengths,
                    rng=None):
        encoder_out, encoder_out_lens = self.encode(params, speech,
                                                    speech_lengths, rng=rng)
        from funasr_tpu.losses.label_smoothing_loss import (label_smoothing_loss,
                                                            th_accuracy)
        from funasr_tpu.models.transformer.model import add_sos_eos
        stats = {}
        loss_ctc = 0.0
        if self.ctc is not None:
            loss_ctc = self.ctc.loss(params["ctc"], encoder_out,
                                     encoder_out_lens, text, text_lengths)
            stats["loss_ctc"] = loss_ctc
        ys_in, ys_out = add_sos_eos(text, text_lengths, self.sos, self.eos,
                                    self.ignore_id)
        logits, _ = self.decoder(params["decoder"], encoder_out,
                                 encoder_out_lens, ys_in, text_lengths + 1)
        loss_att = label_smoothing_loss(logits, ys_out, self.ignore_id,
                                        self.lsm_weight, self.vocab_size,
                                        self.length_normalized_loss)
        stats["acc"] = th_accuracy(logits, ys_out, self.ignore_id)
        if self.ctc is not None:
            loss = self.ctc_weight * loss_ctc + (1 - self.ctc_weight) * loss_att
        else:
            loss = loss_att
        stats.update(loss_att=loss_att, loss=loss)
        return loss, stats, speech.shape[0]
