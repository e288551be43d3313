"""CTC head: linear projection + CTC loss (optax) + log-softmax/argmax helpers.

TPU-native counterpart of the reference CTC module (FunASR ``funasr/models/ctc/
ctc.py:7-148``, which wraps ``torch.nn.functional.ctc_loss``); here the loss is
``optax.ctc_loss`` — an XLA-native alpha-recursion scan, batched on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from funasr_tpu.core.layers import linear_apply, linear_init
from funasr_tpu.register import tables


@tables.register("ctc_classes", "CTC")
class CTC:
    def __init__(self, odim: int, encoder_output_size: int, dropout_rate: float = 0.0,
                 blank_id: int = 0, **kwargs):
        self.odim = odim
        self.eprojs = encoder_output_size
        self.blank_id = blank_id

    def init(self, rng):
        return {"ctc_lo": linear_init(rng, self.eprojs, self.odim)}

    def logits(self, params, hs_pad):
        return linear_apply(params["ctc_lo"], hs_pad)

    def log_softmax(self, params, hs_pad):
        return jax.nn.log_softmax(self.logits(params, hs_pad).astype(jnp.float32), -1)

    def argmax(self, params, hs_pad):
        return jnp.argmax(self.logits(params, hs_pad), axis=-1)

    def loss(self, params, hs_pad, hlens, ys_pad, ys_lens):
        """Mean per-utterance CTC loss. ys_pad: (B, L) with any padding value."""
        logits = self.logits(params, hs_pad).astype(jnp.float32)
        b, t, _ = logits.shape
        logit_paddings = (jnp.arange(t)[None, :] >= hlens[:, None]).astype(jnp.float32)
        l = ys_pad.shape[1]
        label_paddings = (jnp.arange(l)[None, :] >= ys_lens[:, None]).astype(jnp.float32)
        labels = jnp.where(label_paddings > 0, 0, ys_pad)
        per_seq = optax.ctc_loss(logits, logit_paddings, labels, label_paddings,
                                 blank_id=self.blank_id)
        return jnp.mean(per_seq)
