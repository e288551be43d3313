"""E-Paraformer: Paraformer with the parallel integrate-and-fire (PIF) predictor.

TPU-native rebuild of FunASR ``funasr/models/e_paraformer/model.py:28`` (Interspeech
2024 "E-Paraformer: A Faster and Better Parallel Transformer..."): identical
encoder/decoder machinery to Paraformer, with sequential CIF replaced by the
Gaussian-attention PIF predictor (``pif_predictor.py``) and ``predictor_bias=2``
(sos+eos) by default. The reference's separate decoder copy
(``e_paraformer/decoder.py:233``) is layout-identical to ParaformerSANMDecoder, so
the shared implementation is reused.
"""

from __future__ import annotations

import funasr_tpu.models.e_paraformer.pif_predictor  # noqa: F401 (registers)
from funasr_tpu.models.paraformer.model import Paraformer
from funasr_tpu.register import tables


@tables.register("model_classes", "EParaformer")
class EParaformer(Paraformer):
    def __init__(self, predictor: str = "PifPredictor", predictor_bias: int = 2,
                 use_1st_decoder_loss: bool = True, **kwargs):
        super().__init__(predictor=predictor, predictor_bias=predictor_bias,
                         **kwargs)
        self.use_1st_decoder_loss = use_1st_decoder_loss
