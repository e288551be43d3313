"""Conformer AED model = Transformer with a ConformerEncoder
(reference: ``funasr/models/conformer/model.py``)."""

import funasr_tpu.models.conformer.encoder  # noqa: F401 (registers ConformerEncoder)
from funasr_tpu.models.transformer.model import Transformer
from funasr_tpu.register import tables


@tables.register("model_classes", "Conformer")
class Conformer(Transformer):
    def __init__(self, encoder: str = "ConformerEncoder", **kwargs):
        super().__init__(encoder=encoder, **kwargs)
