"""funasr_tpu: a TPU-native (JAX/XLA/Pallas/pjit) speech framework with the
capabilities of FunASR — offline/streaming ASR, VAD, punctuation, speaker tasks,
training, and serving.

Mirrors the reference package contract (FunASR ``funasr/__init__.py:48-107``): importing
the package walks registrable submodules so ``@tables.register`` side effects populate
the registries, tolerating per-module import failures (recorded, queryable); ``AutoModel``
is exported lazily.
"""

from __future__ import annotations

import importlib
import logging
import os

__version__ = "0.1.0"

_IMPORT_ERRORS: dict = {}

# Modules whose import registers classes. Ordered cheap-first.
_REGISTRABLE_MODULES = [
    "funasr_tpu.frontends.wav_frontend",
    "funasr_tpu.tokenizer.char_tokenizer",
    "funasr_tpu.tokenizer.sentencepiece_tokenizer",
    "funasr_tpu.tokenizer.hf_tokenizer",
    "funasr_tpu.models.specaug.specaug",
    "funasr_tpu.models.normalize.normalize",
    "funasr_tpu.models.ctc.ctc",
    "funasr_tpu.models.sanm.encoder",
    "funasr_tpu.models.paraformer.cif_predictor",
    "funasr_tpu.models.paraformer.decoder",
    "funasr_tpu.models.paraformer.model",
    "funasr_tpu.models.bicif_paraformer.model",
    "funasr_tpu.models.e_paraformer.model",
    "funasr_tpu.models.paraformer_v2.model",
    "funasr_tpu.models.seaco_paraformer.model",
    "funasr_tpu.models.paraformer_streaming.model",
    "funasr_tpu.models.scama.decoder",
    "funasr_tpu.models.scama.model",
    "funasr_tpu.models.fsmn_vad_streaming.model",
    "funasr_tpu.models.ct_transformer.model",
    "funasr_tpu.models.ct_transformer_streaming.model",
    "funasr_tpu.models.campplus.model",
    "funasr_tpu.models.sense_voice.model",
    "funasr_tpu.models.monotonic_aligner.model",
    "funasr_tpu.models.ctc.model",
    "funasr_tpu.models.transformer.model",
    "funasr_tpu.models.transformer.conv_decoders",
    "funasr_tpu.models.paraformer.san_decoder",
    "funasr_tpu.models.lcbnet.encoder",
    "funasr_tpu.models.lcbnet.model",
    "funasr_tpu.models.conformer.model",
    "funasr_tpu.models.contextual_paraformer.model",
    "funasr_tpu.models.fsmn_kws.model",
    "funasr_tpu.models.eres2net.model",
    "funasr_tpu.models.whisper.model",
    "funasr_tpu.models.whisper.encoders",
    "funasr_tpu.models.whisper_lid.model",
    "funasr_tpu.models.transducer.model",
    "funasr_tpu.models.language_model.transformer_lm",
    "funasr_tpu.models.fun_asr_nano.model",
    "funasr_tpu.models.llm_asr.model",
    "funasr_tpu.models.uniasr.model",
    "funasr_tpu.models.emotion2vec.model",
    "funasr_tpu.models.eend.model",
    "funasr_tpu.models.sond.encoders",
    "funasr_tpu.models.sond.model",
    "funasr_tpu.models.data2vec.model",
    "funasr_tpu.models.mossformer.model",
    "funasr_tpu.models.mfcca.encoder",
    "funasr_tpu.models.mfcca.model",
    "funasr_tpu.models.sa_asr.model",
    "funasr_tpu.models.branchformer.encoder",
    "funasr_tpu.models.rwkv_bat.model",
    "funasr_tpu.tokenizer.extra_tokenizers",
    "funasr_tpu.frontends.whisper_frontend",
    "funasr_tpu.frontends.default",
    "funasr_tpu.frontends.mel23",
    "funasr_tpu.frontends.fused",
    "funasr_tpu.frontends.s3prl",
    "funasr_tpu.datasets.audio_datasets.datasets",
    "funasr_tpu.datasets.audio_datasets.index_ds",
    "funasr_tpu.datasets.audio_datasets.samplers",
    "funasr_tpu.datasets.audio_datasets.preprocessor",
    "funasr_tpu.datasets.specialized_datasets",
    "funasr_tpu.datasets.fun_asr_datasets",
    "funasr_tpu.datasets.dataloader_entry",
    "funasr_tpu.optimizers",
    "funasr_tpu.schedulers",
    "funasr_tpu.parity",
]

_STRICT = os.environ.get("FUNASR_TPU_STRICT_IMPORT", "") not in ("", "0", "false")


def import_submodules():
    for name in _REGISTRABLE_MODULES:
        try:
            importlib.import_module(name)
        except Exception as exc:  # noqa: BLE001 — tolerate and record (ref behavior)
            _IMPORT_ERRORS[name] = repr(exc)
            if _STRICT:
                raise
            logging.debug("funasr_tpu: failed to import %s: %r", name, exc)


def get_import_errors():
    return dict(_IMPORT_ERRORS)


import_submodules()

from funasr_tpu.register import tables  # noqa: E402  (re-export)


def __getattr__(name):
    if name == "AutoModel":
        from funasr_tpu.auto.auto_model import AutoModel
        return AutoModel
    if name == "AutoFrontend":
        from funasr_tpu.auto.auto_frontend import AutoFrontend
        return AutoFrontend
    raise AttributeError(f"module 'funasr_tpu' has no attribute {name!r}")
