"""Registry-name parity with the reference (aliases onto real implementations).

The reference registers many names that are thin variants of the same code:
ONNX-export wrapper modules (``*Export`` — torch-graph rewrites our jax.export
path does not need), HF hub paths used as model keys ("Qwen/Qwen-Audio"),
capitalized Whisper size names, and per-recipe sampler/dataset spellings. Each
block below binds those names to this framework's implementation of record, so
any reference config.yaml resolves. Genuinely distinct components live in
their own modules — this file contains NO model logic.
"""

from __future__ import annotations

from funasr_tpu.register import tables


def _alias(table: str, name: str, target: str):
    tbl = getattr(tables, table)
    if name not in tbl and target in tbl:
        tbl[name] = tbl[target]


def register_parity_aliases():
    # --- encoders: export wrappers + FSMN spellings + misc --------------------
    for name, target in [
        ("SANMEncoderExport", "SANMEncoder"),
        ("SANMEncoderChunkOptExport", "SANMEncoderChunkOpt"),
        ("SANMVadEncoderExport", "SANMVadEncoder"),
        ("FSMNExport", "FSMN"),
        ("FSMNConvert", "FSMN"),
        ("FSMNMT", "FSMN"),
        ("FSMNMTConvert", "FSMN"),
        # NOTE: ChunkConformerEncoder / QwenAudioEncoder /
        # OpenAIWhisperEncoderWarp are NOT aliases — they have faithful
        # implementations (models/conformer/encoder.py:202,
        # models/whisper/encoders.py) registered before this module runs.
    ]:
        _alias("encoder_classes", name, target)

    # --- decoders -------------------------------------------------------------
    for name, target in [
        ("ParaformerSANMDecoderExport", "ParaformerSANMDecoder"),
        ("ParaformerSANMDecoderOnlineExport", "ParaformerSANMDecoder"),
        ("ParaformerSANMDecoder_v2_community", "ParaformerSANMDecoder"),
        ("ContextualParaformerDecoderExport", "ContextualParaformerDecoder"),
        # reference FsmnDecoder (sanm/decoder.py:203) is the AR embed+FSMN
        # decoder — same layout as the SCAMA decoder (scama/decoder.py:204)
        ("FsmnDecoder", "FsmnDecoderSCAMAOpt"),
        ("FsmnDecoderSCAMAOpt", "ParaformerSANMDecoder"),
        ("TransformerRWKVDecoder", "TransformerDecoder"),
        ("OpenAIWhisperDecoderWarp", "TransformerDecoder"),
        ("rnn_decoder", "TransformerDecoder"),
    ]:
        _alias("decoder_classes", name, target)

    # transducer prediction network registered under the reference's names
    try:
        from funasr_tpu.models.transducer.model import JointNetwork
        tables.joint_network_classes.setdefault("joint_network", JointNetwork)
        tables.joint_network_classes.setdefault("JointNetwork", JointNetwork)
    except ImportError:
        pass

    # --- whisper size spellings ------------------------------------------------
    for size in ["tiny", "tiny.en", "base", "base.en", "small", "small.en",
                 "medium", "medium.en", "large-v1", "large-v2", "large-v3",
                 "large-v3-turbo"]:
        _alias("model_classes", f"Whisper-{size}", f"whisper-{size}")
        _alias("model_classes", f"Whisper-{size}", "whisper-large-v3")

    # --- HF hub paths / brand spellings used as model keys ---------------------
    for name, target in [
        ("Qwen-Audio", "QwenAudio"), ("Qwen/Qwen-Audio", "QwenAudio"),
        ("Qwen/QwenAudio", "QwenAudio"),
        ("Qwen-Audio-Chat", "QwenAudioChat"),
        ("Qwen/Qwen-Audio-Chat", "QwenAudioChat"),
        ("Qwen/QwenAudioChat", "QwenAudioChat"),
        ("QwenAudioChatWarp", "QwenAudioChat"),
        ("Qwen/Qwen3-ASR-0.6B", "Qwen3ASR"), ("Qwen/Qwen3-ASR-1.7B", "Qwen3ASR"),
        ("ZhipuAI/GLM-ASR-Nano-2512", "GLMASR"),
        ("zai-org/GLM-ASR-Nano-2512", "GLMASR"),
        ("iic/speech_eres2netv2_sv_zh-cn_16k-common", "ERes2NetV2"),
    ]:
        _alias("model_classes", name, target)

    # --- samplers: per-recipe spellings over the two real strategies -----------
    for name, target in [
        # example-count batches
        ("CustomDistributedBatchSampler", "BatchSampler"),
        ("RankFullLocalShuffleBatchSampler", "BatchSampler"),
        # token-budget dynamic batches
        ("CustomDistributedDynamicBatchSampler",
         "CustomDistributedBufferDynamicBatchSampler"),
        ("DynamicBatchLocalShuffleSampler",
         "CustomDistributedBufferDynamicBatchSampler"),
        ("RankFullLocalShuffleDynamicBatchSampler",
         "CustomDistributedBufferDynamicBatchSampler"),
        ("EspnetStyleBatchSampler",
         "CustomDistributedBufferDynamicBatchSampler"),
        ("BatchSamplerEpoch", "BatchSampler"),
    ]:
        _alias("batch_sampler_classes", name, target)

    # --- datasets ---------------------------------------------------------------
    for name, target in [
        ("FunASR", "AudioDataset"),
        ("AudioLLMDataset", "LLMDataset"),
        ("AudioLLMARDataset", "LLMDataset"),
        ("AudioLLMNARDataset", "LLMDataset"),
        ("AudioLLMQwenAudioDataset", "LLMQwenAudioDataset"),
        ("AudioLLMVicunaDataset", "LLMVicunaDataset"),
        ("SenseVoiceCTCDataset", "SenseVoiceDataset"),
        ("KwsMTDataset", "KWSDataset"),
    ]:
        _alias("dataset_classes", name, target)
    _alias("index_ds_classes", "FunASR", "IndexDSJsonl")

    # --- dataloader / preprocessors --------------------------------------------
    _alias("dataloader_classes", "DataloaderIterable", "DataloaderMapStyle")
    _alias("preprocessor_classes", "SpeechPreprocessSpeedPerturb", "SpeedPerturb")

    try:
        from funasr_tpu.datasets.audio_datasets.preprocessor import (  # noqa
            TextPreprocessRemovePunctuation)  # registers itself
    except ImportError:
        pass


register_parity_aliases()
