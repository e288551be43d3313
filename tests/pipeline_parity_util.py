"""Shared builders for full-pipeline transcript parity tests.

Builds tiny random-weight reference-layout model directories (config.yaml +
model.pt + tokens) for a VAD -> BiCifParaformer -> punctuation -> speaker
pipeline, plus the environment shims that let the LIVE reference torch
pipeline (``/root/reference/funasr``) run in this box:

- a functional ``omegaconf`` stand-in (load/merge/to_container over PyYAML),
- ``torchaudio.compliance.kaldi.fbank`` delegating to our golden-tested
  numpy/JAX fbank (``funasr_tpu/ops/fbank.py``) so BOTH pipelines consume
  bit-identical features and the comparison isolates orchestration + model
  math (reference fbank call: ``funasr/frontends/wav_frontend.py:171-181``).
"""

import os
import sys
import types

import numpy as np

REF = "/root/reference"
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

TOKENS = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i) for i in range(60)] + ["<unk>"]


def install_omegaconf_shim():
    """Force-install a functional omegaconf (the reference's config loader)."""
    import importlib.machinery

    import yaml

    mod = sys.modules.get("omegaconf")
    if mod is None:
        mod = types.ModuleType("omegaconf")
        mod.__spec__ = importlib.machinery.ModuleSpec("omegaconf", loader=None)
        sys.modules["omegaconf"] = mod

    class DictConfig(dict):
        pass

    class ListConfig(list):
        pass

    def _deep_merge(a, b):
        out = dict(a)
        for k, v in dict(b).items():
            if k in out and isinstance(out[k], dict) and isinstance(v, dict):
                out[k] = _deep_merge(out[k], v)
            else:
                out[k] = v
        return DictConfig(out)

    def _to_plain(x):
        if isinstance(x, dict):
            return {k: _to_plain(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [_to_plain(v) for v in x]
        return x

    class OmegaConf:
        @staticmethod
        def load(path):
            with open(path, encoding="utf-8") as f:
                return DictConfig(yaml.safe_load(f) or {})

        @staticmethod
        def merge(a, b):
            return _deep_merge(dict(a), dict(b))

        @staticmethod
        def to_container(cfg, resolve=True):
            return _to_plain(cfg)

        @staticmethod
        def create(obj=None):
            return DictConfig(dict(obj) if obj else {})

        @staticmethod
        def save(config, f):
            with open(f, "w", encoding="utf-8") as fh:
                yaml.safe_dump(_to_plain(config), fh, allow_unicode=True)

    existing = getattr(mod, "OmegaConf", None)
    if existing is not None and existing is not OmegaConf:
        # another test file installed a partial OmegaConf first and the
        # reference package may already hold a stale `from omegaconf import
        # OmegaConf` binding in its module globals — augment that class IN
        # PLACE so every existing binding gains the missing methods
        for name in ("load", "merge", "to_container", "create", "save"):
            if not hasattr(existing, name):
                # plain-function assignment works for both class targets
                # (class-level access returns the function unbound) and the
                # SimpleNamespace partial from conftest
                setattr(existing, name, getattr(OmegaConf, name))
    else:
        mod.OmegaConf = OmegaConf
    if not hasattr(mod, "DictConfig"):
        mod.DictConfig = DictConfig
    if not hasattr(mod, "ListConfig"):
        mod.ListConfig = ListConfig
    return mod


def install_fbank_shim():
    """torchaudio.compliance.kaldi.fbank -> funasr_tpu.ops.fbank (CPU jax)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    from funasr_tpu.ops.fbank import fbank as jfbank

    def _fbank(waveform, num_mel_bins=23, frame_length=25.0, frame_shift=10.0,
               dither=0.0, energy_floor=0.0, window_type="povey",
               sample_frequency=16000.0, snip_edges=True, **kw):
        w = np.asarray(waveform, np.float32)[0]
        m = jfbank(jax.numpy.asarray(w), num_mel_bins=num_mel_bins,
                   frame_length=int(sample_frequency * 0.001 * frame_length),
                   frame_shift=int(sample_frequency * 0.001 * frame_shift),
                   sample_frequency=sample_frequency, dither=0.0,
                   window_type=window_type, snip_edges=snip_edges)
        return torch.from_numpy(np.asarray(m))

    import torchaudio.compliance.kaldi as K

    K.fbank = _fbank


def install_all_shims():
    from tests.conftest import stub_reference_deps

    stub_reference_deps()
    install_omegaconf_shim()
    install_fbank_shim()


def write_cmvn(path, dim):
    means = " ".join(["0.0"] * dim)
    istd = " ".join(["1.0"] * dim)
    with open(path, "w") as f:
        f.write(f"<Nnet>\n<Splice> {dim} {dim}\n[ 0 ]\n"
                f"<AddShift> {dim} {dim}\n<LearnRateCoef> 0 [ {means} ]\n"
                f"<Rescale> {dim} {dim}\n<LearnRateCoef> 0 [ {istd} ]\n</Nnet>\n")


def build_bicif_asr_dir(d, seed=0):
    """Tiny BiCifParaformer (timestamps via CifPredictorV3 upsample) model dir."""
    import torch
    import yaml

    torch.manual_seed(seed)
    from funasr.models.bicif_paraformer.cif_predictor import CifPredictorV3
    from funasr.models.paraformer.decoder import ParaformerSANMDecoder
    from funasr.models.sanm.encoder import SANMEncoder

    enc = SANMEncoder(input_size=560, output_size=32, attention_heads=4,
                      linear_units=64, num_blocks=2, input_layer="pe",
                      kernel_size=11, sanm_shfit=0)
    dec = ParaformerSANMDecoder(vocab_size=len(TOKENS), encoder_output_size=32,
                                attention_heads=4, linear_units=64, num_blocks=2,
                                att_layer_num=2, kernel_size=11, sanm_shfit=0)
    cif = CifPredictorV3(idim=32, l_order=1, r_order=1, threshold=1.0,
                         tail_threshold=0.45, upsample_times=3,
                         upsample_type="cnn_blstm", use_cif1_cnn=True)
    sd = {}
    for prefix, mod in (("encoder", enc), ("decoder", dec), ("predictor", cif)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    torch.save(sd, os.path.join(d, "model.pt"))
    with open(os.path.join(d, "tokens.txt"), "w") as f:
        f.write("\n".join(TOKENS) + "\n")
    write_cmvn(os.path.join(d, "am.mvn"), 560)
    cfg = dict(
        model="BiCifParaformer",
        model_conf=dict(sos=1, eos=2, predictor_bias=1, ctc_weight=0.0),
        encoder="SANMEncoder",
        encoder_conf=dict(output_size=32, attention_heads=4, linear_units=64,
                          num_blocks=2, input_layer="pe", kernel_size=11,
                          sanm_shfit=0),
        decoder="ParaformerSANMDecoder",
        decoder_conf=dict(attention_heads=4, linear_units=64, num_blocks=2,
                          att_layer_num=2, kernel_size=11, sanm_shfit=0),
        predictor="CifPredictorV3",
        predictor_conf=dict(idim=32, l_order=1, r_order=1, threshold=1.0,
                            tail_threshold=0.45, upsample_times=3,
                            upsample_type="cnn_blstm", use_cif1_cnn=True),
        frontend="WavFrontend",
        frontend_conf=dict(fs=16000, window="hamming", n_mels=80,
                           frame_length=25, frame_shift=10, lfr_m=7, lfr_n=6,
                           cmvn_file="am.mvn", dither=0.0),
        tokenizer="CharTokenizer",
        tokenizer_conf=dict(token_list="tokens.txt", unk_symbol="<unk>"),
    )
    with open(os.path.join(d, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f, allow_unicode=True)
    return d


def _craft_energy_vad(enc):
    """Overwrite the random FSMN with a deterministic energy detector so the
    VAD emits REAL multi-segment output on synthetic audio: every layer
    averages its input (ReLUs inert for positive means), memory convs zeroed,
    and the output affine maps mean feature energy m to logits
    sil=5-5m / speech=5m (softmax over the 248 pdfs; all other pdfs at -30).
    Quiet frames (log-mel of near-silence -> negative mean -> m=0 post-ReLU)
    classify sil; tone bursts classify speech."""
    import torch

    with torch.no_grad():
        enc.in_linear1.linear.weight.fill_(1.0 / enc.input_dim)
        enc.in_linear1.linear.bias.zero_()
        enc.in_linear2.linear.weight.fill_(1.0 / enc.input_affine_dim)
        enc.in_linear2.linear.bias.zero_()
        for blk in enc.fsmn:
            blk.linear.linear.weight.fill_(1.0 / enc.linear_dim)
            blk.fsmn_block.conv_left.weight.zero_()
            blk.affine.linear.weight.fill_(1.0 / enc.proj_dim)
            blk.affine.linear.bias.zero_()
        enc.out_linear1.linear.weight.fill_(1.0 / enc.linear_dim)
        enc.out_linear1.linear.bias.zero_()
        # gentle gains: P_sil must stay > 0 in fp32 (the reference takes
        # math.log of it, model.py:796) — sil logit 3-2m vs speech 2m
        enc.out_linear2.linear.weight.zero_()
        enc.out_linear2.linear.weight[0].fill_(-2.0 / enc.output_affine_dim)
        enc.out_linear2.linear.weight[1].fill_(2.0 / enc.output_affine_dim)
        enc.out_linear2.linear.bias.fill_(-10.0)
        enc.out_linear2.linear.bias[0] = 3.0
        enc.out_linear2.linear.bias[1] = 0.0


def build_vad_dir(d, seed=1, crafted=True):
    import torch
    import yaml

    torch.manual_seed(seed)
    from funasr.models.fsmn_vad_streaming.encoder import FSMN

    enc_conf = dict(input_dim=400, input_affine_dim=140, fsmn_layers=4,
                    linear_dim=250, proj_dim=128, lorder=20, rorder=0,
                    lstride=1, rstride=1, output_affine_dim=140, output_dim=248)
    enc = FSMN(**enc_conf)
    if crafted:
        _craft_energy_vad(enc)
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    torch.save(sd, os.path.join(d, "model.pt"))
    write_cmvn(os.path.join(d, "am.mvn"), 400)
    cfg = dict(
        model="FsmnVADStreaming",
        model_conf=dict(max_end_silence_time=800, speech_noise_thres=0.6,
                        sil_pdf_ids=[0]),
        encoder="FSMN", encoder_conf=enc_conf,
        frontend="WavFrontendOnline",
        frontend_conf=dict(fs=16000, window="hamming", n_mels=80,
                           frame_length=25, frame_shift=10, lfr_m=5, lfr_n=1,
                           cmvn_file="am.mvn", dither=0.0),
    )
    with open(os.path.join(d, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f, allow_unicode=True)
    return d


def build_punc_dir(d, seed=2):
    import torch
    import yaml

    torch.manual_seed(seed)
    from funasr.models.ct_transformer.model import CTTransformer

    conf = dict(
        encoder="SANMEncoder",
        encoder_conf=dict(input_size=32, output_size=32, attention_heads=4,
                          linear_units=64, num_blocks=2, input_layer="pe",
                          kernel_size=11, sanm_shfit=0),
        vocab_size=len(TOKENS), punc_list=["<unk>", "_", "，", "。", "？", "、"],
        embed_unit=32, att_unit=32, sentence_end_id=3)
    ref = CTTransformer(**conf)
    torch.save(ref.state_dict(), os.path.join(d, "model.pt"))
    with open(os.path.join(d, "tokens.txt"), "w") as f:
        f.write("\n".join(TOKENS) + "\n")
    cfg = dict(model="CTTransformer",
               model_conf=dict(punc_list=conf["punc_list"], embed_unit=32,
                               att_unit=32, sentence_end_id=3),
               encoder="SANMEncoder", encoder_conf=conf["encoder_conf"],
               tokenizer="CharTokenizer",
               tokenizer_conf=dict(token_list="tokens.txt", unk_symbol="<unk>"))
    with open(os.path.join(d, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f, allow_unicode=True)
    return d


def build_spk_dir(d, seed=3):
    import torch
    import yaml

    torch.manual_seed(seed)
    from funasr.models.campplus.model import CAMPPlus

    conf = dict(feat_dim=80, embedding_size=16, growth_rate=4, bn_size=2,
                init_channels=8, config_str="batchnorm-relu",
                memory_efficient=False, output_level="segment")
    ref = CAMPPlus(**conf)
    torch.save(ref.state_dict(), os.path.join(d, "model.pt"))
    cfg = dict(model="CAMPPlus", model_conf=conf,
               frontend="WavFrontend",
               frontend_conf=dict(fs=16000, window="hamming", n_mels=80,
                                  frame_length=25, frame_shift=10,
                                  lfr_m=1, lfr_n=1, dither=0.0))
    with open(os.path.join(d, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f, allow_unicode=True)
    return d


def multi_segment_wav(seconds=12.0, seed=7):
    """Synthetic long-form audio: tone bursts over a near-silent floor so the
    (random-weight) VAD has energy structure to react to."""
    rng = np.random.default_rng(seed)
    n = int(seconds * 16000)
    wav = rng.standard_normal(n).astype(np.float32) * 1e-6
    bursts = [(0.4, 2.1, 210.0), (3.2, 5.0, 330.0), (6.1, 8.4, 150.0),
              (9.3, 11.2, 420.0)]
    for beg, end, f0 in bursts:
        i, j = int(beg * 16000), min(int(end * 16000), n)
        t = np.arange(j - i) / 16000
        burst = 0.3 * np.sin(2 * np.pi * f0 * t) * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))
        wav[i:j] += burst.astype(np.float32)
    return wav
