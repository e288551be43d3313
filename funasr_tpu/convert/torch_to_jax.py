"""PyTorch checkpoint -> JAX param-pytree converter.

Maps reference FunASR ``model.pt`` state-dict names (e.g.
``encoder.encoders.12.self_attn.linear_q_k_v.weight``) onto this framework's param
trees. Layout changes applied once at load time:

* Linear:           torch (out, in)      -> jnp kernel (in, out)
* depthwise Conv1d: torch (C, 1, K)      -> (K, C)
* full Conv1d:      torch (C_out,C_in,K) -> (K, C_in, C_out)
* LayerNorm:        weight/bias          -> scale/bias

The entry point is :func:`convert_state_dict`, dispatched per model class.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from funasr_tpu.core.module import stack_params


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


class SD:
    """A state-dict view with prefix navigation and consumption tracking."""

    def __init__(self, sd: Dict[str, Any], prefix: str = ""):
        self.sd = sd
        self.prefix = prefix
        self.used = set() if prefix else set()

    def sub(self, name: str) -> "SD":
        child = SD(self.sd, self.prefix + name + ".")
        child.used = self.used
        return child

    def get(self, name: str):
        key = self.prefix + name
        self.used.add(key)
        return _np(self.sd[key])

    def has(self, name: str) -> bool:
        return (self.prefix + name) in self.sd

    def linear(self, name: str):
        p = {"w": self.get(name + ".weight").T}
        if self.has(name + ".bias"):
            p["b"] = self.get(name + ".bias")
        return p

    def norm(self, name: str):
        return {"scale": self.get(name + ".weight"), "bias": self.get(name + ".bias")}

    def dwconv(self, name: str):
        w = self.get(name + ".weight")  # (C, 1, K)
        p = {"w": w[:, 0, :].T}  # (K, C)
        if self.has(name + ".bias"):
            p["b"] = self.get(name + ".bias")
        return p

    def conv1d(self, name: str):
        w = self.get(name + ".weight")  # (C_out, C_in, K)
        p = {"w": w.transpose(2, 1, 0)}
        if self.has(name + ".bias"):
            p["b"] = self.get(name + ".bias")
        return p

    def embedding(self, name: str):
        return {"w": self.get(name + ".weight")}

    def ffn(self, name: str):
        s = self.sub(name)
        return {"w_1": s.linear("w_1"), "w_2": s.linear("w_2")}

    def ffn_dec_sanm(self, name: str):
        s = self.sub(name)
        return {"w_1": s.linear("w_1"), "norm": s.norm("norm"), "w_2": s.linear("w_2")}


# ---------------------------------------------------------------------------
# SANM encoder / Paraformer decoder / predictor
# ---------------------------------------------------------------------------


def _enc_layer(s: SD):
    return {
        "norm1": s.norm("norm1"),
        "norm2": s.norm("norm2"),
        "self_attn": {
            "linear_q_k_v": s.linear("self_attn.linear_q_k_v"),
            "linear_out": s.linear("self_attn.linear_out"),
            "fsmn_block": s.dwconv("self_attn.fsmn_block"),
        },
        "feed_forward": s.ffn("feed_forward"),
    }


def convert_sanm_encoder(sd: SD, num_blocks: int):
    params = {
        "encoders0": _enc_layer(sd.sub("encoders0.0")),
        "after_norm": sd.norm("after_norm"),
    }
    if num_blocks > 1:
        params["encoders"] = stack_params(
            [_enc_layer(sd.sub(f"encoders.{i}")) for i in range(num_blocks - 1)]
        )
    return params


def _dec_layer(s: SD, has_self: bool, has_src: bool):
    p = {"norm1": s.norm("norm1"),
         "feed_forward": s.ffn_dec_sanm("feed_forward")}
    if has_self:
        p["norm2"] = s.norm("norm2")
        p["self_attn"] = {"fsmn_block": s.dwconv("self_attn.fsmn_block")}
    if has_src:
        p["norm3"] = s.norm("norm3")
        p["src_attn"] = {
            "linear_q": s.linear("src_attn.linear_q"),
            "linear_k_v": s.linear("src_attn.linear_k_v"),
            "linear_out": s.linear("src_attn.linear_out"),
        }
    return p


def convert_paraformer_decoder(sd: SD, att_layer_num: int, num_blocks: int,
                               use_output_layer: bool = True):
    params = {
        "decoders": stack_params(
            [_dec_layer(sd.sub(f"decoders.{i}"), True, True)
             for i in range(att_layer_num)]
        ),
        "decoders3": _dec_layer(sd.sub("decoders3.0"), False, False),
        "after_norm": sd.norm("after_norm"),
    }
    if num_blocks - att_layer_num > 0:
        params["decoders2"] = stack_params(
            [_dec_layer(sd.sub(f"decoders2.{i}"), True, False)
             for i in range(num_blocks - att_layer_num)]
        )
    if use_output_layer:
        params["output_layer"] = sd.linear("output_layer")
    if sd.has("embed.0.weight"):
        params["embed"] = sd.embedding("embed.0")
    return params


def convert_pif_predictor(sd: SD):
    """E-Paraformer PIF predictor (reference e_paraformer/pif_predictor.py:17):
    depthwise cif_conv1d + cif_output + per-head sigma/bias."""
    return {
        "cif_conv1d": sd.dwconv("cif_conv1d"),
        "cif_output": sd.linear("cif_output"),
        "sigma": sd.get("sigma"),
        "bias": sd.get("bias"),
    }


def convert_cif_predictor(sd: SD):
    params = {
        "cif_conv1d": sd.conv1d("cif_conv1d"),
        "cif_output": sd.linear("cif_output"),
    }
    # CifPredictorV3 extras (upsample timestamp head)
    if sd.has("upsample_cnn.weight"):
        params["upsample_cnn"] = {"w": sd.get("upsample_cnn.weight"),
                                  "b": sd.get("upsample_cnn.bias")}
        params["cif_output2"] = sd.linear("cif_output2")
    if sd.has("blstm.weight_ih_l0"):
        params["blstm_fw"] = {
            "w_ih": sd.get("blstm.weight_ih_l0").T,
            "w_hh": sd.get("blstm.weight_hh_l0").T,
            "b_ih": sd.get("blstm.bias_ih_l0"),
            "b_hh": sd.get("blstm.bias_hh_l0"),
        }
        params["blstm_bw"] = {
            "w_ih": sd.get("blstm.weight_ih_l0_reverse").T,
            "w_hh": sd.get("blstm.weight_hh_l0_reverse").T,
            "b_ih": sd.get("blstm.bias_ih_l0_reverse"),
            "b_hh": sd.get("blstm.bias_hh_l0_reverse"),
        }
    return params


def convert_ctc(sd: SD):
    return {"ctc_lo": sd.linear("ctc_lo")}


def _dwconv2d(sd: SD, name: str):
    """torch depthwise Conv2d (C, 1, K, 1) -> (K, C) (the VAD FSMN memory convs)."""
    w = sd.get(name + ".weight")
    return {"w": w[:, 0, :, 0].T}


def convert_fsmn(sd: SD, fsmn_layers: int):
    """VAD FSMN encoder (reference ``fsmn_vad_streaming/encoder.py:258-340``)."""
    params = {
        "in_linear1": sd.linear("in_linear1.linear"),
        "in_linear2": sd.linear("in_linear2.linear"),
        "out_linear1": sd.linear("out_linear1.linear"),
        "out_linear2": sd.linear("out_linear2.linear"),
        "fsmn": [],
    }
    for i in range(fsmn_layers):
        s = sd.sub(f"fsmn.{i}")
        block = {
            "linear": s.linear("linear.linear"),
            "conv_left": _dwconv2d(s, "fsmn_block.conv_left"),
            "affine": s.linear("affine.linear"),
        }
        if s.has("fsmn_block.conv_right.weight"):
            block["conv_right"] = _dwconv2d(s, "fsmn_block.conv_right")
        params["fsmn"].append(block)
    return params


def convert_fsmn_vad(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    sd = SD(_strip_module_prefix(state_dict))
    return {"encoder": convert_fsmn(sd.sub("encoder"), model.encoder.cfg.fsmn_layers)}


def _bn(sd: SD, name: str):
    p = {"mean": sd.get(name + ".running_mean"), "var": sd.get(name + ".running_var")}
    if sd.has(name + ".weight"):
        p["scale"] = sd.get(name + ".weight")
        p["bias"] = sd.get(name + ".bias")
    return p


def _conv2d(sd: SD, name: str):
    w = sd.get(name + ".weight")  # (C_out, C_in, KH, KW) -> (KH, KW, C_in, C_out)
    p = {"w": w.transpose(2, 3, 1, 0)}
    if sd.has(name + ".bias"):
        p["b"] = sd.get(name + ".bias")
    return p


def convert_campplus(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """CAM++ (reference ``funasr/models/campplus/model.py:42-200`` layout)."""
    sd = SD(_strip_module_prefix(state_dict))
    head = sd.sub("head")
    p_head = {"conv1": _conv2d(head, "conv1"), "bn1": _bn(head, "bn1"),
              "conv2": _conv2d(head, "conv2"), "bn2": _bn(head, "bn2")}
    for li in (1, 2):
        layers = []
        for bi in range(2):
            s = head.sub(f"layer{li}.{bi}")
            block = {"conv1": _conv2d(s, "conv1"), "bn1": _bn(s, "bn1"),
                     "conv2": _conv2d(s, "conv2"), "bn2": _bn(s, "bn2")}
            if s.has("shortcut.0.weight"):
                block["shortcut"] = {"conv": _conv2d(s, "shortcut.0"),
                                     "bn": _bn(s, "shortcut.1")}
            layers.append(block)
        p_head[f"layer{li}"] = layers

    xv = sd.sub("xvector")
    p_xv = {"tdnn": {"linear": xv.conv1d("tdnn.linear"),
                     "bn": _bn(xv, "tdnn.nonlinear.batchnorm")}}
    from funasr_tpu.models.campplus.model import BLOCKS
    for i, (num_layers, _, _) in enumerate(BLOCKS):
        layers = []
        for j in range(num_layers):
            s = xv.sub(f"block{i + 1}.tdnnd{j + 1}")
            layers.append({
                "nonlinear1": _bn(s, "nonlinear1.batchnorm"),
                "linear1": s.conv1d("linear1"),
                "nonlinear2": _bn(s, "nonlinear2.batchnorm"),
                "cam_layer": {
                    "linear_local": s.conv1d("cam_layer.linear_local"),
                    "linear1": s.conv1d("cam_layer.linear1"),
                    "linear2": s.conv1d("cam_layer.linear2"),
                },
            })
        p_xv[f"block{i + 1}"] = layers
        p_xv[f"transit{i + 1}"] = {
            "nonlinear": _bn(xv, f"transit{i + 1}.nonlinear.batchnorm"),
            "linear": xv.conv1d(f"transit{i + 1}.linear")}
    p_xv["out_nonlinear"] = _bn(xv, "out_nonlinear.batchnorm")
    if xv.has("dense.linear.weight"):
        p_xv["dense"] = {"linear": xv.conv1d("dense.linear"),
                         "nonlinear": _bn(xv, "dense.nonlinear.batchnorm")}
    return {"head": p_head, "xvector": p_xv}


def _aff(sd: SD, name: str):
    s = sd.sub(name)
    return {"conv1": _conv2d(s, "local_att.0"), "bn1": _bn(s, "local_att.1"),
            "conv2": _conv2d(s, "local_att.3"), "bn2": _bn(s, "local_att.4")}


def convert_eres2netv2(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """ERes2NetV2 (reference ``funasr/models/eres2net/eres2netv2.py:185``)."""
    sd = SD(_strip_module_prefix(state_dict))
    params = {"conv1": _conv2d(sd, "conv1"), "bn1": _bn(sd, "bn1")}
    for li, n in enumerate(model.num_blocks):
        layers = []
        use_aff = li >= 2
        for bi in range(n):
            s = sd.sub(f"layer{li + 1}.{bi}")
            block = {"conv1": _conv2d(s, "conv1"), "bn1": _bn(s, "bn1"),
                     "convs": [], "bns": [], "fuse": [],
                     "conv3": _conv2d(s, "conv3"), "bn3": _bn(s, "bn3")}
            j = 0
            while s.has(f"convs.{j}.weight"):
                block["convs"].append(_conv2d(s, f"convs.{j}"))
                block["bns"].append(_bn(s, f"bns.{j}"))
                j += 1
            if use_aff:
                k = 0
                while s.has(f"fuse_models.{k}.local_att.0.weight"):
                    block["fuse"].append(_aff(s, f"fuse_models.{k}"))
                    k += 1
            if s.has("shortcut.0.weight"):
                block["shortcut"] = {"conv": _conv2d(s, "shortcut.0"),
                                     "bn": _bn(s, "shortcut.1")}
            layers.append(block)
        params[f"layer{li + 1}"] = layers
    params["layer3_ds"] = _conv2d(sd, "layer3_ds")
    params["fuse34"] = _aff(sd, "fuse34")
    params["seg_1"] = sd.linear("seg_1")
    return params


def convert_ct_transformer(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    sd = SD(_strip_module_prefix(state_dict))
    return {
        "embed": sd.embedding("embed"),
        "encoder": convert_sanm_encoder(sd.sub("encoder"), model.encoder.cfg.num_blocks),
        "decoder": sd.linear("decoder"),
    }


def convert_sense_voice_encoder(sd: SD, num_blocks: int, tp_blocks: int):
    params = {
        "encoders0": _enc_layer(sd.sub("encoders0.0")),
        "after_norm": sd.norm("after_norm"),
        "tp_norm": sd.norm("tp_norm"),
    }
    if num_blocks > 1:
        params["encoders"] = stack_params(
            [_enc_layer(sd.sub(f"encoders.{i}")) for i in range(num_blocks - 1)])
    if tp_blocks > 0:
        params["tp_encoders"] = stack_params(
            [_enc_layer(sd.sub(f"tp_encoders.{i}")) for i in range(tp_blocks)])
    return params


def convert_sense_voice(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    sd = SD(_strip_module_prefix(state_dict))
    return {
        "encoder": convert_sense_voice_encoder(
            sd.sub("encoder"), model.encoder.cfg.num_blocks, model.encoder.tp_blocks),
        "ctc": convert_ctc(sd.sub("ctc")),
        "embed": sd.embedding("embed"),
    }


def convert_paraformer(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """Full Paraformer family state dict -> params (encoder/decoder/predictor[/ctc]).

    ``model`` is a built ``funasr_tpu.models.paraformer.model.Paraformer`` (or
    subclass); its sub-configs supply layer counts.
    """
    sd = SD(_strip_module_prefix(state_dict))
    params = {
        "encoder": convert_sanm_encoder(sd.sub("encoder"), model.encoder.cfg.num_blocks),
        "decoder": convert_paraformer_decoder(
            sd.sub("decoder"), model.decoder.cfg.att_layer_num,
            model.decoder.cfg.num_blocks, model.decoder.cfg.use_output_layer),
        "predictor": (convert_pif_predictor(sd.sub("predictor"))
                      if sd.has("predictor.sigma")
                      else convert_cif_predictor(sd.sub("predictor"))),
    }
    if model.ctc is not None and "ctc.ctc_lo.weight" in sd.sd:
        params["ctc"] = convert_ctc(sd.sub("ctc"))
    return params


def convert_paraformer_v2(state_dict, model):
    """Paraformer-v2 community (reference paraformer_v2_community/model.py:30):
    encoder + CTC + SANM decoder whose input layer is a Linear(vocab, dim)
    ("decoder.embed.0"); that projection lives at the model level here."""
    sd = SD(_strip_module_prefix(state_dict))
    params = {
        "encoder": convert_sanm_encoder(sd.sub("encoder"),
                                        model.encoder.cfg.num_blocks),
        "decoder": convert_paraformer_decoder(
            sd.sub("decoder"), model.decoder.cfg.att_layer_num,
            model.decoder.cfg.num_blocks, model.decoder.cfg.use_output_layer),
        "ctc": convert_ctc(sd.sub("ctc")),
    }
    params["decoder"].pop("embed", None)
    if sd.has("decoder.embed.0.weight"):
        params["embed"] = sd.linear("decoder.embed.0")
    return params


def _lstm_layer(sd: SD, name: str, layer: int):
    """torch.nn.LSTM layer ``l{layer}`` -> our lstm params (kernels transposed)."""
    return {
        "w_ih": sd.get(f"{name}.weight_ih_l{layer}").T,
        "w_hh": sd.get(f"{name}.weight_hh_l{layer}").T,
        "b_ih": sd.get(f"{name}.bias_ih_l{layer}"),
        "b_hh": sd.get(f"{name}.bias_hh_l{layer}"),
    }


def convert_seaco_paraformer(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """SeACo-Paraformer (the ``paraformer-zh`` default class; reference
    ``funasr/models/seaco_paraformer/model.py:49-148``): BiCifParaformer base +
    2-layer LSTM bias encoder + seaco decoder + hotword output layer."""
    params = convert_paraformer(state_dict, model)
    sd = SD(_strip_module_prefix(state_dict))
    params["bias_encoder"] = [_lstm_layer(sd, "bias_encoder", 0),
                              _lstm_layer(sd, "bias_encoder", 1)]
    if model.seaco_decoder is not None and sd.has("seaco_decoder.after_norm.weight"):
        params["seaco_decoder"] = convert_paraformer_decoder(
            sd.sub("seaco_decoder"), model.seaco_decoder.cfg.att_layer_num,
            model.seaco_decoder.cfg.num_blocks,
            model.seaco_decoder.cfg.use_output_layer)
    params["hotword_output_layer"] = sd.linear("hotword_output_layer")
    return params


def convert_contextual_paraformer(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """ContextualParaformer (reference ``funasr/models/contextual_paraformer/
    decoder.py:216-300``): the torch decoder stores ``att_layer_num - 1`` plain
    layers plus ``last_decoder``; we stack them all into ``decoders`` (the apply
    path splits off the last layer), plus bias_decoder/bias_output and the
    model-level bias_embed + 1-layer LSTM bias encoder."""
    sd = SD(_strip_module_prefix(state_dict))
    dec = sd.sub("decoder")
    att = model.decoder.cfg.att_layer_num
    num_blocks = model.decoder.cfg.num_blocks
    dec_layers = [_dec_layer(dec.sub(f"decoders.{i}"), True, True)
                  for i in range(att - 1)]
    dec_layers.append(_dec_layer(dec.sub("last_decoder"), True, True))
    dec_params = {
        "decoders": stack_params(dec_layers),
        "decoders3": _dec_layer(dec.sub("decoders3.0"), False, False),
        "after_norm": dec.norm("after_norm"),
        "bias_decoder": {
            "norm3": dec.norm("bias_decoder.norm3"),
            "src_attn": {
                "linear_q": dec.linear("bias_decoder.src_attn.linear_q"),
                "linear_k_v": dec.linear("bias_decoder.src_attn.linear_k_v"),
                "linear_out": dec.linear("bias_decoder.src_attn.linear_out"),
            },
        },
        "bias_output": {"w": dec.get("bias_output.weight").transpose(2, 1, 0)},
    }
    if num_blocks - att > 0:
        dec_params["decoders2"] = stack_params(
            [_dec_layer(dec.sub(f"decoders2.{i}"), True, False)
             for i in range(num_blocks - att)])
    if model.decoder.cfg.use_output_layer:
        dec_params["output_layer"] = dec.linear("output_layer")
    if dec.has("embed.0.weight"):
        dec_params["embed"] = dec.embedding("embed.0")
    params = {
        "encoder": convert_sanm_encoder(sd.sub("encoder"),
                                        model.encoder.cfg.num_blocks),
        "decoder": dec_params,
        "predictor": convert_cif_predictor(sd.sub("predictor")),
        "bias_embed": sd.embedding("bias_embed"),
        "bias_encoder": _lstm_layer(sd, "bias_encoder", 0),
    }
    if model.ctc is not None and "ctc.ctc_lo.weight" in sd.sd:
        params["ctc"] = convert_ctc(sd.sub("ctc"))
    return params


def convert_eend_ola(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """EEND-OLA (reference ``funasr/models/eend/e2e_diar_eend_ola.py:90``):
    flat-attribute transformer encoder (``enc.lnorm1_i`` / ``enc.self_att_i``)
    + EDA LSTMs + PostNet LSTM + powerlabel output layer."""
    sd = SD(_strip_module_prefix(state_dict))
    enc = sd.sub("enc")
    enc_params = {
        "linear_in": enc.linear("linear_in"),
        "lnorm_out": enc.norm("lnorm_out"),
        "layers": [],
    }
    for i in range(model.encoder.n_layers):
        att = enc.sub(f"self_att_{i}")
        ff = enc.sub(f"ff_{i}")
        enc_params["layers"].append({
            "lnorm1": enc.norm(f"lnorm1_{i}"),
            "att": {"linearQ": att.linear("linearQ"),
                    "linearK": att.linear("linearK"),
                    "linearV": att.linear("linearV"),
                    "linearO": att.linear("linearO")},
            "lnorm2": enc.norm(f"lnorm2_{i}"),
            "ff": {"linear1": ff.linear("linear1"),
                   "linear2": ff.linear("linear2")},
        })
    return {
        "encoder": enc_params,
        "eda_encoder": _lstm_layer(sd, "encoder_decoder_attractor.encoder", 0),
        "eda_decoder": _lstm_layer(sd, "encoder_decoder_attractor.decoder", 0),
        "counter": sd.linear("encoder_decoder_attractor.counter"),
        "postnet": _lstm_layer(sd, "postnet", 0),
        "output_layer": sd.linear("output_layer"),
    }


def convert_emotion2vec(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """emotion2vec / data2vec-2.0 audio (reference ``funasr/models/emotion2vec/
    model.py:40``): conv feature extractor + feature projection + grouped
    positional convs + alibi scale + extra tokens + prenet/main AltBlocks +
    emotion head."""
    sd = SD(_strip_module_prefix(state_dict))
    aud = sd.sub("modality_encoders.AUDIO")

    def alt_block(s: SD):
        return {
            "norm1": s.norm("norm1"),
            "attn": {"qkv": s.linear("attn.qkv"),
                     "proj": s.linear("attn.proj")},
            "norm2": s.norm("norm2"),
            "mlp": {"fc1": s.linear("mlp.fc1"), "fc2": s.linear("mlp.fc2")},
        }

    params: Dict[str, Any] = {
        "local_encoder": [],
        "project_features": {"norm": aud.norm("project_features.1"),
                             "linear": aud.linear("project_features.2")},
        "pos_conv": [],
        "extra_tokens": aud.get("extra_tokens"),
        "alibi_scale": aud.get("alibi_scale"),
        "prenet_norm": aud.norm("context_encoder.norm"),
        "prenet_blocks": [
            alt_block(aud.sub(f"context_encoder.blocks.{i}"))
            for i in range(model.prenet_depth)],
        "blocks": [alt_block(sd.sub(f"blocks.{i}"))
                   for i in range(model.depth)],
    }
    for i in range(len(model.FEATURE_SPEC)):
        params["local_encoder"].append({
            # torch conv1d (C_out, C_in, K) -> (K, C_in, C_out)
            "conv": {"w": aud.get(f"local_encoder.conv_layers.{i}.0.weight")
                     .transpose(2, 1, 0)},
            "norm": aud.norm(f"local_encoder.conv_layers.{i}.2.1"),
        })
    for i in range(model.conv_pos_depth):
        # Sequential: [TransposeLast, block x depth, TransposeLast]; grouped
        # conv weight (C_out, C_in/groups, K) -> (K, C_in/groups, C_out)
        params["pos_conv"].append({
            "w": aud.get(f"relative_positional_encoder.{i + 1}.0.weight")
            .transpose(2, 1, 0),
            "b": aud.get(f"relative_positional_encoder.{i + 1}.0.bias"),
        })
    if sd.has("proj.weight"):
        params["proj"] = sd.linear("proj")
    return params


def convert_monotonic_aligner(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """MonotonicAligner / fa-zh (reference ``funasr/models/monotonic_aligner/
    model.py:24``): SANM encoder + CifPredictorV3 (upsample timestamp head)."""
    sd = SD(_strip_module_prefix(state_dict))
    return {
        "encoder": convert_sanm_encoder(sd.sub("encoder"),
                                        model.encoder.cfg.num_blocks),
        "predictor": convert_cif_predictor(sd.sub("predictor")),
    }


def convert_openai_whisper(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """OpenAI ``whisper`` package checkpoint layout (``encoder.blocks.N.attn.query``
    etc., the format the reference loads via the whisper pkg,
    ``funasr/models/whisper/model.py:20-190``) -> our whisper param tree."""
    sd = SD(_strip_module_prefix(state_dict))

    def mha(prefix):
        return {"linear_q": sd.linear(prefix + ".query"),
                "linear_k": {"w": sd.get(prefix + ".key.weight").T},
                "linear_v": sd.linear(prefix + ".value"),
                "linear_out": sd.linear(prefix + ".out")}

    cfg = model.cfg
    enc = {
        "conv1": sd.conv1d("encoder.conv1"),
        "conv2": sd.conv1d("encoder.conv2"),
        "layers": [],
        "layer_norm": sd.norm("encoder.ln_post"),
    }
    for i in range(cfg.encoder_layers):
        p = f"encoder.blocks.{i}"
        enc["layers"].append({
            "self_attn_layer_norm": sd.norm(p + ".attn_ln"),
            "self_attn": mha(p + ".attn"),
            "final_layer_norm": sd.norm(p + ".mlp_ln"),
            "fc1": sd.linear(p + ".mlp.0"), "fc2": sd.linear(p + ".mlp.2")})
    dec = {
        "embed_tokens": sd.get("decoder.token_embedding.weight"),
        "embed_positions": sd.get("decoder.positional_embedding"),
        "layers": [],
        "layer_norm": sd.norm("decoder.ln"),
    }
    for i in range(cfg.decoder_layers):
        p = f"decoder.blocks.{i}"
        dec["layers"].append({
            "self_attn_layer_norm": sd.norm(p + ".attn_ln"),
            "self_attn": mha(p + ".attn"),
            "encoder_attn_layer_norm": sd.norm(p + ".cross_attn_ln"),
            "encoder_attn": mha(p + ".cross_attn"),
            "final_layer_norm": sd.norm(p + ".mlp_ln"),
            "fc1": sd.linear(p + ".mlp.0"), "fc2": sd.linear(p + ".mlp.2")})
    return {"encoder": enc, "decoder": dec}


def convert_whisper_tower(view: SD, n_layer: int) -> Dict[str, Any]:
    """Whisper-style audio tower (reference ``funasr/models/qwen_audio/audio.py:406``
    QwenAudioEncoder / ``whisper_lid/encoder.py:18`` OpenAIWhisperEncoderWarp):
    conv1/conv2 + blocks.N.{attn,mlp} + ln_post [+ proj + audio_bos_eos_token]."""

    def mha(prefix):
        return {"linear_q": view.linear(prefix + ".query"),
                "linear_k": {"w": view.get(prefix + ".key.weight").T},
                "linear_v": view.linear(prefix + ".value"),
                "linear_out": view.linear(prefix + ".out")}

    p: Dict[str, Any] = {
        "conv1": view.conv1d("conv1"),
        "conv2": view.conv1d("conv2"),
        "layers": [],
        "ln_post": view.norm("ln_post"),
    }
    for i in range(n_layer):
        pre = f"blocks.{i}"
        p["layers"].append({
            "self_attn_layer_norm": view.norm(pre + ".attn_ln"),
            "self_attn": mha(pre + ".attn"),
            "final_layer_norm": view.norm(pre + ".mlp_ln"),
            "fc1": view.linear(pre + ".mlp.0"),
            "fc2": view.linear(pre + ".mlp.2")})
    if view.has("proj.weight"):
        p["proj"] = view.linear("proj")
    if view.has("audio_bos_eos_token.weight"):
        p["audio_bos_eos_token"] = view.get("audio_bos_eos_token.weight")
    return p


def _convert_audio_encoder(view: SD, encoder) -> Dict[str, Any]:
    """Dispatch an LLM-ASR audio-encoder sub-dict on the encoder's class."""
    from funasr_tpu.models.whisper.encoders import (
        OpenAIWhisperEncoderWarp, QwenAudioEncoder)
    if isinstance(encoder, (QwenAudioEncoder, OpenAIWhisperEncoderWarp)):
        return convert_whisper_tower(view, encoder.cfg.n_layer)
    return convert_sanm_encoder(view, encoder.cfg.num_blocks)


def merge_lora_weights(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Fold peft-style LoRA adapters into their base weights and strip the peft
    wrapper prefixes (reference loads LoRA via peft at
    ``funasr/models/fun_asr_nano/model.py:133-147``): W <- W + scale * B @ A.
    The scale (lora_alpha / r) is taken as 1.0 when not recoverable from keys
    (merged production checkpoints ship without adapters anyway)."""
    out: Dict[str, Any] = {}
    loras: Dict[str, Dict[str, Any]] = {}
    for k, v in sd.items():
        k2 = k.replace("base_model.model.", "")
        if ".lora_A." in k2 or ".lora_B." in k2:
            for tag in (".lora_A.", ".lora_B."):
                if tag in k2:
                    base, _, _rest = k2.partition(tag)
                    loras.setdefault(base, {})[tag.strip(".")] = v
            continue
        out[k2.replace(".base_layer.", ".")] = v
    for base, ab in loras.items():
        if "lora_A" not in ab or "lora_B" not in ab:
            continue
        wkey = base + ".weight"
        if wkey in out:
            a = _np(ab["lora_A"])
            b = _np(ab["lora_B"])
            out[wkey] = _np(out[wkey]) + b @ a
    return out


def convert_fun_asr_nano(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """Fun-ASR-Nano (reference ``funasr/models/fun_asr_nano/model.py:33``):
    SANM audio encoder + Linear/Transformer adaptor + HF Qwen LLM (LoRA merged)
    + optional ctc_decoder/CTC timestamp branch."""
    from funasr_tpu.models.llm.qwen import convert_hf_qwen

    sd_raw = merge_lora_weights(_strip_module_prefix(state_dict))
    sd = SD(sd_raw)

    def adaptor_params(view: SD):
        p = {"linear1": view.linear("linear1"),
             "linear2": view.linear("linear2")}
        i = 0
        blocks = []
        # espnet EncoderLayer blocks of the Transformer adaptor (ref
        # adaptor.py:150-170): self_attn MHA + half-dim FFN, pre-norm
        while view.has(f"blocks.{i}.norm1.weight"):
            s = view.sub(f"blocks.{i}")
            blocks.append({
                "norm1": s.norm("norm1"),
                "norm2": s.norm("norm2"),
                "self_attn": {"linear_q": s.linear("self_attn.linear_q"),
                              "linear_k": s.linear("self_attn.linear_k"),
                              "linear_v": s.linear("self_attn.linear_v"),
                              "linear_out": s.linear("self_attn.linear_out")},
                "feed_forward": s.ffn("feed_forward"),
            })
            i += 1
        if blocks:
            p["blocks"] = blocks
        return p

    params: Dict[str, Any] = {
        "audio_encoder": _convert_audio_encoder(
            sd.sub("audio_encoder"), model.audio_encoder),
        "audio_adaptor": adaptor_params(sd.sub("audio_adaptor")),
        "llm": convert_hf_qwen(
            {k[len("llm."):]: v for k, v in sd_raw.items()
             if k.startswith("llm.")}, model.llm_cfg),
    }
    if model.ctc_decoder is not None and sd.has("ctc_decoder.linear1.weight"):
        params["ctc_decoder"] = adaptor_params(sd.sub("ctc_decoder"))
    if model.ctc is not None and "ctc.ctc_lo.weight" in sd_raw:
        params["ctc"] = convert_ctc(sd.sub("ctc"))
    return params


def convert_whisper(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    sd = _strip_module_prefix(state_dict)
    if any(k.startswith("model.encoder.conv1") for k in sd):  # HF layout
        from funasr_tpu.models.whisper.model import convert_hf_whisper
        return convert_hf_whisper(sd, model)
    return convert_openai_whisper(sd, model)


def _sond_resnet(sd: SD, model) -> Dict[str, Any]:
    """ResNet34(SpL2Reg)Diar (ref ``sond/encoder/resnet34_encoder.py:345,451``)."""
    p: Dict[str, Any] = {}
    if sd.has("pre_conv.weight"):
        p["pre_conv"] = _conv2d(sd, "pre_conv")
        p["pre_conv_bn"] = _bn(sd, "pre_conv_bn")
    for bi, n_layer in enumerate(model.layers_in_block):
        layers = []
        for li in range(n_layer):
            s = sd.sub(f"block_{bi}.layer_{li}")
            lp = {"bn1": _bn(s, "bn1"), "conv1": _conv2d(s, "conv1"),
                  "bn2": _bn(s, "bn2"), "conv2": _conv2d(s, "conv2")}
            if s.has("conv_sc.weight"):
                lp["conv_sc"] = _conv2d(s, "conv_sc")
                lp["bn_sc"] = _bn(s, "bn_sc")
            layers.append(lp)
        p[f"block_{bi}"] = layers
    p["resnet0_dense"] = sd.conv1d("resnet0_dense") if model.sp_l2reg \
        else _conv2d(sd, "resnet0_dense")
    p["resnet0_bn"] = _bn(sd, "resnet0_bn")
    for head in ("resnet1", "resnet2"):
        if sd.has(f"{head}_dense.weight"):
            p[f"{head}_dense"] = sd.linear(f"{head}_dense")
            p[f"{head}_bn"] = _bn(sd, f"{head}_bn")
    return p


def _sond_fsmn(sd: SD, model) -> Dict[str, Any]:
    """FsmnEncoder (ref ``sond/encoder/fsmn_encoder.py:110``)."""

    def _ffn(s: SD):
        return {"w_1": s.conv1d("w_1"), "norm": s.norm("norm"),
                "w_2": s.conv1d("w_2")}

    p = {"fsmn_layers": [], "dnn_layers": []}
    for i in range(model.fsmn_num_layers):
        s = sd.sub(f"fsmn_layers.{i}")
        p["fsmn_layers"].append({"ffn": _ffn(s.sub("ffn")),
                                 "memory": s.dwconv("memory.fsmn_block")})
    for i in range(model.dnn_num_layers):
        p["dnn_layers"].append(_ffn(sd.sub(f"dnn_layers.{i}")))
    if sd.has("conv1d.weight"):
        p["conv1d"] = sd.conv1d("conv1d")
    return p


def _sond_conv_encoder(sd: SD, model) -> Dict[str, Any]:
    """ConvEncoder (ref ``sond/encoder/conv_encoder.py:89``)."""
    p = {"layers": []}
    for i in range(model.num_layers):
        s = sd.sub(f"cnn_a.{i}")
        lp = {"conv": s.conv1d("conv1d")}
        if s.has("bn.weight"):
            lp["bn"] = _bn(s, "bn")
        p["layers"].append(lp)
    if sd.has("conv_out.weight"):
        p["conv_out"] = sd.conv1d("conv_out")
    if sd.has("after_norm.weight"):
        p["after_norm"] = sd.norm("after_norm")
    return p


def _sond_self_attention(sd: SD, model) -> Dict[str, Any]:
    """SelfAttentionEncoder (ref ``sond/encoder/self_attention_encoder.py:120``)."""
    p = {"encoders": []}
    for i in range(model.num_blocks):
        s = sd.sub(f"encoders.{i}")
        p["encoders"].append({
            "norm1": s.norm("norm1"), "norm2": s.norm("norm2"),
            "self_attn": {"linear_q_k_v": s.linear("self_attn.linear_q_k_v"),
                          "linear_out": s.linear("self_attn.linear_out")},
            "feed_forward": s.ffn("feed_forward"),
        })
    if sd.has("embed.0.weight"):
        p["embed"] = {"linear": sd.linear("embed.0"), "norm": sd.norm("embed.1")}
    elif sd.has("embed.weight"):
        p["embed"] = {"linear": sd.linear("embed")}
    if sd.has("after_norm.weight"):
        p["after_norm"] = sd.norm("after_norm")
    if sd.has("output_linear.weight"):
        p["output_linear"] = sd.linear("output_linear")
    return p


def _conv2d_subsampling(sd: SD) -> Dict[str, Any]:
    """espnet Conv2dSubsampling (ref ``transformer/utils/subsampling.py``):
    conv.0 / conv.2 3x3-stride-2 convs + out.0 linear."""
    return {"conv1": _conv2d(sd, "conv.0"), "conv2": _conv2d(sd, "conv.2"),
            "out": sd.linear("out.0")}


def _espnet_mha(s: SD) -> Dict[str, Any]:
    return {n: s.linear(n) for n in ("linear_q", "linear_k", "linear_v",
                                     "linear_out")}


def convert_mfcca(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """MFCCA (reference ``funasr/models/mfcca/mfcca_encoder.py:104`` +
    ``encoder_layer_mfcca.py:166``): cross-channel attention + conformer layers
    + channel-fusion conv stack, plus the AED decoder/CTC."""
    sd = SD(_strip_module_prefix(state_dict))
    enc_model = model.encoder if hasattr(model, "encoder") and \
        isinstance(getattr(model, "encoder", None), object) and \
        hasattr(model.encoder, "num_blocks") else model
    enc_sd = sd.sub("encoder") if sd.has("encoder.after_norm.weight") else sd

    layers = []
    for i in range(enc_model.num_blocks):
        s = enc_sd.sub(f"encoders.{i}")
        csa = s.sub("encoder_csa")
        lp = {
            "norm_mha_cca": s.norm("norm_mha"),
            "cca": _espnet_mha(s.sub("encoder_cros_channel_atten")),
            "norm_mha": csa.norm("norm_mha"),
            "norm_ff": csa.norm("norm_ff"),
            "feed_forward": csa.ffn("feed_forward"),
        }
        att = _espnet_mha(csa.sub("self_attn"))
        if csa.has("self_attn.linear_pos.weight"):
            att["linear_pos"] = {"w": csa.get("self_attn.linear_pos.weight").T}
            att["pos_bias_u"] = csa.get("self_attn.pos_bias_u")
            att["pos_bias_v"] = csa.get("self_attn.pos_bias_v")
        lp["self_attn"] = att
        if csa.has("conv_module.pointwise_conv1.weight"):
            cm = csa.sub("conv_module")
            lp["norm_conv"] = csa.norm("norm_conv")
            lp["norm_final"] = csa.norm("norm_final")
            dw = cm.get("depthwise_conv.weight")  # (C, 1, K)
            lp["conv_module"] = {
                "pointwise_conv1": cm.conv1d("pointwise_conv1"),
                "depthwise_conv": {"w": dw[:, 0].T,
                                   "b": cm.get("depthwise_conv.bias")},
                "norm": _bn(cm, "norm"),
                "pointwise_conv2": cm.conv1d("pointwise_conv2"),
            }
        layers.append(lp)
    params: Dict[str, Any] = {"encoders": layers,
                              "after_norm": enc_sd.norm("after_norm")}
    if enc_sd.has("embed.conv.0.weight"):
        params["embed"] = _conv2d_subsampling(enc_sd.sub("embed"))
    elif enc_sd.has("embed.0.weight"):
        params["embed"] = {"linear": enc_sd.linear("embed.0"),
                           "norm": enc_sd.norm("embed.1")}
    for name in ("conv1", "conv2", "conv3", "conv4"):
        params[name] = _conv2d(enc_sd, name)
    if enc_model is model:
        return params
    out = {"encoder": params}
    if sd.has("decoder.embed.0.weight") and model.decoder is not None:
        dec = sd.sub("decoder")
        dec_layers = []
        i = 0
        while dec.has(f"decoders.{i}.norm1.weight"):
            s = dec.sub(f"decoders.{i}")
            dec_layers.append({
                "norm1": s.norm("norm1"), "norm2": s.norm("norm2"),
                "norm3": s.norm("norm3"),
                "self_attn": _espnet_mha(s.sub("self_attn")),
                "src_attn": _espnet_mha(s.sub("src_attn")),
                "feed_forward": s.ffn("feed_forward"),
            })
            i += 1
        from funasr_tpu.core.module import stack_params
        out["decoder"] = {"embed": dec.embedding("embed.0"),
                          "decoders": stack_params(dec_layers),
                          "after_norm": dec.norm("after_norm"),
                          "output_layer": dec.linear("output_layer")}
    if sd.has("ctc.ctc_lo.weight") and model.ctc is not None:
        out["ctc"] = {"ctc_lo": sd.linear("ctc.ctc_lo")}
    return out


def convert_mossformer(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """MossFormer separation (reference ``funasr/models/mossformer/``): conv
    encoder, FLASH gated-attention MaskNet, transposed-conv decoder."""
    sd = SD(_strip_module_prefix(state_dict))

    def _ffconvm(s: SD):
        # MaskNet blocks use ScaleNorm (param "g"); standalone FLASH uses LN
        norm = {"g": s.get("mdl.0.g")} if s.has("mdl.0.g") \
            else {"g": s.get("mdl.0.weight")}
        return {"norm": norm, "linear": s.linear("mdl.1"),
                "conv": {"w": s.get("mdl.3.sequential.1.conv.weight")[:, 0].T}}

    blocks = []
    for i in range(model.num_blocks):
        s = sd.sub(f"mask_net.mdl.intra_mdl.mossformerM.layers.{i}")
        blocks.append({
            "to_hidden": _ffconvm(s.sub("to_hidden")),
            "to_qk": _ffconvm(s.sub("to_qk")),
            "qk_offset_scale": {"gamma": s.get("qk_offset_scale.gamma"),
                                "beta": s.get("qk_offset_scale.beta")},
            "to_out": _ffconvm(s.sub("to_out")),
        })
    mn = sd.sub("mask_net")
    return {
        "enc": {"w": sd.get("enc.conv1d.weight").transpose(2, 1, 0)},
        "norm": {"scale": mn.get("norm.weight"), "bias": mn.get("norm.bias")},
        "conv1d_encoder": {"w": mn.get("conv1d_encoder.weight")[:, :, 0].T},
        "pos_scale": mn.get("pos_enc.scale"),
        "blocks": blocks,
        "mossformer_norm": {
            "scale": mn.get("mdl.intra_mdl.norm.weight"),
            "bias": mn.get("mdl.intra_mdl.norm.bias")},
        "intra_norm": {"scale": mn.get("mdl.intra_norm.weight"),
                       "bias": mn.get("mdl.intra_norm.bias")},
        "prelu": mn.get("prelu.weight"),
        "conv1d_out": {"w": mn.get("conv1d_out.weight")[:, :, 0].T,
                       "b": mn.get("conv1d_out.bias")},
        "output": {"w": mn.get("output.0.weight")[:, :, 0].T,
                   "b": mn.get("output.0.bias")},
        "output_gate": {"w": mn.get("output_gate.0.weight")[:, :, 0].T,
                        "b": mn.get("output_gate.0.bias")},
        "conv1_decoder": {"w": mn.get("conv1_decoder.weight")[:, :, 0].T},
        # torch ConvTranspose1d weight (in=D, out=1, K) -> forward-conv TIO
        # layout (K, 1, D) for transpose_kernel=True
        "dec": {"w": sd.get("dec.weight").transpose(2, 1, 0)},
    }


def convert_data2vec(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """Data2VecEncoder / Data2VecPretrainModel (reference
    ``funasr/models/data2vec/data2vec_encoder.py:38`` + ``wav2vec2.py``):
    conv feature extractor, weight-normed pos_conv (folded to a plain conv),
    fairseq post-norm transformer layers, final_proj."""
    sd = SD(_strip_module_prefix(state_dict))
    if sd.has("encoder.feature_extractor.conv_layers.0.0.weight"):
        sd = sd.sub("encoder")  # pretrain-model checkpoint layout
    enc_model = model.encoder if hasattr(model, "encoder") and \
        hasattr(model.encoder, "conv_layers") else model

    fe = []
    for i in range(len(enc_model.conv_layers)):
        s = sd.sub(f"feature_extractor.conv_layers.{i}")
        lp = {"conv": s.conv1d("0")}
        if enc_model.extractor_mode == "layer_norm":
            lp["norm"] = s.norm("2.1")
        elif i == 0:
            lp["group_norm"] = {"scale": s.get("2.weight"),
                                "bias": s.get("2.bias")}
        fe.append(lp)

    # fold the dim=2 weight norm: w[:, :, k] = g[k] * v[:, :, k] / ||v[:, :, k]||
    v = sd.get("encoder.pos_conv.0.weight_v")  # (C_out, C_in/groups, K)
    g = sd.get("encoder.pos_conv.0.weight_g")  # (1, 1, K)
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    pos_w = (v * (g / np.maximum(norm, 1e-12))).transpose(2, 1, 0)
    layers = []
    for i in range(enc_model.encoder_layers):
        s = sd.sub(f"encoder.layers.{i}")
        layers.append({
            "self_attn": {k: s.linear(f"self_attn.{k}")
                          for k in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "self_attn_layer_norm": s.norm("self_attn_layer_norm"),
            "fc1": s.linear("fc1"), "fc2": s.linear("fc2"),
            "final_layer_norm": s.norm("final_layer_norm"),
        })
    enc_params = {
        "feature_extractor": fe,
        "layer_norm": sd.norm("layer_norm"),
        "post_extract_proj": sd.linear("post_extract_proj"),
        "mask_emb": sd.get("mask_emb"),
        "encoder": {"pos_conv": {"w": pos_w,
                                 "b": sd.get("encoder.pos_conv.0.bias")},
                    "layers": layers,
                    "layer_norm": sd.norm("encoder.layer_norm")},
    }
    if sd.has("final_proj.weight"):
        enc_params["final_proj"] = sd.linear("final_proj")
    if enc_model is model:
        return enc_params
    return {"student": enc_params,
            "ema": model.encoder.teacher_init(enc_params)}


def convert_sond(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """DiarSondModel (reference ``funasr/models/sond/e2e_diar_sond.py:45``):
    resnet34 speech encoder + conv speaker encoder + CI/CD scorers + FSMN
    post-net, mapped onto our functional trees."""
    sd = SD(_strip_module_prefix(state_dict))
    params: Dict[str, Any] = {}
    if model.encoder is not None:
        params["encoder"] = _sond_resnet(sd.sub("encoder"), model.encoder)
    if model.speaker_encoder is not None:
        params["speaker_encoder"] = _sond_conv_encoder(
            sd.sub("speaker_encoder"), model.speaker_encoder)
    params["ci_scorer"] = {} if not model.ci_is_encoder else \
        _sond_self_attention(sd.sub("ci_scorer"), model.ci_scorer)
    if model.cd_scorer is not None:
        params["cd_scorer"] = _sond_self_attention(sd.sub("cd_scorer"),
                                                   model.cd_scorer)
    params["decoder"] = _sond_fsmn(sd.sub("decoder"), model.decoder)
    return params


def _strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Tolerate DDP 'module.' prefixes (reference ``trainer.py:303-323`` behavior)."""
    if any(k.startswith("module.") for k in sd):
        return {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in sd.items()}
    return dict(sd)


def load_native_checkpoint(path: str):
    """Load a funasr_tpu Trainer/average_checkpoints pickle and return its
    params pytree, or None if ``path`` is not one.

    Trainer.save_checkpoint pickles ``{"params": <numpy pytree>, ...}``; torch
    checkpoints are either zip archives (new format) or torch-unpickler-only
    legacy pickles, so a plain-pickle dict with a "params" key is unambiguous.
    This is what lets ``++init_param=exp/model.pt.avg`` close the reference's
    train -> average -> inference loop (ref ``funasr/bin/train.py`` saves and
    ``funasr/auto/auto_model.py`` reloads the same torch state_dict format).
    """
    import pickle
    import zipfile
    if zipfile.is_zipfile(path):
        return None
    try:
        with open(path, "rb") as f:
            obj = pickle.load(f)
    except Exception:
        return None
    if isinstance(obj, dict) and isinstance(obj.get("params"), dict):
        return obj["params"]
    return None


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a ``model.pt`` state dict without requiring CUDA."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model_state_dict" in obj:  # openai whisper .pt
        obj = obj["model_state_dict"]
    return obj


def _mha_qkvo(s: SD, name: str):
    a = s.sub(name)
    return {n: a.linear(n) for n in ("linear_q", "linear_k", "linear_v",
                                     "linear_out")}


def _conv2d_hwio(s: SD, name: str):
    w = s.get(name + ".weight")  # torch (O, I, H, W) -> HWIO
    p = {"w": w.transpose(2, 3, 1, 0)}
    if s.has(name + ".bias"):
        p["b"] = s.get(name + ".bias")
    return p


def convert_transformer(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """Transformer/SANM-free AED (reference ``funasr/models/transformer/model.py:23``
    espnet-style layout: conv2d-subsampled encoder + AR decoder + CTC)."""
    sd = SD(_strip_module_prefix(state_dict))
    enc = sd.sub("encoder")
    ecfg = model.encoder.cfg

    def enc_layer(s: SD):
        return {
            "norm1": s.norm("norm1"), "norm2": s.norm("norm2"),
            "self_attn": _mha_qkvo(s, "self_attn"),
            "feed_forward": s.ffn("feed_forward"),
        }

    params: Dict[str, Any] = {"encoder": {
        "after_norm": enc.norm("after_norm"),
        "encoders": stack_params([enc_layer(enc.sub(f"encoders.{i}"))
                                  for i in range(ecfg.num_blocks)]),
    }}
    if ecfg.input_layer == "conv2d":
        emb = enc.sub("embed")
        params["encoder"]["embed"] = {
            "conv1": _conv2d_hwio(emb, "conv.0"),
            "conv2": _conv2d_hwio(emb, "conv.2"),
            "out": emb.linear("out.0"),
        }
    elif ecfg.input_layer == "linear":
        params["encoder"]["embed"] = enc.sub("embed").linear("0")

    params["decoder"] = _aed_decoder_params(sd.sub("decoder"),
                                            model.decoder.cfg.num_blocks)
    if sd.has("ctc.ctc_lo.weight"):
        params["ctc"] = convert_ctc(sd.sub("ctc"))
    return params


def _aed_decoder_params(dec: SD, num_blocks: int):
    def dec_layer(s: SD):
        return {
            "norm1": s.norm("norm1"), "norm2": s.norm("norm2"),
            "norm3": s.norm("norm3"),
            "self_attn": _mha_qkvo(s, "self_attn"),
            "src_attn": _mha_qkvo(s, "src_attn"),
            "feed_forward": s.ffn("feed_forward"),
        }

    return {
        "embed": dec.sub("embed").embedding("0"),
        "decoders": stack_params([dec_layer(dec.sub(f"decoders.{i}"))
                                  for i in range(num_blocks)]),
        "after_norm": dec.norm("after_norm"),
        "output_layer": dec.linear("output_layer"),
    }


def convert_conformer_encoder(sd: SD, num_blocks: int):
    """espnet-style ConformerEncoder (reference
    ``funasr/models/conformer/encoder.py:286``): rel-pos MHA + macaron FFNs +
    conv module with batch-norm."""

    def layer(s: SD):
        p = {
            "norm_ff": s.norm("norm_ff"), "norm_mha": s.norm("norm_mha"),
            "norm_final": s.norm("norm_final"),
            "self_attn": {
                **_mha_qkvo(s, "self_attn"),
                "linear_pos": s.sub("self_attn").linear("linear_pos"),
                "pos_bias_u": s.get("self_attn.pos_bias_u"),
                "pos_bias_v": s.get("self_attn.pos_bias_v"),
            },
            "feed_forward": s.ffn("feed_forward"),
        }
        if s.has("norm_ff_macaron.weight"):
            p["norm_ff_macaron"] = s.norm("norm_ff_macaron")
            p["feed_forward_macaron"] = s.ffn("feed_forward_macaron")
        if s.has("conv_module.pointwise_conv1.weight"):
            cm = s.sub("conv_module")
            p["norm_conv"] = s.norm("norm_conv")
            p["conv_module"] = {
                "pointwise_conv1": cm.conv1d("pointwise_conv1"),
                "depthwise_conv": cm.dwconv("depthwise_conv"),
                "pointwise_conv2": cm.conv1d("pointwise_conv2"),
                "norm": {  # torch BatchNorm1d -> (scale, bias, mean, var)
                    "scale": cm.get("norm.weight"),
                    "bias": cm.get("norm.bias"),
                    "mean": cm.get("norm.running_mean"),
                    "var": cm.get("norm.running_var"),
                },
            }
        return p

    params = {
        "after_norm": sd.norm("after_norm"),
        "encoders": stack_params([layer(sd.sub(f"encoders.{i}"))
                                  for i in range(num_blocks)]),
    }
    if sd.has("embed.conv.0.weight"):
        emb = sd.sub("embed")
        params["embed"] = {
            "conv1": _conv2d_hwio(emb, "conv.0"),
            "conv2": _conv2d_hwio(emb, "conv.2"),
            "out": emb.linear("out.0"),
        }
    elif sd.has("embed.0.weight"):
        params["embed"] = sd.sub("embed").linear("0")
    return params


def convert_conformer(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """Conformer AED (reference ``funasr/models/conformer/model.py``): conformer
    encoder + transformer AR decoder + CTC."""
    sd = SD(_strip_module_prefix(state_dict))
    params = {"encoder": convert_conformer_encoder(
        sd.sub("encoder"), model.encoder.cfg.num_blocks)}
    if sd.has("decoder.output_layer.weight"):
        params["decoder"] = _aed_decoder_params(sd.sub("decoder"),
                                                model.decoder.cfg.num_blocks)
    if sd.has("ctc.ctc_lo.weight"):
        params["ctc"] = convert_ctc(sd.sub("ctc"))
    return params


def convert_fsmn_kws(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """Keyword spotting (reference ``funasr/models/fsmn_kws/model.py:27`` /
    ``sanm_kws/``): FSMN scoring net (or SANM encoder) + CTC head."""
    sd = SD(_strip_module_prefix(state_dict))
    if type(model.encoder).__name__ == "FSMN":
        enc = convert_fsmn(sd.sub("encoder"), model.encoder.cfg.fsmn_layers)
    else:
        enc = convert_sanm_encoder(sd.sub("encoder"),
                                   model.encoder.cfg.num_blocks)
    params = {"encoder": enc}
    if sd.has("ctc.ctc_lo.weight"):
        params["ctc"] = convert_ctc(sd.sub("ctc"))
    return params


def _scama_decoder_params(sd: SD, dcfg):
    """FsmnDecoderSCAMAOpt (reference ``funasr/models/scama/decoder.py``):
    embed + decoders (fsmn self + scama cross) + optional decoders2 (fsmn only)
    + decoders3 (ffn) + after_norm + output_layer."""

    def att_layer(s: SD):
        return {
            "norm1": s.norm("norm1"), "norm2": s.norm("norm2"),
            "norm3": s.norm("norm3"),
            "self_attn": {"fsmn_block": s.dwconv("self_attn.fsmn_block")},
            "src_attn": {
                "linear_q": s.linear("src_attn.linear_q"),
                "linear_k_v": s.linear("src_attn.linear_k_v"),
                "linear_out": s.linear("src_attn.linear_out"),
            },
            "feed_forward": s.ffn_dec_sanm("feed_forward"),
        }

    def fsmn_layer(s: SD):
        return {
            "norm1": s.norm("norm1"), "norm2": s.norm("norm2"),
            "self_attn": {"fsmn_block": s.dwconv("self_attn.fsmn_block")},
            "feed_forward": s.ffn_dec_sanm("feed_forward"),
        }

    d3 = sd.sub("decoders3.0")
    params = {
        "embed": sd.sub("embed").embedding("0"),
        "decoders": stack_params([att_layer(sd.sub(f"decoders.{i}"))
                                  for i in range(dcfg.att_layer_num)]),
        "decoders3": {"norm1": d3.norm("norm1"),
                      "feed_forward": d3.ffn_dec_sanm("feed_forward")},
        "after_norm": sd.norm("after_norm"),
        "output_layer": sd.linear("output_layer"),
    }
    n_extra = dcfg.num_blocks - dcfg.att_layer_num
    if n_extra > 0:
        params["decoders2"] = stack_params([
            fsmn_layer(sd.sub(f"decoders2.{i}")) for i in range(n_extra)])
    return params


def convert_uniasr(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """UniASR 2-pass streaming ASR (reference ``funasr/models/uniasr/model.py:26``:
    chunked SANM encoder -> CIF -> SCAMA decoder, then stride-conv + second
    encoder/predictor/decoder for the accurate pass)."""
    sd = SD(_strip_module_prefix(state_dict))
    params = {
        "encoder": convert_sanm_encoder(sd.sub("encoder"),
                                        model.encoder.cfg.num_blocks),
        "encoder2": convert_sanm_encoder(sd.sub("encoder2"),
                                         model.encoder2.cfg.num_blocks),
        "decoder": _scama_decoder_params(sd.sub("decoder"), model.decoder.cfg),
        "decoder2": _scama_decoder_params(sd.sub("decoder2"),
                                          model.decoder2.cfg),
        "predictor": convert_cif_predictor(sd.sub("predictor")),
        "predictor2": convert_cif_predictor(sd.sub("predictor2")),
        "stride_conv": sd.sub("stride_conv").conv1d("conv"),
    }
    if sd.has("ctc.ctc_lo.weight"):
        params["ctc"] = convert_ctc(sd.sub("ctc"))
    return params


def convert_scama(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """Single-pass SCAMA (reference ``funasr/models/scama/model.py``: chunked
    SANM encoder + CIF + SCAMA decoder)."""
    sd = SD(_strip_module_prefix(state_dict))
    params = {
        "encoder": convert_sanm_encoder(sd.sub("encoder"),
                                        model.encoder.cfg.num_blocks),
        "decoder": _scama_decoder_params(sd.sub("decoder"), model.decoder.cfg),
        "predictor": convert_cif_predictor(sd.sub("predictor")),
    }
    if sd.has("ctc.ctc_lo.weight"):
        params["ctc"] = convert_ctc(sd.sub("ctc"))
    return params


def convert_branchformer_encoder(sd: SD, num_blocks: int):
    """Branchformer encoder (reference ``funasr/models/branchformer/encoder.py``):
    rel-pos attention branch + cgMLP branch merged by concat+linear."""

    def layer(s: SD):
        a = s.sub("attn")
        cg = s.sub("cgmlp")
        p = {
            "norm_mha": s.norm("norm_mha"), "norm_mlp": s.norm("norm_mlp"),
            "norm_final": s.norm("norm_final"),
            "attn": {
                **{n: a.linear(n) for n in ("linear_q", "linear_k", "linear_v",
                                            "linear_out")},
                "linear_pos": a.linear("linear_pos"),
                "pos_bias_u": s.get("attn.pos_bias_u"),
                "pos_bias_v": s.get("attn.pos_bias_v"),
            },
            "cgmlp": {
                "channel_proj1": cg.linear("channel_proj1.0"),
                "norm_gate": cg.sub("csgu").norm("norm"),
                "conv_gate": cg.sub("csgu").dwconv("conv"),
                "channel_proj2": cg.linear("channel_proj2"),
            },
            "merge_proj": s.linear("merge_proj"),
        }
        # e-branchformer extras (reference e_branchformer/encoder.py)
        if s.has("depthwise_conv_fusion.weight"):
            p["merge_conv"] = s.dwconv("depthwise_conv_fusion")
        if s.has("norm_ff_macaron.weight"):
            p["norm_ff1"] = s.norm("norm_ff_macaron")
            p["ffn1"] = s.ffn("feed_forward_macaron")
            p["norm_ff2"] = s.norm("norm_ff")
            p["ffn2"] = s.ffn("feed_forward")
        return p

    params = {
        "after_norm": sd.norm("after_norm"),
        "encoders": stack_params([layer(sd.sub(f"encoders.{i}"))
                                  for i in range(num_blocks)]),
    }
    if sd.has("embed.conv.0.weight"):
        emb = sd.sub("embed")
        params["embed"] = {
            "conv1": _conv2d_hwio(emb, "conv.0"),
            "conv2": _conv2d_hwio(emb, "conv.2"),
            "out": emb.linear("out.0"),
        }
    return params


def convert_branchformer(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    sd = SD(_strip_module_prefix(state_dict))
    params = {"encoder": convert_branchformer_encoder(
        sd.sub("encoder"), model.encoder.cfg.num_blocks)}
    if sd.has("decoder.output_layer.weight"):
        params["decoder"] = _aed_decoder_params(sd.sub("decoder"),
                                                model.decoder.cfg.num_blocks)
    if sd.has("ctc.ctc_lo.weight"):
        params["ctc"] = convert_ctc(sd.sub("ctc"))
    return params


def convert_transducer(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """RNN-T (reference ``funasr/models/transducer/model.py:39``: conformer
    encoder + LSTM label decoder + joint network)."""
    sd = SD(_strip_module_prefix(state_dict))
    params = {
        "encoder": convert_conformer_encoder(sd.sub("encoder"),
                                             model.encoder.cfg.num_blocks),
        "embed": sd.sub("decoder").embedding("embed"),
        "pred_lstm": [],
        "joint": {name: sd.sub("joint_network").linear(name)
                  for name in ("lin_enc", "lin_dec", "lin_out")},
    }
    i = 0
    while sd.has(f"decoder.rnn.{i}.weight_ih_l0"):
        s = sd.sub(f"decoder.rnn.{i}")
        params["pred_lstm"].append({
            "w_ih": s.get("weight_ih_l0").T, "w_hh": s.get("weight_hh_l0").T,
            "b_ih": s.get("bias_ih_l0"), "b_hh": s.get("bias_hh_l0"),
        })
        i += 1
    return params


def convert_lcbnet(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """LCB-Net (reference ``funasr/models/lcbnet/model.py:28``): conformer
    AED+CTC backbone + text encoder + SelfSrcAttention fusion + ConvPredictor
    bias head."""
    sd = SD(_strip_module_prefix(state_dict))
    params = {"encoder": convert_conformer_encoder(
        sd.sub("encoder"), model.encoder.cfg.num_blocks)}
    params["decoder"] = _aed_decoder_params(sd.sub("decoder"),
                                            model.decoder.cfg.num_blocks)
    if sd.has("ctc.ctc_lo.weight"):
        params["ctc"] = convert_ctc(sd.sub("ctc"))

    te = sd.sub("text_encoder")

    def te_layer(s: SD):
        return {
            "norm1": s.norm("norm1"), "norm2": s.norm("norm2"),
            "self_attn": _mha_qkvo(s, "self_attn"),
            "feed_forward": s.ffn("feed_forward"),
        }

    params["text_encoder"] = {
        "embed": te.sub("embed").embedding("0"),
        "encoder": {
            "encoders": stack_params([
                te_layer(te.sub(f"encoders.{i}"))
                for i in range(model.text_encoder.enc.cfg.num_blocks)]),
            "after_norm": te.norm("after_norm"),
        },
    }
    fe = sd.sub("fusion_encoder")
    params["fusion_encoder"] = {
        "norm1": fe.norm("norm1"), "norm2": fe.norm("norm2"),
        "norm3": fe.norm("norm3"),
        "self_attn": _mha_qkvo(fe, "self_attn"),
        "src_attn": _mha_qkvo(fe, "src_attn"),
        "feed_forward": fe.ffn("feed_forward"),
    }
    bp = sd.sub("bias_predictor")
    params["bias_predictor"] = {
        "atten": _mha_qkvo(bp, "atten"),
        "norm1": bp.norm("norm1"), "norm2": bp.norm("norm2"),
        "feed_forward": bp.ffn("feed_forward"),
        "conv1d": bp.dwconv("conv1d"),
        "output_linear": bp.linear("output_linear"),
    }
    return params


def convert_sanm_aed(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """SANM AED (reference ``funasr/models/sanm/model.py:14``: SANM encoder +
    AR FsmnDecoder + CTC)."""
    sd = SD(_strip_module_prefix(state_dict))
    params = {
        "encoder": convert_sanm_encoder(sd.sub("encoder"),
                                        model.encoder.cfg.num_blocks),
        "decoder": _scama_decoder_params(sd.sub("decoder"), model.decoder.cfg),
    }
    if sd.has("ctc.ctc_lo.weight"):
        params["ctc"] = convert_ctc(sd.sub("ctc"))
    return params


CONVERTERS = {
    "Transformer": convert_transformer,
    "Conformer": convert_conformer,
    "SANM": convert_sanm_aed,
    "UniASR": convert_uniasr,
    "SCAMA": convert_scama,
    "Branchformer": convert_branchformer,
    "EBranchformer": convert_branchformer,
    "Transducer": convert_transducer,
    "BAT": convert_transducer,
    "LCBNet": convert_lcbnet,
    "FsmnKWS": convert_fsmn_kws,
    "FsmnKWSConvert": convert_fsmn_kws,
    "FsmnKWSMT": convert_fsmn_kws,
    "FsmnKWSMTConvert": convert_fsmn_kws,
    "SanmKWS": convert_fsmn_kws,
    "SanmKWSStreaming": convert_fsmn_kws,
    "Paraformer": convert_paraformer,
    "BiCifParaformer": convert_paraformer,
    "EParaformer": convert_paraformer,
    "ParaformerStreaming": convert_paraformer,
    "Paraformer_v2_community": convert_paraformer_v2,
    "ParaformerV2": convert_paraformer_v2,
    "SeacoParaformer": convert_seaco_paraformer,
    "ContextualParaformer": convert_contextual_paraformer,
    "MonotonicAligner": convert_monotonic_aligner,
    "DiarEENDOLA": convert_eend_ola,
    "EENDOLA": convert_eend_ola,
    "Emotion2vec": convert_emotion2vec,
    "FunASRNano": convert_fun_asr_nano,
    "LLMASR": convert_fun_asr_nano,
    "FsmnVADStreaming": convert_fsmn_vad,
    "CTTransformer": convert_ct_transformer,
    "CTTransformerStreaming": convert_ct_transformer,
    "CAMPPlus": convert_campplus,
    "DiarSondModel": convert_sond,
    "SOND": convert_sond,
    "MFCCA": convert_mfcca,
    "MossFormer": convert_mossformer,
    "MossFormer2": convert_mossformer,
    "MFCCAEncoder": convert_mfcca,
    "Data2VecEncoder": convert_data2vec,
    "Data2VecPretrainModel": convert_data2vec,
    "Data2VecAudio": convert_data2vec,
    "SenseVoiceSmall": convert_sense_voice,
    "ERes2NetV2": convert_eres2netv2,
}

for _name in ("OpenAIWhisperModel", "WhisperWarp", "Whisper-large-v3",
              "Whisper-large-v2", "Whisper-large-v1", "Whisper-medium",
              "Whisper-small", "Whisper-base", "Whisper-tiny"):
    CONVERTERS[_name] = convert_whisper


def convert_state_dict(state_dict, model, model_class: str | None = None):
    name = model_class or type(model).__name__
    if name in CONVERTERS:
        return CONVERTERS[name](state_dict, model)
    raise NotImplementedError(f"no converter for model class {name}")
