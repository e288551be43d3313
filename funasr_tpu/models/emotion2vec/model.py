"""emotion2vec: self-supervised speech emotion representation (data2vec-2.0
audio trunk) + emotion classification head.

TPU-native rebuild of FunASR ``funasr/models/emotion2vec/model.py:40`` and its
fairseq/timm module stack: raw-waveform conv feature extractor (7 layers,
layer-norm mode, ``fairseq_modules.py:118``), feature projection, 5-layer
grouped positional conv (``audio.py:63-85``), symmetric ALiBi attention bias
with a learned per-head scale (``base.py:676``), 10 learned extra tokens,
4 prenet + 8 main post-norm AltBlocks (``modules.py:247``), utterance mean
pool -> linear emotion head with "unuse"-label masking (``model.py:298-306``).
Inference contract matches the reference: {"key", "labels", "scores",
"feats"(optional)}.
"""

from __future__ import annotations

import math
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import (layer_norm_apply, layer_norm_init,
                                    linear_apply, linear_init)
from funasr_tpu.register import tables

LN_EPS = 1e-5  # reference norm_eps


def alibi_slopes(n_heads: int) -> np.ndarray:
    """ALiBi per-head slopes (reference ``base.py:608-635``)."""
    def pow2(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * start ** i for i in range(n)]

    if math.log2(n_heads).is_integer():
        return np.asarray(pow2(n_heads), np.float32)
    closest = 2 ** math.floor(math.log2(n_heads))
    extra = pow2(2 * closest)[0::2][: n_heads - closest]
    return np.asarray(pow2(closest) + extra, np.float32)


def alibi_bias(t: int, n_heads: int) -> np.ndarray:
    """Symmetric (non-causal) alibi: -|i - j| * slope, (H, T, T)."""
    pos = -np.abs(np.arange(t)[None, :] - np.arange(t)[:, None]).astype(np.float32)
    return alibi_slopes(n_heads)[:, None, None] * pos[None]


def _gelu(x):
    # torch.nn.GELU default = exact erf form
    return jax.nn.gelu(x, approximate=False)


def _conv1d(x, w, b=None, stride: int = 1, padding: int = 0, groups: int = 1):
    """x: (B, T, C_in); w: (K, C_in/groups, C_out)."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=((padding, padding),),
        dimension_numbers=("NTC", "TIO", "NTC"), feature_group_count=groups,
        preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


@tables.register("model_classes", "Emotion2vec")
class Emotion2vec:
    FEATURE_SPEC = [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2

    def __init__(self, vocab_size: int = -1, model_conf: Optional[dict] = None,
                 **kwargs):
        cfg = dict(model_conf or {})
        self.embed_dim = cfg.get("embed_dim", 768)
        self.depth = cfg.get("depth", 8)
        self.num_heads = cfg.get("num_heads", 12)
        self.mlp_ratio = cfg.get("mlp_ratio", 4.0)
        self.normalize = cfg.get("normalize", True)
        mod = (cfg.get("modalities") or {}).get("audio", {})
        self.prenet_depth = mod.get("prenet_depth", 4)
        self.num_extra_tokens = mod.get("num_extra_tokens", 10)
        self.conv_pos_depth = mod.get("conv_pos_depth", 5)
        self.conv_pos_width = mod.get("conv_pos_width", 95)
        self.conv_pos_groups = mod.get("conv_pos_groups", 16)
        self.use_alibi = mod.get("use_alibi_encoder", True)
        self.num_alibi_heads = mod.get("num_alibi_heads", self.num_heads)
        spec = mod.get("feature_encoder_spec")
        if isinstance(spec, str):
            # reference stores a python expression ("[(512,10,5)] + ... * 4");
            # evaluate with no builtins reachable
            spec = eval(spec, {"__builtins__": {}})  # noqa: S307
        if spec is not None:
            self.FEATURE_SPEC = [tuple(s) for s in spec]
        self.vocab_size = vocab_size
        self.feat_dim = self.FEATURE_SPEC[-1][0]

    # ------------------------------------------------------------------

    def init_params(self, rng):
        d, fd = self.embed_dim, self.feat_dim
        hid = int(d * self.mlp_ratio)
        keys = iter(jax.random.split(rng, 256))

        def block():
            return {
                "norm1": layer_norm_init(d),
                "attn": {"qkv": linear_init(next(keys), d, 3 * d),
                         "proj": linear_init(next(keys), d, d)},
                "norm2": layer_norm_init(d),
                "mlp": {"fc1": linear_init(next(keys), d, hid),
                        "fc2": linear_init(next(keys), hid, d)},
            }

        params = {
            "local_encoder": [],
            "project_features": {"norm": layer_norm_init(fd),
                                 "linear": linear_init(next(keys), fd, d)},
            "pos_conv": [],
            "extra_tokens": jnp.zeros((1, self.num_extra_tokens, d),
                                      jnp.float32),
            "alibi_scale": jnp.ones((1, 1, self.num_alibi_heads, 1, 1),
                                    jnp.float32),
            "prenet_norm": layer_norm_init(d),
            "prenet_blocks": [block() for _ in range(self.prenet_depth)],
            "blocks": [block() for _ in range(self.depth)],
        }
        c_in = 1
        for (c_out, k, _s) in self.FEATURE_SPEC:
            params["local_encoder"].append({
                "conv": {"w": jax.random.normal(next(keys), (k, c_in, c_out))
                         * (1.0 / math.sqrt(k * c_in))},
                "norm": layer_norm_init(c_out),
            })
            c_in = c_out
        k_pos = max(3, self.conv_pos_width // self.conv_pos_depth)
        for _ in range(self.conv_pos_depth):
            params["pos_conv"].append({
                "w": jax.random.normal(next(keys),
                                       (k_pos, d // self.conv_pos_groups, d))
                * 0.02,
                "b": jnp.zeros((d,), jnp.float32),
            })
        if self.vocab_size > 0:
            params["proj"] = linear_init(next(keys), d, self.vocab_size)
        return params

    # ------------------------------------------------------------------

    def _local_features(self, params, source):
        """source: (B, N) raw waveform -> (B, T, embed_dim)."""
        x = source[..., None]  # (B, N, 1)
        for lp, (c_out, k, s) in zip(params["local_encoder"],
                                     self.FEATURE_SPEC):
            x = _conv1d(x, lp["conv"]["w"].astype(x.dtype), stride=s)
            x = layer_norm_apply(lp["norm"], x.astype(jnp.float32), eps=LN_EPS)
            x = _gelu(x)
        x = layer_norm_apply(params["project_features"]["norm"], x, eps=LN_EPS)
        return linear_apply(params["project_features"]["linear"], x)

    def _positional(self, params, x):
        k = max(3, self.conv_pos_width // self.conv_pos_depth)
        pad = k // 2
        h = x
        for lp in params["pos_conv"]:
            h = _conv1d(h, lp["w"].astype(h.dtype), lp["b"], padding=pad,
                        groups=self.conv_pos_groups)
            if k % 2 == 0:  # SamePad trims the extra frame for even kernels
                h = h[:, :-1]
            # LayerNorm without affine params
            hf = h.astype(jnp.float32)
            mean = jnp.mean(hf, -1, keepdims=True)
            var = jnp.var(hf, -1, keepdims=True)
            h = ((hf - mean) * jax.lax.rsqrt(var + LN_EPS)).astype(h.dtype)
            h = _gelu(h)
        return h

    def _block(self, bp, x, bias):
        """Post-norm AltBlock (reference ``modules.py:314`` layer_norm_first
        False branch): x += attn(x); r = x = norm1(x); x = norm2(r + mlp(x))."""
        b, t, d = x.shape
        h_heads = self.num_heads
        dk = d // h_heads
        qkv = linear_apply(bp["attn"]["qkv"], x)
        q, k, v = jnp.split(qkv, 3, -1)

        def split(y):
            return y.reshape(b, t, h_heads, dk).transpose(0, 2, 1, 3)

        q = split(q) * (dk ** -0.5)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, split(k),
                            preferred_element_type=jnp.float32)
        if bias is not None:
            scores = scores + bias
        att = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", att, split(v),
                         preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, d).astype(x.dtype)
        x = x + linear_apply(bp["attn"]["proj"], ctx)

        r = x = layer_norm_apply(bp["norm1"], x, eps=LN_EPS)
        h = _gelu(linear_apply(bp["mlp"]["fc1"], x))
        h = linear_apply(bp["mlp"]["fc2"], h)
        return layer_norm_apply(bp["norm2"], r + h, eps=LN_EPS)

    def extract_features(self, params, source):
        """source: (B, N) raw 16 kHz waveform -> (B, T, D) frame features
        (extra tokens removed), mirroring ``extract_features``/
        ``forward(features_only=True, mask=False)``."""
        x = self._local_features(params, source)
        x = x + self._positional(params, x)

        b, t, d = x.shape
        num = self.num_extra_tokens
        bias = None
        if self.use_alibi:
            ab = jnp.asarray(alibi_bias(t, self.num_alibi_heads))[None]
            scale = jnp.clip(params["alibi_scale"], 0, None)[0, 0][None]
            ab = ab * scale.reshape(1, self.num_alibi_heads, 1, 1)
            # pad for the extra tokens (zero bias rows/cols)
            bias = jnp.pad(ab, ((0, 0), (0, 0), (num, 0), (num, 0)))

        x = jnp.concatenate(
            [jnp.broadcast_to(params["extra_tokens"].astype(x.dtype),
                              (b, num, d)), x], axis=1)

        # prenet (context encoder, post-norm: norm BEFORE the blocks)
        x = layer_norm_apply(params["prenet_norm"], x, eps=LN_EPS)
        for bp in params["prenet_blocks"]:
            x = self._block(bp, x, bias)
        for bp in params["blocks"]:
            x = self._block(bp, x, bias)
        return x[:, num:]

    # ------------------------------------------------------------------

    def forward_jit(self, params, speech, speech_lengths, labels, label_lengths,
                    rng=None):
        """Downstream fine-tune objective: CE on the utterance-pooled emotion
        logits (the SSL EMA-teacher pretraining objective is out of scope)."""
        if self.normalize:
            mean = jnp.mean(speech, axis=-1, keepdims=True)
            var = jnp.var(speech, axis=-1, keepdims=True)
            speech = (speech - mean) * jax.lax.rsqrt(var + 1e-5)
        feats = self.extract_features(params, speech)
        pooled = jnp.mean(feats, axis=1)
        logits = linear_apply(params["proj"], pooled)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        tgt = labels.reshape(-1).astype(jnp.int32)
        loss = -jnp.mean(jnp.take_along_axis(logp, tgt[:, None], -1))
        acc = jnp.mean((jnp.argmax(logits, -1) == tgt).astype(jnp.float32))
        return loss, {"loss": loss, "acc": acc}, speech.shape[0]

    def inference(self, params, data_in, data_lengths=None,
                  key: Optional[List] = None, tokenizer=None, frontend=None,
                  **kwargs):
        from funasr_tpu.utils.load_utils import (as_unit_f32,
                                                 load_audio_text_image_video)

        meta: Dict = {}
        t0 = time.perf_counter()
        audio_list = load_audio_text_image_video(
            data_in, fs=16000, audio_fs=kwargs.get("fs", 16000),
            data_type=kwargs.get("data_type", "sound"))
        audio_list = [as_unit_f32(a) for a in audio_list]
        meta["load_data"] = f"{time.perf_counter() - t0:0.3f}"
        meta["batch_data_time"] = sum(len(a) for a in audio_list) / 16000.0

        granularity = kwargs.get("granularity", "utterance")
        extract_embedding = kwargs.get("extract_embedding", True)
        labels = tokenizer.token_list if tokenizer is not None else []
        results = []
        if key is None:
            key = [f"rand_key_{i}" for i in range(len(audio_list))]
        for i, wav in enumerate(audio_list):
            source = jnp.asarray(wav, jnp.float32)
            if self.normalize:
                mean = jnp.mean(source)
                var = jnp.var(source)
                source = (source - mean) * jax.lax.rsqrt(var + 1e-5)
            x = self.extract_features(params, source[None])
            feats = np.asarray(x)[0]
            if granularity == "utterance":
                feats_out = feats.mean(axis=0)
            else:
                feats_out = feats

            scores: List[float] = []
            if "proj" in params:
                logits = np.array(linear_apply(params["proj"],
                                               jnp.asarray(feats.mean(0))))
                for idx, lab in enumerate(labels):
                    if str(lab).startswith("unuse"):
                        logits[idx] = -np.inf
                ex = np.exp(logits - logits.max())
                scores = (ex / ex.sum()).tolist()

            select_label = [lb for lb in labels if not str(lb).startswith("unuse")]
            select_score = [scores[idx] for idx, lb in enumerate(labels)
                            if not str(lb).startswith("unuse")] if scores else []
            row = {"key": key[i], "labels": select_label,
                   "scores": select_score}
            if extract_embedding:
                row["feats"] = feats_out
            results.append(row)
        return results, meta
