"""data2vec audio SSL pretraining (teacher-student masked regression).

TPU-native rebuild of FunASR ``funasr/models/data2vec/`` (fairseq lineage):

- ``Data2VecEncoder`` (ref ``data2vec_encoder.py:38``): ConvFeatureExtraction
  front (ref ``wav2vec2.py:19``, "default" group-norm / "layer_norm" modes),
  weight-normed conv positional embedding (folded to a plain conv at
  conversion), fairseq post-norm transformer layers (ref ``wav2vec2.py:378``),
  masked-span student vs EMA-teacher top-K-layer-FFN-output regression with the
  instance/layer-norm target options (ref ``data2vec_encoder.py:413-623``).
- ``Data2VecPretrainModel`` (ref ``data2vec.py:38``): loss = sum of masked
  regression losses / sample_size, with target/pred variance stats.

The EMA teacher is a pure pytree: ``ema_update(params, num_updates)`` applies
the annealed-decay step functionally (ref ``ema_module.py`` + ``get_annealed_rate``),
so the whole training step stays one XLA program with no module copying.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import (
    layer_norm_apply, layer_norm_init, linear_apply, linear_init, make_pad_mask,
    masked_softmax)
from funasr_tpu.register import tables

DEFAULT_CONV_LAYERS = "[(512,2,2)] + [(512,2,2)]"


def _parse_conv_layers(spec) -> List[Tuple[int, int, int]]:
    if isinstance(spec, str):
        # the reference evals this config string (data2vec_encoder.py:167)
        return list(eval(spec, {"__builtins__": {}}))  # noqa: S307
    return [tuple(l) for l in spec]


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def get_annealed_rate(start, end, curr_step, total_steps):
    """ref ``data2vec_encoder.py:24``."""
    r = end - start
    pct_remaining = 1 - curr_step / total_steps
    return end - r * pct_remaining


# ---------------------------------------------------------------------------
# fairseq building blocks
# ---------------------------------------------------------------------------


def _attn_init(rng, d: int):
    ks = jax.random.split(rng, 4)
    return {name: linear_init(k, d, d)
            for name, k in zip(("q_proj", "k_proj", "v_proj", "out_proj"), ks)}


def _attn_apply(p, x, key_valid, n_head: int):
    """fairseq MultiheadAttention (ref ``multihead_attention.py``): q scaled by
    head_dim**-0.5 after projection; key_padding_mask fills -inf."""
    b, t, d = x.shape
    d_k = d // n_head

    def heads(z):
        return z.reshape(b, t, n_head, d_k).transpose(0, 2, 1, 3)

    q = heads(linear_apply(p["q_proj"], x)) * (d_k ** -0.5)
    k = heads(linear_apply(p["k_proj"], x))
    v = heads(linear_apply(p["v_proj"], x))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    att = masked_softmax(scores, key_valid[:, None, None, :])
    out = jnp.einsum("bhqk,bhkd->bhqd", att.astype(x.dtype), v)
    return linear_apply(p["out_proj"], out.transpose(0, 2, 1, 3).reshape(b, t, d))


def _enc_layer_init(rng, d: int, ffn: int):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {"self_attn": _attn_init(k1, d),
            "self_attn_layer_norm": layer_norm_init(d),
            "fc1": linear_init(k2, d, ffn), "fc2": linear_init(k3, ffn, d),
            "final_layer_norm": layer_norm_init(d)}


@tables.register("encoder_classes", "Data2VecEncoder")
class Data2VecEncoder:
    """Functional data2vec encoder (ref ``data2vec_encoder.py:38``)."""

    def __init__(self, input_size: Optional[int] = None,
                 extractor_mode: str = "default",
                 conv_feature_layers: str = DEFAULT_CONV_LAYERS,
                 layer_norm_first: bool = False, encoder_layers: int = 12,
                 encoder_embed_dim: int = 768,
                 encoder_ffn_embed_dim: int = 3072,
                 encoder_attention_heads: int = 12,
                 activation_fn: str = "gelu",
                 mask_prob: float = 0.65, mask_length: int = 10,
                 require_same_masks: bool = True,
                 conv_pos: int = 128, conv_pos_groups: int = 16,
                 pos_conv_depth: int = 1,
                 average_top_k_layers: int = 8,
                 layer_norm_target_layer: bool = False,
                 instance_norm_target_layer: bool = False,
                 instance_norm_targets: bool = False,
                 layer_norm_targets: bool = False,
                 ema_decay: float = 0.999, ema_end_decay: float = 0.9999,
                 ema_anneal_end_step: int = 100000,
                 min_target_var: float = 0.1, min_pred_var: float = 0.01,
                 loss_beta: float = 0.0, loss_scale: Optional[float] = None,
                 required_seq_len_multiple: int = 2, **_):
        assert extractor_mode in ("default", "layer_norm")
        self.input_size = input_size or 1
        self.extractor_mode = extractor_mode
        self.conv_layers = _parse_conv_layers(conv_feature_layers)
        self.extractor_embed = self.conv_layers[-1][0]
        self.layer_norm_first = layer_norm_first
        self.encoder_layers = encoder_layers
        self.encoder_embed_dim = encoder_embed_dim
        self.encoder_ffn_embed_dim = encoder_ffn_embed_dim
        self.encoder_attention_heads = encoder_attention_heads
        assert activation_fn == "gelu", "data2vec uses gelu"
        self.mask_prob = mask_prob
        self.mask_length = mask_length
        self.require_same_masks = require_same_masks
        self.conv_pos = conv_pos
        self.conv_pos_groups = conv_pos_groups
        assert pos_conv_depth == 1, "stacked pos_conv not used by data2vec audio"
        self.average_top_k_layers = average_top_k_layers
        self.layer_norm_target_layer = layer_norm_target_layer
        self.instance_norm_target_layer = instance_norm_target_layer
        self.instance_norm_targets = instance_norm_targets
        self.layer_norm_targets = layer_norm_targets
        self.ema_decay = ema_decay
        self.ema_end_decay = ema_end_decay
        self.ema_anneal_end_step = ema_anneal_end_step
        self.min_target_var = min_target_var
        self.min_pred_var = min_pred_var
        self.loss_beta = loss_beta
        self.loss_scale = loss_scale
        self.required_seq_len_multiple = required_seq_len_multiple

    def output_size(self) -> int:
        return self.encoder_embed_dim

    # -- params --------------------------------------------------------------

    def init(self, rng):
        keys = iter(jax.random.split(rng, 8 + len(self.conv_layers)
                                     + self.encoder_layers))
        fe = []
        c_in = self.input_size
        for i, (dim, k, s) in enumerate(self.conv_layers):
            lp = {"conv": {"w": jax.random.normal(next(keys), (k, c_in, dim))
                           * math.sqrt(2.0 / (k * c_in))}}
            if self.extractor_mode == "layer_norm":
                lp["norm"] = layer_norm_init(dim)
            elif i == 0:
                lp["group_norm"] = layer_norm_init(dim)  # scale/bias per channel
            fe.append(lp)
            c_in = dim
        d = self.encoder_embed_dim
        pos_w = jax.random.normal(
            next(keys), (self.conv_pos, d // self.conv_pos_groups, d)) \
            * math.sqrt(4.0 / (self.conv_pos * d))
        enc = {"pos_conv": {"w": pos_w, "b": jnp.zeros((d,))},
               "layers": [_enc_layer_init(next(keys), d,
                                          self.encoder_ffn_embed_dim)
                          for _ in range(self.encoder_layers)],
               "layer_norm": layer_norm_init(d)}
        return {"feature_extractor": fe,
                "layer_norm": layer_norm_init(self.extractor_embed),
                "post_extract_proj": linear_init(next(keys),
                                                 self.extractor_embed, d),
                "mask_emb": jax.random.uniform(next(keys), (d,)),
                "encoder": enc,
                "final_proj": linear_init(next(keys), d, d)}

    init_params = init

    def teacher_init(self, params):
        """EMA teacher tree = copy of the transformer (ema_transformer_only)."""
        return jax.tree_util.tree_map(lambda x: x, params["encoder"])

    # -- conv front (ref wav2vec2.py:19-123) ---------------------------------

    def feature_extractor(self, fe_params, x):
        """(B, T) raw or (B, T, F) feats -> (B, T', C)."""
        if x.ndim == 2:
            x = x[..., None]
        for lp, (dim, k, s) in zip(fe_params, self.conv_layers):
            x = jax.lax.conv_general_dilated(
                x, lp["conv"]["w"].astype(x.dtype), window_strides=(s,),
                padding="VALID", dimension_numbers=("NTC", "TIO", "NTC"),
                preferred_element_type=jnp.float32).astype(x.dtype)
            if "norm" in lp:
                x = layer_norm_apply(lp["norm"], x, eps=1e-5)
            elif "group_norm" in lp:
                # Fp32GroupNorm(dim, dim): per-channel normalization over time
                xf = x.astype(jnp.float32)
                mean = xf.mean(axis=1, keepdims=True)
                var = xf.var(axis=1, keepdims=True)
                x = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)
                     * lp["group_norm"]["scale"] + lp["group_norm"]["bias"]) \
                    .astype(x.dtype)
            x = _gelu(x)
        return x

    def feat_extract_output_length(self, input_length):
        for (_, k, s) in self.conv_layers:
            input_length = (input_length - k) // s + 1
        return input_length

    # -- transformer (ref wav2vec2.py:152-367) -------------------------------

    def _pos_conv_apply(self, p, x):
        """Grouped conv pos embedding, padding k//2, drop trailing col if k
        even (SamePad), then GELU (ref ``wav2vec2.py:126-149``)."""
        k = self.conv_pos
        out = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype), window_strides=(1,),
            padding=((k // 2, k // 2),), dimension_numbers=("NTC", "TIO", "NTC"),
            feature_group_count=self.conv_pos_groups,
            preferred_element_type=jnp.float32).astype(x.dtype) + p["b"]
        if k % 2 == 0:
            out = out[:, :-1]
        return _gelu(out)

    def encoder_extract_features(self, enc_params, x, valid, min_layer: int = 0):
        """x: (B, T, D); valid: (B, T) bool. Returns (x, layer_results) where
        each layer result is (block_out, ffn_out) — the teacher averages the
        FFN outputs (ref ``wav2vec2.py:289-367``, layer_results[...][2])."""
        x = x * valid[..., None].astype(x.dtype)
        x = x + self._pos_conv_apply(enc_params["pos_conv"], x)
        if not self.layer_norm_first:
            x = layer_norm_apply(enc_params["layer_norm"], x, eps=1e-5)
        t = x.shape[1]
        pad_len = (-t) % self.required_seq_len_multiple
        if pad_len:
            x = jnp.pad(x, ((0, 0), (0, pad_len), (0, 0)))
            valid = jnp.pad(valid, ((0, 0), (0, pad_len)))
        layer_results = []
        for i, lp in enumerate(enc_params["layers"]):
            # fairseq post-norm layer (ref wav2vec2.py:472-495)
            att = _attn_apply(lp["self_attn"], x, valid,
                              self.encoder_attention_heads)
            x = layer_norm_apply(lp["self_attn_layer_norm"], x + att, eps=1e-5)
            ffn = linear_apply(lp["fc2"], _gelu(linear_apply(lp["fc1"], x)))
            x = layer_norm_apply(lp["final_layer_norm"], x + ffn, eps=1e-5)
            if i >= min_layer:
                layer_results.append((x, ffn))
        if pad_len:
            x = x[:, :t]
            layer_results = [(a[:, :t], b[:, :t]) for a, b in layer_results]
        if self.layer_norm_first:
            x = layer_norm_apply(enc_params["layer_norm"], x, eps=1e-5)
        return x, layer_results

    # -- masking (ref data_utils.py compute_mask_indices, "static") ----------

    def sample_mask(self, rng, b: int, t: int, lengths=None):
        """Span masking, jit-friendly: bernoulli span starts at rate
        mask_prob/mask_length dilated to mask_length (the expected masked
        fraction matches the reference's static span sampler)."""
        starts = jax.random.bernoulli(rng, self.mask_prob / self.mask_length,
                                      (b, t))
        mask = jnp.zeros((b, t), bool)
        for i in range(self.mask_length):
            mask = mask | jnp.roll(starts, i, axis=1)
        if lengths is not None:
            mask = mask & make_pad_mask(lengths, t)
        return mask

    # -- full forward (ref data2vec_encoder.py:413-623) ----------------------

    def forward(self, params, feats, lens=None, *, mask=True,
                features_only=False, mask_indices=None, ema_params=None,
                rng=None, num_updates: int = 0):
        features = self.feature_extractor(params["feature_extractor"], feats)
        features = layer_norm_apply(params["layer_norm"], features, eps=1e-5)
        t = features.shape[1]
        if lens is not None:
            out_lens = self.feat_extract_output_length(lens)
            valid = make_pad_mask(out_lens, t)
        else:
            out_lens = jnp.full((features.shape[0],), t, jnp.int32)
            valid = jnp.ones(features.shape[:2], bool)
        features = linear_apply(params["post_extract_proj"], features)
        pre_encoder_features = features

        if mask:
            if mask_indices is None:
                mask_indices = self.sample_mask(rng, features.shape[0], t,
                                                out_lens)
            x = jnp.where(mask_indices[..., None],
                          params["mask_emb"].astype(features.dtype), features)
        else:
            x = features
        x, _ = self.encoder_extract_features(params["encoder"], x, valid)
        if features_only:
            return x, out_lens

        # EMA teacher targets: average of top-K layers' FFN outputs
        assert ema_params is not None, "pretraining forward needs the EMA teacher"
        _, teacher_layers = self.encoder_extract_features(
            ema_params, pre_encoder_features, valid,
            min_layer=self.encoder_layers - self.average_top_k_layers)
        targets = [tl[1].astype(jnp.float32) for tl in teacher_layers]
        if self.instance_norm_target_layer:
            # F.instance_norm over (B, C, T): per-(b, c) stats across time
            targets = [(tl - tl.mean(1, keepdims=True))
                       * jax.lax.rsqrt(tl.var(1, keepdims=True) + 1e-5)
                       for tl in targets]
        if self.layer_norm_target_layer:
            targets = [(tl - tl.mean(-1, keepdims=True))
                       * jax.lax.rsqrt(tl.var(-1, keepdims=True) + 1e-5)
                       for tl in targets]
        y = sum(targets) / len(targets)
        if self.layer_norm_targets:
            y = (y - y.mean(-1, keepdims=True)) \
                * jax.lax.rsqrt(y.var(-1, keepdims=True) + 1e-5)
        if self.instance_norm_targets:
            y = (y - y.mean(1, keepdims=True)) \
                * jax.lax.rsqrt(y.var(1, keepdims=True) + 1e-5)
        y = jax.lax.stop_gradient(y)

        pred = linear_apply(params["final_proj"], x).astype(jnp.float32)
        sz = pred.shape[-1]
        diff = pred - y
        if self.loss_beta == 0:
            per_tok = jnp.sum(diff * diff, axis=-1)
        else:
            beta = self.loss_beta
            sl1 = jnp.where(jnp.abs(diff) < beta, 0.5 * diff * diff / beta,
                            jnp.abs(diff) - 0.5 * beta)
            per_tok = jnp.sum(sl1, axis=-1)
        scale = self.loss_scale if self.loss_scale is not None \
            else 1.0 / math.sqrt(sz)
        m = mask_indices.astype(jnp.float32)
        loss_sum = jnp.sum(per_tok * m) * scale
        sample_size = jnp.maximum(jnp.sum(m), 1.0)

        def _masked_var(z):
            # sqrt(var over masked tokens per dim + 1e-6), mean over dims
            w = m[..., None]
            cnt = jnp.maximum(jnp.sum(m), 2.0)
            mu = jnp.sum(z * w, (0, 1)) / cnt
            var = jnp.sum(((z - mu) ** 2) * w, (0, 1)) / (cnt - 1)
            return jnp.mean(jnp.sqrt(var + 1e-6))

        return {"losses": {"regression": loss_sum},
                "sample_size": sample_size,
                "x": x, "mask_indices": mask_indices,
                "target_var": _masked_var(y), "pred_var": _masked_var(pred),
                "ema_decay": self.annealed_decay(num_updates) * 1000}

    def annealed_decay(self, num_updates) -> float:
        if self.ema_decay == self.ema_end_decay:
            return self.ema_decay
        if num_updates >= self.ema_anneal_end_step:
            return self.ema_end_decay
        return get_annealed_rate(self.ema_decay, self.ema_end_decay,
                                 num_updates, self.ema_anneal_end_step)


@tables.register("model_classes", "Data2VecPretrainModel")
@tables.register("model_classes", "Data2VecAudio")
@tables.register("model_classes", "data2vec")
class Data2VecPretrainModel:
    """Pretraining wrapper (ref ``data2vec.py:38``): loss = regression loss sum
    / sample_size. The EMA teacher lives in ``params["ema"]`` (stop-gradient on
    the target path keeps its grads zero); call ``ema_update`` between steps."""

    def __init__(self, encoder: str = "Data2VecEncoder",
                 encoder_conf: Optional[dict] = None,
                 input_size: Optional[int] = None, **kwargs):
        conf = dict(encoder_conf or {})
        if input_size is not None:
            conf.setdefault("input_size", input_size)
        self.encoder = tables.encoder_classes[encoder](**conf)

    def init_params(self, rng):
        student = self.encoder.init(rng)
        return {"student": student, "ema": self.encoder.teacher_init(student)}

    def forward_jit(self, params, speech, speech_lengths=None, rng=None,
                    mask_indices=None, num_updates: int = 0, **_):
        result = self.encoder.forward(
            params["student"], speech, speech_lengths, mask=True,
            features_only=False, mask_indices=mask_indices,
            ema_params=params["ema"], rng=rng, num_updates=num_updates)
        loss = sum(result["losses"].values()) / result["sample_size"]
        stats = {"loss": loss, "target_var": result["target_var"],
                 "pred_var": result["pred_var"],
                 "ema_decay": result["ema_decay"],
                 "masked_frames": jnp.sum(result["mask_indices"])}
        return loss, stats, result["sample_size"]

    forward = forward_jit

    def extract_features(self, params, speech, speech_lengths=None):
        return self.encoder.forward(params["student"], speech, speech_lengths,
                                    mask=False, features_only=True)

    def ema_update(self, params, num_updates: int = 0):
        """teacher <- decay * teacher + (1 - decay) * student encoder, with the
        annealed decay schedule (ref ``data2vec_encoder.py:288-310``;
        pos_conv is skipped from decay — copied through — per
        ``make_ema_teacher``'s skip_keys)."""
        d = self.encoder.annealed_decay(num_updates)
        student_enc = params["student"]["encoder"]
        new_ema = jax.tree_util.tree_map(lambda t, s: d * t + (1 - d) * s,
                                         params["ema"], student_enc)
        new_ema["pos_conv"] = jax.tree_util.tree_map(lambda s: s,
                                                     student_enc["pos_conv"])
        return {"student": params["student"], "ema": new_ema}
