"""MossFormer: monaural speech separation (gated single-head FLASH attention).

TPU-native rebuild of FunASR ``funasr/models/mossformer/``:

- conv encoder over the waveform (``mossformer_encoder.py:235``, k=16 s=8)
- MaskNet (``mossformer_encoder.py:90``): GroupNorm(1) -> 1x1 bottleneck ->
  scaled sinusoidal positions -> Computation_Block (MossFormerM FLASH stack +
  norm + skip) -> PReLU -> per-speaker mask heads (tanh x sigmoid gate)
- FLASH_ShareA_FFConvM (``mossformer.py:247``): token shift, FFConvM
  projections (ScaleNorm -> linear -> SiLU -> depthwise ConvModule), 4-way
  OffsetScale of shared qk, grouped quadratic attention relu(sim/g)^2 plus
  global linear attention, partial rotary embeddings, and the u/v gating
- transposed-conv decoder (``mossformer_decoder.py:5``) applied per source.

Everything runs channels-last (B, S, N) so the 1x1 convs are MXU matmuls and
the grouped attention is a static (B, G, n, d) einsum — no dynamic shapes.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import linear_apply, linear_init
from funasr_tpu.register import tables


# -- small pieces -------------------------------------------------------------


def scale_norm_apply(p, x, eps: float = 1e-5):
    """ScaleNorm (ref transformer/layer_norm.py:171-188)."""
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True) \
        * (x.shape[-1] ** -0.5)
    return (x / jnp.maximum(norm, eps) * p["g"]).astype(x.dtype)


def group_norm1_apply(p, x, eps: float = 1e-8):
    """GroupNorm(1, C) over (B, S, N): stats across all (S, N) per sample
    (the MaskNet's "ln" norm, ref mossformer_encoder.py:24)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"]
            + p["bias"]).astype(x.dtype)


def scaled_sinu_embedding(s: int, dim: int, scale, dtype=jnp.float32):
    """ScaledSinuEmbedding (ref transformer/embedding.py:555-581)."""
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32)
                                / dim))
    sinu = jnp.arange(s, dtype=jnp.float32)[:, None] * inv_freq[None]
    emb = jnp.concatenate([jnp.sin(sinu), jnp.cos(sinu)], axis=-1)
    return (emb * scale).astype(dtype)


def rotate_queries_or_keys(x, rot_dim: int):
    """Partial rotary embedding, rotary_embedding_torch convention: the first
    ``rot_dim`` features rotate in interleaved pairs with per-pair freqs
    10000^(-2i/rot_dim); positions along axis -2."""
    n = x.shape[-2]
    freqs = 1.0 / (10000 ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32)
                             / rot_dim))
    angles = jnp.arange(n, dtype=jnp.float32)[:, None] * freqs[None]  # (n, r/2)
    angles = jnp.repeat(angles, 2, axis=-1)  # (n, rot_dim) interleaved pairs
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    x1 = x_rot[..., 0::2]
    x2 = x_rot[..., 1::2]
    rotated_half = jnp.stack([-x2, x1], axis=-1).reshape(x_rot.shape)
    x_rot = (x_rot * cos + rotated_half * sin).astype(x.dtype)
    return jnp.concatenate([x_rot, x_pass], axis=-1)


def _dwconv_init(rng, dim: int, kernel: int):
    return {"w": jax.random.uniform(rng, (kernel, dim), minval=-1, maxval=1)
            / math.sqrt(kernel)}


def _dwconv_apply(p, x, kernel: int):
    pad = (kernel - 1) // 2
    w = p["w"]
    return jax.lax.conv_general_dilated(
        x, w[:, None, :].astype(x.dtype), window_strides=(1,),
        padding=((pad, pad),), dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=w.shape[1],
        preferred_element_type=jnp.float32).astype(x.dtype)


def _ffconvm_init(rng, d_in: int, d_out: int, conv_kernel: int = 17):
    k1, k2 = jax.random.split(rng)
    return {"norm": {"g": jnp.ones(())},
            "linear": linear_init(k1, d_in, d_out),
            "conv": _dwconv_init(k2, d_out, conv_kernel)}


def _ffconvm_apply(p, x, conv_kernel: int = 17):
    """FFConvM (ref mossformer.py:215-244): ScaleNorm -> linear -> SiLU ->
    residual depthwise ConvModule."""
    h = scale_norm_apply(p["norm"], x)
    h = jax.nn.silu(linear_apply(p["linear"], h))
    return h + _dwconv_apply(p["conv"], h, conv_kernel)


# -- FLASH gated attention block ----------------------------------------------


def _flash_init(rng, dim: int, qk_dim: int, expansion: float):
    hidden = int(dim * expansion)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "to_hidden": _ffconvm_init(k1, dim, hidden),
        "to_qk": _ffconvm_init(k2, dim, qk_dim),
        "qk_offset_scale": {
            "gamma": jax.random.normal(k3, (4, qk_dim)) * 0.02 + 1.0,
            "beta": jnp.zeros((4, qk_dim))},
        "to_out": _ffconvm_init(k4, dim * 2, dim),
    }


def _flash_apply(p, x, group_size: int, qk_dim: int):
    """FLASH_ShareA_FFConvM forward (ref mossformer.py:298-422)."""
    b, n, d = x.shape
    # token shift: first half of channels delayed by one frame (ref :314-317)
    x_shift, x_pass = jnp.split(x, 2, axis=-1)
    x_shift = jnp.pad(x_shift, ((0, 0), (1, 0), (0, 0)))[:, :n]
    normed = jnp.concatenate([x_shift, x_pass], axis=-1)

    hidden = _ffconvm_apply(p["to_hidden"], normed)
    v, u = jnp.split(hidden, 2, axis=-1)
    qk = _ffconvm_apply(p["to_qk"], normed)
    osc = p["qk_offset_scale"]
    offset = qk[..., None, :] * osc["gamma"] + osc["beta"]  # (B, n, 4, qk)
    quad_q, lin_q, quad_k, lin_k = [offset[..., i, :] for i in range(4)]

    rot = min(32, qk_dim)
    quad_q, lin_q, quad_k, lin_k = (rotate_queries_or_keys(t, rot)
                                    for t in (quad_q, lin_q, quad_k, lin_k))

    g = group_size
    pad = (-n) % g
    if pad:
        quad_q, quad_k, lin_q, lin_k, v, u = (
            jnp.pad(t, ((0, 0), (0, pad), (0, 0)))
            for t in (quad_q, quad_k, lin_q, lin_k, v, u))
    n_pad = n + pad
    valid = (jnp.arange(n_pad) < n)

    def grp(t):
        return t.reshape(b, n_pad // g, g, t.shape[-1])

    quad_q, quad_k, lin_q, lin_k, vg, ug = map(grp, (quad_q, quad_k, lin_q,
                                                     lin_k, v, u))
    # zero masked linear keys (ref :346-348 with the padding mask)
    lin_k = lin_k * valid.reshape(1, n_pad // g, g, 1).astype(lin_k.dtype)

    # quadratic (within-group) attention: relu(sim/g)^2, masked columns zeroed
    sim = jnp.einsum("bgid,bgjd->bgij", quad_q, quad_k,
                     preferred_element_type=jnp.float32) / g
    attn = jax.nn.relu(sim) ** 2
    col_valid = valid.reshape(n_pad // g, g)
    attn = attn * col_valid[None, :, None, :]
    quad_v = jnp.einsum("bgij,bgjd->bgid", attn.astype(x.dtype), vg)
    quad_u = jnp.einsum("bgij,bgjd->bgid", attn.astype(x.dtype), ug)

    # global linear attention (non-causal, ref :412-416)
    lin_kv = jnp.einsum("bgnd,bgne->bde", lin_k, vg,
                        preferred_element_type=jnp.float32) / n
    lin_v = jnp.einsum("bgnd,bde->bgne", lin_q, lin_kv.astype(x.dtype))
    lin_ku = jnp.einsum("bgnd,bgne->bde", lin_k, ug,
                        preferred_element_type=jnp.float32) / n
    lin_u = jnp.einsum("bgnd,bde->bgne", lin_q, lin_ku.astype(x.dtype))

    att_v = (quad_v + lin_v).reshape(b, n_pad, -1)[:, :n]
    att_u = (quad_u + lin_u).reshape(b, n_pad, -1)[:, :n]

    out = (att_u * v[:, :n]) * jax.nn.sigmoid(att_v * u[:, :n])
    return x + _ffconvm_apply(p["to_out"], out)


# -- model --------------------------------------------------------------------


@tables.register("model_classes", "MossFormer")
@tables.register("model_classes", "MossFormer2")
class MossFormer:
    """ref ``e2e_ss.py:11``: encoder -> MaskNet -> per-speaker masks ->
    transposed-conv decoder."""

    def __init__(self, in_channels: int = 512, out_channels: int = 512,
                 num_blocks: int = 24, kernel_size: int = 16,
                 norm: str = "ln", num_spks: int = 2,
                 skip_around_intra: bool = True,
                 use_global_pos_enc: bool = True, group_size: int = 256,
                 query_key_dim: int = 128, expansion_factor: float = 4.0,
                 # legacy aliases from the earlier functional sketch
                 d_model: Optional[int] = None, ffn_dim: Optional[int] = None,
                 encoder_kernel: Optional[int] = None,
                 conv_kernel: Optional[int] = None, **kwargs):
        if d_model is not None:
            in_channels = out_channels = d_model
        if encoder_kernel is not None:
            kernel_size = encoder_kernel
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.num_blocks = num_blocks
        self.kernel_size = kernel_size
        self.stride = kernel_size // 2
        self.num_spks = num_spks
        self.skip_around_intra = skip_around_intra
        self.use_global_pos_enc = use_global_pos_enc
        self.group_size = group_size
        self.qk_dim = query_key_dim
        self.expansion = expansion_factor

    def init_params(self, rng):
        keys = iter(jax.random.split(rng, self.num_blocks + 10))
        d = self.out_channels
        p = {
            "enc": {"w": jax.random.normal(next(keys),
                                           (self.kernel_size, 1,
                                            self.in_channels))
                    * math.sqrt(1.0 / self.kernel_size)},
            "norm": {"scale": jnp.ones((self.in_channels,)),
                     "bias": jnp.zeros((self.in_channels,))},
            "conv1d_encoder": {"w": jax.random.normal(
                next(keys), (self.in_channels, d)) / math.sqrt(d)},
            "pos_scale": jnp.ones(()),
            "blocks": [_flash_init(next(keys), d, self.qk_dim, self.expansion)
                       for _ in range(self.num_blocks)],
            # MossFormerM's post-stack LayerNorm (ref mossformer_encoder.py:364)
            "mossformer_norm": {"scale": jnp.ones((d,)),
                                "bias": jnp.zeros((d,))},
            "intra_norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "prelu": jnp.full((1,), 0.25),
            "conv1d_out": linear_init(next(keys), d, d * self.num_spks),
            "output": linear_init(next(keys), d, d),
            "output_gate": linear_init(next(keys), d, d),
            "conv1_decoder": {"w": jax.random.normal(
                next(keys), (d, self.in_channels)) / math.sqrt(d)},
            "dec": {"w": jax.random.normal(next(keys),
                                           (self.kernel_size, 1,
                                            self.out_channels))
                    * math.sqrt(1.0 / self.kernel_size)},
        }
        return p

    # -- forward ---------------------------------------------------------------

    def encode(self, params, wav):
        """(B, L) -> (B, S, N): conv k=s*2 stride s, relu."""
        h = jax.lax.conv_general_dilated(
            wav[:, :, None], params["enc"]["w"].astype(wav.dtype),
            window_strides=(self.stride,), padding="VALID",
            dimension_numbers=("NTC", "TIO", "NTC"),
            preferred_element_type=jnp.float32).astype(wav.dtype)
        return jax.nn.relu(h)

    def mask_net(self, params, x):
        """(B, S, N) -> (spks, B, S, N) masks (ref mossformer_encoder.py:170-232)."""
        h = group_norm1_apply(params["norm"], x)
        h = h @ params["conv1d_encoder"]["w"].astype(h.dtype)
        if self.use_global_pos_enc:
            h = h + scaled_sinu_embedding(h.shape[1], h.shape[2],
                                          params["pos_scale"], h.dtype)
        intra = h
        for bp in params["blocks"]:
            intra = _flash_apply(bp, intra, self.group_size, self.qk_dim)
        from funasr_tpu.core.layers import layer_norm_apply
        intra = layer_norm_apply(params["mossformer_norm"], intra, eps=1e-6)
        intra = group_norm1_apply(params["intra_norm"], intra)
        if self.skip_around_intra:
            intra = intra + h
        a = params["prelu"].astype(intra.dtype)
        h = jnp.where(intra >= 0, intra, a * intra)
        h = linear_apply(params["conv1d_out"], h)  # (B, S, N*spks)
        b, s, _ = h.shape
        h = h.reshape(b, s, self.num_spks, self.out_channels) \
            .transpose(0, 2, 1, 3).reshape(b * self.num_spks, s,
                                           self.out_channels)
        h = jnp.tanh(linear_apply(params["output"], h)) \
            * jax.nn.sigmoid(linear_apply(params["output_gate"], h))
        h = h @ params["conv1_decoder"]["w"].astype(h.dtype)
        h = jax.nn.relu(h)
        return h.reshape(b, self.num_spks, s, -1).transpose(1, 0, 2, 3)

    def separate(self, params, wav):
        """(B, L) -> list of num_spks (B, L) sources (ref e2e_ss.py:87-113)."""
        x = self.encode(params, wav)
        masks = self.mask_net(params, x)
        outs = []
        for spk in range(self.num_spks):
            sep = x * masks[spk]
            # torch ConvTranspose1d == transposed forward conv: kernel in
            # the forward layout (K, 1, D) with transpose_kernel=True
            est = jax.lax.conv_transpose(
                sep, params["dec"]["w"].astype(sep.dtype),
                strides=(self.stride,), padding="VALID",
                dimension_numbers=("NTC", "TIO", "NTC"),
                transpose_kernel=True)[:, :, 0]
            t0, t1 = wav.shape[1], est.shape[1]
            est = jnp.pad(est, ((0, 0), (0, max(t0 - t1, 0))))[:, :t0]
            outs.append(est)
        return outs

    def forward_jit(self, params, speech, speech_lengths, targets,
                    target_lengths=None, rng=None):
        """SI-SNR training loss with utterance-level PIT over the sources
        (standard separation objective; the reference trains through its
        speechbrain-lineage recipe)."""
        est = jnp.stack(self.separate(params, speech), 1)  # (B, S, L)
        ref = targets  # (B, S, L)

        def sisnr(e, r):
            e = e - e.mean(-1, keepdims=True)
            r = r - r.mean(-1, keepdims=True)
            proj = (jnp.sum(e * r, -1, keepdims=True)
                    / (jnp.sum(r * r, -1, keepdims=True) + 1e-8)) * r
            noise = e - proj
            return 10 * jnp.log10(jnp.sum(proj ** 2, -1)
                                  / (jnp.sum(noise ** 2, -1) + 1e-8) + 1e-8)

        import itertools
        perms = list(itertools.permutations(range(self.num_spks)))
        scores = jnp.stack([jnp.mean(jnp.stack(
            [sisnr(est[:, i], ref[:, j]) for i, j in enumerate(perm)]), 0)
            for perm in perms])  # (P, B)
        loss = -jnp.mean(jnp.max(scores, axis=0))
        return loss, {"loss": loss, "si_snr": -loss}, speech.shape[0]

    forward = forward_jit

    def inference(self, params, data_in, data_lengths=None,
                  key: Optional[List] = None, tokenizer=None, frontend=None,
                  **kwargs):
        from funasr_tpu.utils.load_utils import (as_unit_f32,
                                                 load_audio_text_image_video)
        audio_list = load_audio_text_image_video(
            data_in, fs=16000, audio_fs=kwargs.get("fs", 16000))
        audio_list = [as_unit_f32(a) for a in audio_list]
        maxlen = max(len(a) for a in audio_list)
        batch = np.zeros((len(audio_list), maxlen), np.float32)
        for i, a in enumerate(audio_list):
            batch[i, : len(a)] = a
        outs = self.separate(params, jnp.asarray(batch))
        outs = [np.asarray(o) for o in outs]
        if key is None:
            key = [f"rand_key_{i}" for i in range(len(audio_list))]
        results = []
        for i in range(len(audio_list)):
            n = len(audio_list[i])
            results.append({"key": key[i],
                            "value": [o[i, :n] for o in outs]})
        return results, {}
