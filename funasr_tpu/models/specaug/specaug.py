"""SpecAugment — freq/time masking as pure jax.random transforms.

TPU-native rebuild of the reference (FunASR ``funasr/models/specaug/specaug.py:17,126``
and ``mask_along_axis.py``). ``SpecAugLFR`` replicates the freq mask across each of the
``lfr_rate+1`` stride copies of the stacked LFR features (reference
``mask_along_axis_lfr:70-130``), so only the corresponding mel bands of every stacked
frame are masked. Time warp is rarely enabled in production configs
(``paraformer/template.yaml:70`` apply_time_warp: false) and is currently a no-op.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from funasr_tpu.register import tables


def _rand_masks(rng, b: int, num_mask: int, d: int, width_range):
    k1, k2 = jax.random.split(rng)
    lo, hi = width_range
    lengths = jax.random.randint(k1, (b, num_mask), lo, max(hi, lo + 1))
    pos_hi = max(1, d - hi)
    pos = jax.random.randint(k2, (b, num_mask), 0, pos_hi)
    return pos, lengths


def _apply_axis_mask(spec, pos, lengths, axis: int):
    d = spec.shape[axis]
    aran = jnp.arange(d)[None, None, :]
    mask = (pos[..., None] <= aran) & (aran < (pos + lengths)[..., None])
    mask = jnp.any(mask, axis=1)  # (B, D)
    if axis == 1:
        mask = mask[:, :, None]
    else:
        mask = mask[:, None, :]
    return jnp.where(mask, 0.0, spec)


@tables.register("specaug_classes", "SpecAug")
class SpecAug:
    def __init__(self, apply_time_warp: bool = True, time_warp_window: int = 5,
                 time_warp_mode: str = "bicubic", apply_freq_mask: bool = True,
                 freq_mask_width_range: Union[int, Sequence[int]] = (0, 20),
                 num_freq_mask: int = 2, apply_time_mask: bool = True,
                 time_mask_width_range: Optional[Sequence[int]] = None,
                 time_mask_width_ratio_range=None, num_time_mask: int = 2,
                 lfr_rate: int = 0, **kwargs):
        if isinstance(freq_mask_width_range, int):
            freq_mask_width_range = (0, freq_mask_width_range)
        if isinstance(time_mask_width_range, int):
            time_mask_width_range = (0, time_mask_width_range)
        self.apply_freq_mask = apply_freq_mask
        self.apply_time_mask = apply_time_mask
        self.freq_mask_width_range = tuple(freq_mask_width_range)
        self.time_mask_width_range = tuple(time_mask_width_range or (0, 40))
        self.num_freq_mask = num_freq_mask
        self.num_time_mask = num_time_mask
        self.lfr_rate = 1  # plain SpecAug: no stride replication

    def __call__(self, spec, spec_lengths, rng):
        """spec: (B, T, D) -> masked spec; pure given rng."""
        b, t, d = spec.shape
        k_f, k_t = jax.random.split(rng)
        if self.apply_freq_mask:
            d_eff = d // self.lfr_rate
            pos, lengths = _rand_masks(k_f, b, self.num_freq_mask, d_eff,
                                       self.freq_mask_width_range)
            if self.lfr_rate > 1:
                offs = jnp.arange(self.lfr_rate) * d_eff
                pos = (pos[:, None, :] + offs[None, :, None]).reshape(b, -1)
                lengths = jnp.tile(lengths, (1, self.lfr_rate))
            spec = _apply_axis_mask(spec, pos, lengths, axis=2)
        if self.apply_time_mask:
            pos, lengths = _rand_masks(k_t, b, self.num_time_mask, t,
                                       self.time_mask_width_range)
            spec = _apply_axis_mask(spec, pos, lengths, axis=1)
        return spec, spec_lengths


@tables.register("specaug_classes", "SpecAugLFR")
class SpecAugLFR(SpecAug):
    def __init__(self, lfr_rate: int = 0, **kwargs):
        super().__init__(**kwargs)
        self.lfr_rate = lfr_rate + 1
