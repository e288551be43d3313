"""FusedFrontends: combine several frontends by linear projection + temporal
re-alignment (counterpart of FunASR ``funasr/frontends/fused.py``).

Each sub-frontend's features are linearly projected to ``factor * proj_dim``
(factor = hop_length / gcd of all hops), reshaped to a common frame rate,
truncated to the shortest stream, and concatenated — output dim is
``proj_dim * n_frontends``. The reference supports default + s3prl frontends;
here any registered frontend exposing ``forward``/``output_size`` works (the
s3prl SSL family needs external torch checkpoints and is not bundled).
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import linear_apply, linear_init
from funasr_tpu.register import tables


@tables.register("frontend_classes", "FusedFrontends")
@tables.register("frontend_classes", "fused")
class FusedFrontends:
    def __init__(self, frontends: Optional[List[dict]] = None,
                 align_method: str = "linear_projection", proj_dim: int = 100,
                 fs: int = 16000, **kwargs):
        if align_method != "linear_projection":
            raise NotImplementedError(align_method)
        self.proj_dim = proj_dim
        self.fs = fs
        self.frontends = []
        self.hops = []
        for conf in (frontends or []):
            conf = dict(conf)
            ftype = conf.pop("frontend_type", "default")
            if ftype == "default":
                from funasr_tpu.frontends.default import DefaultFrontend
                fe = DefaultFrontend(fs=fs, **conf)
                hop = conf.get("hop_length", 128)
            elif ftype in tables.frontend_classes:
                fe = tables.frontend_classes[ftype](fs=fs, **conf)
                hop = conf.get("hop_length",
                               getattr(fe, "frame_shift", 160))
            else:
                raise NotImplementedError(
                    f"frontend_type {ftype!r} (s3prl SSL frontends need "
                    "external torch checkpoints and are not bundled)")
            self.frontends.append(fe)
            self.hops.append(int(hop))
        if not self.frontends:
            raise ValueError("FusedFrontends needs at least one sub-frontend")
        self.gcd = math.gcd(*self.hops) if len(self.hops) > 1 else self.hops[0]
        self.factors = [h // self.gcd for h in self.hops]

    def output_size(self) -> int:
        return len(self.frontends) * self.proj_dim

    def init(self, rng):
        keys = jax.random.split(rng, len(self.frontends))
        return {"projections": [
            linear_init(keys[i], fe.output_size(),
                        self.factors[i] * self.proj_dim)
            for i, fe in enumerate(self.frontends)]}

    def forward(self, params, waveforms, lengths):
        """(B, N) waveforms -> ((B, T, proj_dim * n_frontends), (B,) lens)."""
        wavs = [np.asarray(waveforms[i][: int(lengths[i])])
                for i in range(len(lengths))]
        streams = []
        for i, fe in enumerate(self.frontends):
            feats, flens = fe.extract(wavs)
            proj = linear_apply(params["projections"][i], jnp.asarray(feats))
            b, nf, dim = proj.shape
            f = self.factors[i]
            streams.append(proj.reshape(b, nf * f, dim // f))
        m = min(int(s.shape[1]) for s in streams)
        fused = jnp.concatenate([s[:, :m] for s in streams], axis=-1)
        out_lens = jnp.full((fused.shape[0],), m, jnp.int32)
        return fused, out_lens

    def extract(self, waveforms: List[np.ndarray], params=None):
        if params is None:
            params = self.init(jax.random.PRNGKey(0))
        maxn = max(int(w.shape[0]) for w in waveforms)
        batch = np.zeros((len(waveforms), maxn), np.float32)
        lens = np.zeros((len(waveforms),), np.int32)
        for i, w in enumerate(waveforms):
            batch[i, : len(w)] = w
            lens[i] = len(w)
        feats, flens = self.forward(params, jnp.asarray(batch),
                                    jnp.asarray(lens))
        return np.asarray(feats), np.asarray(flens)
