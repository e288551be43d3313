"""S3prlFrontend: SSL-upstream feature frontend.

Counterpart of FunASR ``funasr/frontends/s3prl.py:36`` — the reference wraps
the external s3prl hub (torch upstream models + a learnable layer featurizer).
The TPU-native substitution backs the same surface with this package's own SSL
trunks (data2vec by default; any registered model exposing
``extract_features(params, wav, lens)``), plus the reference's
``multilayer_feature`` weighted-layer-sum featurizer and ``tile_factor``.

No network hub: ``upstream_ckpt`` points at a converted checkpoint loaded
through ``funasr_tpu.convert``; with no checkpoint it runs random-init (useful
for probing shapes, as s3prl's ``--upstream_refresh`` path does).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.register import tables


@tables.register("frontend_classes", "S3prlFrontend")
class S3prlFrontend:
    def __init__(self, fs: int = 16000, frontend_conf: Optional[dict] = None,
                 download_dir: Optional[str] = None,
                 multilayer_feature: bool = False, **kwargs):
        conf = dict(frontend_conf or {})
        self.fs = int(fs) if not isinstance(fs, str) else int(
            fs.lower().replace("k", "000").replace("hz", "") or 16000)
        self.multilayer_feature = multilayer_feature
        self.tile_factor = int(conf.get("tile_factor", 1))
        upstream = conf.get("upstream", "data2vec")
        upstream_conf = dict(conf.get("upstream_conf") or {})
        model_cls = tables.model_classes[upstream]
        self.upstream = model_cls(**upstream_conf)
        self._rng = jax.random.PRNGKey(int(conf.get("seed", 0)))
        self.params = self.upstream.init_params(self._rng)
        ckpt = conf.get("upstream_ckpt")
        if ckpt:
            from funasr_tpu.convert.torch_to_jax import (convert_state_dict,
                                                         load_torch_checkpoint)
            sd = load_torch_checkpoint(ckpt)
            self.params = convert_state_dict(sd, self.upstream,
                                             type(self.upstream).__name__)
        self._d = self.upstream.encoder.output_size() \
            if hasattr(self.upstream, "encoder") and \
            hasattr(self.upstream.encoder, "output_size") else None
        n_layers = getattr(getattr(self.upstream, "encoder", None),
                           "encoder_layers", 1)
        # featurizer: learnable softmax layer weights (s3prl Featurizer role)
        self.layer_weights = jnp.zeros((n_layers,), jnp.float32) \
            if multilayer_feature else None
        # for AutoFrontend compatibility
        self.frame_shift_ms = 20
        self.lfr_n = 1

    def output_size(self) -> int:
        return self._d or 768

    def _features(self, wav, lens):
        enc = self.upstream.encoder
        params = self.params["student"] if "student" in self.params \
            else self.params
        if self.multilayer_feature and hasattr(enc, "encoder_extract_features"):
            feats = enc.feature_extractor(params["feature_extractor"], wav)
            from funasr_tpu.core.layers import (layer_norm_apply, linear_apply,
                                                make_pad_mask)
            feats = layer_norm_apply(params["layer_norm"], feats, eps=1e-5)
            out_lens = enc.feat_extract_output_length(lens)
            valid = make_pad_mask(out_lens, feats.shape[1])
            feats = linear_apply(params["post_extract_proj"], feats)
            _, layer_results = enc.encoder_extract_features(params["encoder"],
                                                            feats, valid)
            stack = jnp.stack([lr[0] for lr in layer_results])  # (L, B, T, D)
            w = jax.nn.softmax(self.layer_weights)
            return jnp.einsum("l,lbtd->btd", w, stack), out_lens
        return self.upstream.extract_features(self.params, wav, lens)

    def extract(self, audio_list) -> Tuple[np.ndarray, np.ndarray]:
        """List of waveforms -> (feats (B, T, D), lens (B,))."""
        lens = np.asarray([len(a) for a in audio_list], np.int32)
        maxlen = int(lens.max())
        batch = np.zeros((len(audio_list), maxlen), np.float32)
        for i, a in enumerate(audio_list):
            batch[i, : len(a)] = np.asarray(a, np.float32)
        feats, out_lens = self._features(jnp.asarray(batch), jnp.asarray(lens))
        if self.tile_factor != 1:
            feats = jnp.repeat(feats, self.tile_factor, axis=1)
            out_lens = out_lens * self.tile_factor
        return np.asarray(feats), np.asarray(out_lens)

    __call__ = extract
