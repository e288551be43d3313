"""CifPredictorV3: CIF + upsampled second alpha head for per-token timestamps.

TPU-native rebuild of the reference (FunASR ``funasr/models/bicif_paraformer/
cif_predictor.py:121-360``: shared cif_conv1d, ConvTranspose1d xN upsample (+BLSTM for
``cnn_blstm``) -> sigmoid alphas2; ``get_upsample_timestamp:302-352`` rescales alphas2
to the decoded token count and fires at threshold-1e-4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    bilstm_apply, conv1d_apply, conv_transpose1d_apply_stride_eq_kernel,
    conv_transpose1d_init, linear_apply, linear_init, lstm_init)
from funasr_tpu.models.paraformer.cif_predictor import CifPredictorV2
from funasr_tpu.ops.cif import cif_fires
from funasr_tpu.register import tables


@tables.register("predictor_classes", "CifPredictorV3")
class CifPredictorV3(CifPredictorV2):
    def __init__(self, *args, smooth_factor2: float = 1.0,
                 noise_threshold2: float = 0.0, upsample_times: int = 5,
                 upsample_type: str = "cnn", use_cif1_cnn: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.smooth_factor2 = smooth_factor2
        self.noise_threshold2 = noise_threshold2
        self.upsample_times = upsample_times
        self.upsample_type = upsample_type
        self.use_cif1_cnn = use_cif1_cnn
        assert upsample_type in ("cnn", "cnn_blstm"), upsample_type

    def init(self, rng):
        params = super().init(rng)
        c = self.cfg
        k1, k2, k3, k4 = jax.random.split(jax.random.fold_in(rng, 3), 4)
        params["upsample_cnn"] = conv_transpose1d_init(k1, c.idim, c.idim,
                                                       self.upsample_times)
        out_dim = c.idim
        if self.upsample_type == "cnn_blstm":
            params["blstm_fw"] = lstm_init(k2, c.idim, c.idim)
            params["blstm_bw"] = lstm_init(k3, c.idim, c.idim)
            out_dim = c.idim * 2
        params["cif_output2"] = linear_init(k4, out_dim, 1)
        return params

    def _cif1_conv(self, params, hidden):
        c = self.cfg
        h = conv1d_apply(params["cif_conv1d"], hidden, left_pad=c.l_order,
                         right_pad=c.r_order)
        return jax.nn.relu(h)

    def get_upsample_timestamp(self, params, hidden, mask=None, token_num=None):
        """-> (ds_alphas, ds_cif_peak, us_alphas, us_peaks); us arrays are
        (B, T*upsample_times) fp32."""
        b, t, d = hidden.shape
        conv_out = self._cif1_conv(params, hidden)
        src = conv_out if self.use_cif1_cnn else hidden
        up = conv_transpose1d_apply_stride_eq_kernel(params["upsample_cnn"], src)
        if self.upsample_type == "cnn_blstm":
            up = bilstm_apply(params["blstm_fw"], params["blstm_bw"], up)
        alphas2 = jax.nn.sigmoid(
            linear_apply(params["cif_output2"], up)[..., 0].astype(jnp.float32))
        alphas2 = jax.nn.relu(alphas2 * self.smooth_factor2 - self.noise_threshold2)
        if mask is not None:
            mask2 = jnp.repeat(mask.astype(jnp.float32), self.upsample_times, axis=1)
            alphas2 = alphas2 * mask2
        if token_num is not None:
            total = jnp.sum(alphas2, axis=-1)
            alphas2 = alphas2 * (token_num.astype(jnp.float32)
                                 / jnp.maximum(total, 1e-9))[:, None]
        ds_alphas = alphas2.reshape(b, -1, self.upsample_times).sum(-1)
        thr = self.cfg.threshold - 1e-4
        ds_peak = _fires_thr(ds_alphas, thr)
        us_peak = _fires_thr(alphas2, thr)
        return ds_alphas, ds_peak, alphas2, us_peak


def _fires_thr(alphas, threshold):
    """Sequential-fire trace with arbitrary threshold (reference ``cif_wo_hidden``),
    vectorized via scaled cumsum (exact for threshold-1e-4 style use)."""
    scaled = alphas / threshold
    fires, _, _ = cif_fires(scaled)
    # convert back: the reference trace reports integrate values pre-subtraction
    return fires * threshold
