"""WavFrontend: kaldi fbank + LFR + CMVN, batched on device with bucketed shapes.

TPU-native rebuild of the reference frontend (FunASR ``funasr/frontends/
wav_frontend.py:89-258``): same math (waveform * 2^15, hamming 25/10 ms fbank, LFR
m/n stack, CMVN add-shift/rescale), but executed as one jitted device pipeline over a
(B, N_bucket) batch instead of a per-utterance host loop.

Streaming variant (``WavFrontendOnline``, reference ``:261-662``) keeps a sample-level
input cache and an LFR splice cache so chunk boundaries match the offline pipeline.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.ops.fbank import fbank_batch, num_frames
from funasr_tpu.ops.lfr import apply_cmvn, apply_lfr_batch, load_cmvn
from funasr_tpu.register import tables
from funasr_tpu.utils.bucket import bucket_length


@tables.register("frontend_classes", "wav_frontend")
@tables.register("frontend_classes", "WavFrontend")
class WavFrontend:
    def __init__(self, cmvn_file: Optional[str] = None, fs: int = 16000,
                 window: str = "hamming", n_mels: int = 80, frame_length: int = 25,
                 frame_shift: int = 10, lfr_m: int = 1, lfr_n: int = 1,
                 dither: float = 1.0, snip_edges: bool = True,
                 upsacle_samples: bool = True, **kwargs):
        self.fs = fs
        self.window = window
        self.n_mels = n_mels
        self.frame_length_ms = frame_length
        self.frame_shift_ms = frame_shift
        self.frame_length = int(frame_length * fs / 1000)
        self.frame_shift = int(frame_shift * fs / 1000)
        self.lfr_m = lfr_m
        self.lfr_n = lfr_n
        self.dither = dither
        self.snip_edges = snip_edges
        self.upsacle_samples = upsacle_samples
        self.cmvn_file = cmvn_file
        self.cmvn = load_cmvn(cmvn_file) if cmvn_file else None
        self._jit_pipeline = jax.jit(self._pipeline)

    def output_size(self) -> int:
        return self.n_mels * self.lfr_m

    # ------------------------------------------------------------------
    # device pipeline (jitted; one compile per (B, N) bucket)
    # ------------------------------------------------------------------

    def _pipeline(self, waveforms, lengths, dither_rng=None):
        # dither (reference wav_frontend.py:120, default 1.0 in train configs) is
        # applied only when a PRNG key is passed — i.e. on the training path;
        # inference stays deterministic with dither off.
        if waveforms.dtype == jnp.int16:
            # PCM16 fast path: callers may upload raw int16 samples (half the
            # host->device bytes of float32 — the dominant cost on tunneled
            # transports). Bit-exact vs the float path: int16 -> f32 is
            # lossless and (i/2^15)*2^15 == i in f32.
            waveforms = waveforms.astype(jnp.float32)
            scale = 1.0 if self.upsacle_samples else 1.0 / float(1 << 15)
        else:
            scale = float(1 << 15) if self.upsacle_samples else 1.0
        feats, flens = fbank_batch(
            waveforms * scale, lengths,
            dither=self.dither,
            dither_rng=dither_rng,
            num_mel_bins=self.n_mels,
            frame_length=self.frame_length,
            frame_shift=self.frame_shift,
            sample_frequency=float(self.fs),
            window_type=self.window,
            snip_edges=self.snip_edges,
        )
        if self.lfr_m != 1 or self.lfr_n != 1:
            feats, flens = apply_lfr_batch(feats, flens, self.lfr_m, self.lfr_n)
        if self.cmvn is not None:
            feats = apply_cmvn(feats, jnp.asarray(self.cmvn[0]), jnp.asarray(self.cmvn[1]))
        return feats, flens

    # ------------------------------------------------------------------
    # host entry
    # ------------------------------------------------------------------

    # models whose decode path buckets (B, T) itself can take the features as
    # device arrays straight from the fbank program — no host round trip
    supports_device_extract = True
    # raw int16 PCM input is converted on-device (see extract/_pipeline)
    supports_pcm16 = True

    def extract(self, waveforms: List[np.ndarray], device: bool = False):
        """list of float32 [-1, 1) (or raw int16 PCM) waveforms ->
        (feats (B, T, D), lens (B,) int32).

        ``device=False``: numpy, trimmed to the batch max length (host callers).
        ``device=True``: jax arrays left at the waveform-bucket frame count —
        the downstream jit program pads to its own (B, T) bucket on device.
        int16 input transfers half the bytes and produces bit-identical
        features to the equivalent ``int16 / 32768`` float input.
        """
        b = len(waveforms)
        maxn = max(max(int(w.shape[0]) for w in waveforms), self.frame_length)
        n_bucket = bucket_length(maxn, minimum=self.fs // 4, multiple=self.frame_shift)
        # PCM16 fast path: if every input is int16, upload int16 and convert
        # on device (half the transfer bytes; bit-exact — see _pipeline)
        dtype = (np.int16 if all(np.asarray(w).dtype == np.int16
                                 for w in waveforms) else np.float32)
        batch = np.zeros((b, n_bucket), dtype)
        lens = np.zeros((b,), np.int32)
        for i, w in enumerate(waveforms):
            # reference clamps frame_length for ultra-short clips; we right-pad with
            # zeros to one full window instead (same frame count, silence tail)
            w = np.asarray(w)
            if dtype == np.float32 and w.dtype == np.int16:
                w = w.astype(np.float32) / 32768.0  # mixed batch: rescale
            n = int(w.shape[0])
            batch[i, :n] = w
            lens[i] = max(n, self.frame_length)
        feats, flens = self._jit_pipeline(batch, jnp.asarray(lens))
        if device:
            return feats, flens
        feats = np.asarray(feats)
        flens = np.asarray(flens)
        t = int(flens.max()) if len(flens) else 0
        return feats[:, :t], flens

    def forward(self, waveforms, lengths):
        """Device-native call for already-batched (B, N) waveforms (training path)."""
        return self._jit_pipeline(waveforms, lengths)


@tables.register("frontend_classes", "WavFrontendOnline")
class WavFrontendOnline(WavFrontend):
    """Streaming frontend: carries sample + LFR splice caches across chunks so the
    concatenated streaming output bit-matches the offline pipeline.

    Cache dict: {"input": leftover raw samples not yet fully framed,
                 "lfr_splice": last raw fbank frames needed as LFR left context,
                 "frame_idx": absolute index of first un-emitted LFR frame,
                 "fbank_beg": absolute raw-frame index of next fbank frame}
    (role of reference ``input_cache``/``lfr_splice_cache``, ``wav_frontend.py:261-662``)
    """

    def init_cache(self):
        return {
            "waveform": np.zeros((0,), np.float32),
            "consumed_samples": 0,   # samples fully consumed into emitted fbank frames
            "raw_frames": 0,          # total raw fbank frames emitted so far
            "lfr_ctx": np.zeros((0, self.n_mels), np.float32),  # raw frames kept for lfr
            "lfr_out": 0,             # LFR frames emitted so far
        }

    def forward_streaming(self, waveforms: List[np.ndarray], cache=None,
                          is_final: bool = False):
        """Accumulate chunk, emit all complete LFR frames; on final, flush tail.

        Returns (feats (1, T, D), lens (1,)) possibly T=0.
        """
        assert cache is not None
        if "waveform" not in cache:
            cache.update(self.init_cache())
        chunk = np.concatenate([cache["waveform"]] + [w.astype(np.float32) for w in waveforms])
        # raw fbank frames available in buffered samples
        total = chunk.shape[0]
        t_raw = num_frames(total, self.frame_length, self.frame_shift)
        if t_raw == 0 and not is_final:
            cache["waveform"] = chunk
            return np.zeros((1, 0, self.output_size()), np.float32), np.zeros((1,), np.int32)

        feats_new = np.zeros((0, self.n_mels), np.float32)
        if t_raw > 0:
            from funasr_tpu.ops.fbank import fbank
            scale = float(1 << 15) if self.upsacle_samples else 1.0
            feats_new = np.asarray(fbank(
                jnp.asarray(chunk * scale),
                num_mel_bins=self.n_mels, frame_length=self.frame_length,
                frame_shift=self.frame_shift, sample_frequency=float(self.fs),
                window_type=self.window, snip_edges=self.snip_edges))
        # keep unconsumed samples: frames consume t_raw*shift samples; window overhang stays
        consumed = t_raw * self.frame_shift
        cache["waveform"] = chunk[consumed:]

        # assemble raw-frame stream for LFR: previously kept context + new frames
        stream = np.concatenate([cache["lfr_ctx"], feats_new], axis=0)
        ctx_left = (self.lfr_m - 1) // 2

        if self.lfr_m == 1 and self.lfr_n == 1:
            out = stream
            cache["lfr_ctx"] = np.zeros((0, self.n_mels), np.float32)
        else:
            first_emitted = cache["lfr_out"]  # absolute LFR index of next output
            abs_start_of_stream = cache["raw_frames"] - cache["lfr_ctx"].shape[0]
            total_raw = cache["raw_frames"] + feats_new.shape[0]
            outs = []
            i = first_emitted
            while True:
                # window covers raw frames [i*n - ctx_left, i*n - ctx_left + m)
                w_beg = i * self.lfr_n - ctx_left
                w_end = w_beg + self.lfr_m
                if w_end > total_raw and not is_final:
                    break
                if is_final and i * self.lfr_n >= total_raw:
                    break
                idx = np.clip(np.arange(w_beg, w_end), 0, total_raw - 1)
                rel = idx - abs_start_of_stream
                if rel.min() < 0:
                    rel = np.clip(rel, 0, None)  # clamped-first-frame semantics
                rel = np.clip(rel, 0, stream.shape[0] - 1)
                outs.append(stream[rel].reshape(-1))
                i += 1
            out = (np.stack(outs, axis=0) if outs
                   else np.zeros((0, self.output_size()), np.float32))
            cache["lfr_out"] = i
            # keep raw frames still needed by future windows
            next_need = i * self.lfr_n - ctx_left
            keep_from = max(next_need - abs_start_of_stream, 0)
            cache["lfr_ctx"] = stream[keep_from:]

        cache["raw_frames"] += feats_new.shape[0]
        if self.cmvn is not None and out.shape[0] > 0:
            out = (out + self.cmvn[0]) * self.cmvn[1]
        return out[None].astype(np.float32), np.asarray([out.shape[0]], np.int32)
