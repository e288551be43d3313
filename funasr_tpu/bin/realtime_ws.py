"""Realtime streaming ASR WebSocket server (the modern service).

TPU-native rebuild of FunASR ``funasr/bin/realtime_ws.py`` (1261 LoC): endpoints via
DynamicStreamingVAD (server mode) or client STOP/COMMIT control messages; interim
partial decodes every ``decode_interval`` over a sliding ``partial_window_sec``
window; final decode + punctuation on endpoint; ``HOTWORDS:`` /
``POSTPROCESS_HOTWORDS:`` control messages; HybridSpeakerTracker online diarization.

Runs on the stdlib websocket implementation.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import logging
import time
from typing import Dict, List, Optional

import numpy as np

from funasr_tpu.serving.ws_protocol import ConnectionClosed, serve

logger = logging.getLogger("realtime_ws")


class HybridSpeakerTracker:
    """Online diarization: per-utterance speaker embedding matched to running
    centroids by cosine; new speakers spawn when below threshold
    (role of reference ``realtime_ws.py:203-250``)."""

    def __init__(self, spk_model=None, spk_params=None, threshold: float = 0.6):
        self.model = spk_model
        self.params = spk_params
        self.threshold = threshold
        self.centroids: List[np.ndarray] = []
        self.counts: List[int] = []

    def assign(self, audio: np.ndarray) -> Optional[int]:
        if self.model is None or len(audio) < 8000:
            return None
        res, _ = self.model.inference(self.params, [audio])
        emb = np.asarray(res[0]["spk_embedding"])[0]
        emb = emb / (np.linalg.norm(emb) + 1e-9)
        best, best_sim = -1, -1.0
        for i, c in enumerate(self.centroids):
            sim = float(emb @ c)
            if sim > best_sim:
                best, best_sim = i, sim
        if best >= 0 and best_sim >= self.threshold:
            n = self.counts[best]
            self.centroids[best] = (self.centroids[best] * n + emb) / (n + 1)
            self.centroids[best] /= np.linalg.norm(self.centroids[best]) + 1e-9
            self.counts[best] += 1
            return best
        self.centroids.append(emb)
        self.counts.append(1)
        return len(self.centroids) - 1


class RealtimeSession:
    def __init__(self, server, endpoint_mode: str = "server"):
        self.server = server
        self.endpoint_mode = endpoint_mode
        self.audio = np.zeros((0,), np.float32)   # current utterance
        self.total_samples = 0
        self.last_decode_samples = 0
        self.hotword: Optional[str] = None
        self.postprocess_hotwords: Optional[str] = None
        self.vad = server.make_vad() if endpoint_mode == "server" else None
        self.utt_index = 0
        self.start_ms = 0


class RealtimeWSServer:
    def __init__(self, asr_model, vad_model=None, spk_model=None,
                 decode_interval: float = 0.6, partial_window_sec: float = 15.0,
                 sample_rate: int = 16000):
        self.asr = asr_model  # AutoModel (offline, may include punc)
        self.vad_model = vad_model
        self.spk_tracker_factory = (
            (lambda: HybridSpeakerTracker(spk_model.model, spk_model.model_params))
            if spk_model is not None else (lambda: None))
        self.decode_interval = decode_interval
        self.partial_window = int(partial_window_sec * sample_rate)
        self.sample_rate = sample_rate

    def make_vad(self):
        if self.vad_model is None:
            return None
        from funasr_tpu.models.fsmn_vad_streaming.dynamic_vad import (
            DynamicStreamingVAD)
        return DynamicStreamingVAD(self.vad_model)

    # ------------------------------------------------------------------

    def _decode(self, audio: np.ndarray, hotword=None, final=False) -> str:
        if len(audio) < 800:
            return ""
        kwargs = {}
        if hotword:
            kwargs["hotword"] = hotword
        res = self.asr.generate(input=audio, **kwargs)
        return res[0]["text"] if res else ""

    async def handle(self, ws):
        sess = RealtimeSession(self, endpoint_mode="server"
                               if self.vad_model is not None else "client")
        tracker = self.spk_tracker_factory()
        loop = asyncio.get_event_loop()
        last_partial = time.monotonic()
        while True:
            try:
                msg = await ws.recv()
            except ConnectionClosed:
                break
            if isinstance(msg, str):
                stripped = msg.strip()
                if stripped.upper().startswith("STOP"):
                    await self._finalize(ws, sess, tracker, loop)
                    break
                if stripped.upper().startswith("COMMIT"):
                    if sess.endpoint_mode != "client":
                        await ws.send(json.dumps({"error":
                                                  "COMMIT requires client mode"}))
                        continue
                    await self._finalize(ws, sess, tracker, loop)
                    continue
                if stripped.startswith("HOTWORDS:"):
                    sess.hotword = stripped[len("HOTWORDS:"):].strip() or None
                    continue
                if stripped.startswith("POSTPROCESS_HOTWORDS:"):
                    sess.postprocess_hotwords = \
                        stripped[len("POSTPROCESS_HOTWORDS:"):].strip() or None
                    continue
                try:
                    cfg = json.loads(stripped)
                    sess.hotword = cfg.get("hotwords", sess.hotword)
                except json.JSONDecodeError:
                    pass
                continue

            pcm = np.frombuffer(msg, np.int16).astype(np.float32) / 32768.0
            sess.audio = np.concatenate([sess.audio, pcm])
            sess.total_samples += len(pcm)

            # server VAD endpointing
            if sess.vad is not None:
                for ev in sess.vad.feed(pcm):
                    if ev[1] != -1:  # endpoint
                        await self._finalize(ws, sess, tracker, loop)

            # interim partial decode
            now = time.monotonic()
            if now - last_partial >= self.decode_interval and len(sess.audio):
                last_partial = now
                window = sess.audio[-self.partial_window:] \
                    if self.partial_window else sess.audio
                text = await loop.run_in_executor(
                    None, self._decode, window, sess.hotword, False)
                if text:
                    await ws.send(json.dumps(
                        {"type": "partial", "text": text,
                         "utt": sess.utt_index, "is_final": False},
                        ensure_ascii=False))

    async def _finalize(self, ws, sess, tracker, loop):
        audio = sess.audio
        sess.audio = np.zeros((0,), np.float32)
        if len(audio) < 800:
            return
        cfg = {}
        if sess.postprocess_hotwords:
            cfg["postprocess_hotwords"] = sess.postprocess_hotwords
        text = await loop.run_in_executor(
            None, lambda: (self.asr.generate(
                input=audio, hotword=sess.hotword, **cfg) or [{}])[0].get(
                    "text", ""))
        spk = tracker.assign(audio) if tracker is not None else None
        end_ms = sess.total_samples * 1000 // self.sample_rate
        payload = {"type": "final", "text": text, "utt": sess.utt_index,
                   "start_ms": sess.start_ms, "end_ms": end_ms, "is_final": True}
        if spk is not None:
            payload["spk"] = int(spk)
        sess.start_ms = end_ms
        sess.utt_index += 1
        await ws.send(json.dumps(payload, ensure_ascii=False))


def main_cli():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=10096)
    parser.add_argument("--model", required=True)
    parser.add_argument("--vad-model", default=None)
    parser.add_argument("--punc-model", default=None)
    parser.add_argument("--spk-model", default=None)
    parser.add_argument("--decode-interval", type=float, default=0.6)
    parser.add_argument("--partial-window-sec", type=float, default=15.0)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    from funasr_tpu.auto.auto_model import AutoModel
    asr = AutoModel(model=args.model, punc_model=args.punc_model,
                    disable_pbar=True)
    vad = AutoModel(model=args.vad_model,
                    disable_pbar=True) if args.vad_model else None
    spk = AutoModel(model=args.spk_model,
                    disable_pbar=True) if args.spk_model else None
    server = RealtimeWSServer(asr, vad_model=vad, spk_model=spk,
                              decode_interval=args.decode_interval,
                              partial_window_sec=args.partial_window_sec)

    async def run():
        srv = await serve(server.handle, args.host, args.port)
        logger.info("realtime ws server on %s:%d", args.host, args.port)
        async with srv:
            await srv.serve_forever()

    asyncio.run(run())


if __name__ == "__main__":
    main_cli()
