#!/usr/bin/env python3
"""Python WebSocket client for the funasr_tpu realtime ASR servers.

Counterpart of the reference client set (``runtime/python/websocket/
funasr_wss_client.py`` / ``funasr_client_api.py``), rebuilt against this
repo's stdlib WS stack — no third-party deps.

Protocol (see ``funasr_tpu/bin/funasr_wss_server.py``):
  -> {"mode": "offline"|"online"|"2pass", "chunk_size": [5,10,5],
      "wav_name": ..., "is_speaking": true, "hotwords": ..., "itn": true}
  -> binary 16 kHz PCM16 frames
  -> {"is_speaking": false}           # end of utterance
  <- {"mode": "...", "text": ..., "wav_name": ..., "is_final": ...}

Usage:
  python funasr_tpu_client.py --host 127.0.0.1 --port 10095 \
      --mode 2pass --audio-in a.wav [b.wav ...]
  python funasr_tpu_client.py --audio-in wav.scp --output-dir out/
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import wave

_REPO = os.path.join(os.path.dirname(__file__), "..", "..", "..")
if os.path.isdir(os.path.join(_REPO, "funasr_tpu")):
    sys.path.insert(0, os.path.abspath(_REPO))

from funasr_tpu.serving.ws_protocol import connect  # noqa: E402


def read_pcm16(path: str) -> bytes:
    """WAV or raw .pcm -> 16 kHz mono PCM16 bytes."""
    if path.endswith(".pcm"):
        with open(path, "rb") as f:
            return f.read()
    with wave.open(path, "rb") as w:
        assert w.getsampwidth() == 2, "need 16-bit PCM"
        return w.readframes(w.getnframes())


class FunASRClient:
    """One connection, one utterance stream at a time."""

    def __init__(self, host: str = "127.0.0.1", port: int = 10095,
                 mode: str = "2pass", chunk_size=(5, 10, 5),
                 chunk_interval: int = 10, hotwords: str = "",
                 itn: bool = True, final_timeout: float = 60.0):
        self.host, self.port = host, port
        self.mode = mode
        self.chunk_size = list(chunk_size)
        self.chunk_interval = chunk_interval
        self.hotwords = hotwords
        self.itn = itn
        self.final_timeout = final_timeout  # first-request compiles can be slow
        self.ws = None

    async def __aenter__(self):
        self.ws = await connect(self.host, self.port)
        return self

    async def __aexit__(self, *exc):
        await self.ws.close()

    async def transcribe(self, pcm: bytes, wav_name: str = "utt",
                         on_partial=None) -> str:
        """Stream one utterance; returns the final (offline) text."""
        cfg = {"mode": self.mode, "chunk_size": self.chunk_size,
               "chunk_interval": self.chunk_interval, "wav_name": wav_name,
               "is_speaking": True, "itn": self.itn}
        if self.hotwords:
            cfg["hotwords"] = self.hotwords
        await self.ws.send(json.dumps(cfg))

        # 60ms-equivalent stride: chunk_size[1] * 960 bytes per frame at 16 kHz
        stride = int(60 * self.chunk_size[1] / self.chunk_interval / 1000
                     * 16000 * 2)
        final_text, online_text = [], ""
        recv_task = None

        async def pump():
            nonlocal online_text
            while True:
                msg = await self.ws.recv()
                if isinstance(msg, bytes):
                    continue
                data = json.loads(msg)
                if on_partial:
                    on_partial(data)
                if data.get("mode", "").endswith("online"):
                    # incremental online partials ("clients concatenate");
                    # an online-mode final is a fresh full decode of the
                    # remaining buffer, NOT another increment — appending it
                    # would duplicate the transcript, so it only serves as a
                    # fallback when no partials accumulated
                    if not data.get("is_final"):
                        online_text += data.get("text", "") or ""
                    elif not online_text:
                        online_text = data.get("text", "") or ""
                else:
                    final_text.append(data.get("text", ""))
                if data.get("is_final"):
                    return

        recv_task = asyncio.ensure_future(pump())
        for off in range(0, len(pcm), stride):
            await self.ws.send(pcm[off:off + stride])
            if self.mode != "offline":
                await asyncio.sleep(0.001)
        await self.ws.send(json.dumps({"is_speaking": False}))
        try:
            await asyncio.wait_for(recv_task, timeout=self.final_timeout)
        except asyncio.TimeoutError:
            recv_task.cancel()
        return "".join(final_text) or online_text


async def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=10095)
    ap.add_argument("--mode", default="2pass",
                    choices=["offline", "online", "2pass"])
    ap.add_argument("--chunk-size", default="5,10,5")
    ap.add_argument("--hotwords", default="")
    ap.add_argument("--no-itn", action="store_true")
    ap.add_argument("--audio-in", nargs="+", required=True,
                    help="wav/pcm files, or one wav.scp")
    ap.add_argument("--output-dir", default=None)
    args = ap.parse_args()

    items = []
    for a in args.audio_in:
        if a.endswith(".scp"):
            with open(a) as f:
                items += [line.split(maxsplit=1) for line in f
                          if line.strip()]
        else:
            items.append([os.path.basename(a), a])

    out = open(os.path.join(args.output_dir, "text"), "w") \
        if args.output_dir else None
    async with FunASRClient(
            args.host, args.port, args.mode,
            [int(x) for x in args.chunk_size.split(",")],
            hotwords=args.hotwords, itn=not args.no_itn) as cli:
        for name, path in items:
            text = await cli.transcribe(read_pcm16(path.strip()), name)
            line = f"{name}\t{text}"
            print(line)
            if out:
                out.write(line + "\n")
    if out:
        out.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(asyncio.run(main()))
