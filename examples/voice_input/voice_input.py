#!/usr/bin/env python3
"""Realtime voice input: stream microphone (or a wav file as a mic stand-in)
to the realtime WebSocket server and print live partials/finals. funasr_tpu
counterpart of the reference ``examples/voice_input/``.

Terminal 1:  python -m funasr_tpu.bin.realtime_ws ++model=paraformer-zh-streaming
Terminal 2:  python voice_input.py [mic|path/to.wav]
"""

import asyncio
import json
import sys

URI = "ws://localhost:10096"
CHUNK_MS = 200


async def stream(source: str):
    import websockets  # pip install websockets

    async with websockets.connect(URI) as ws:
        await ws.send(json.dumps({"mode": "online", "chunk_interval": 10,
                                  "wav_name": source, "is_speaking": True}))

        async def feed():
            if source == "mic":
                import sounddevice as sd  # pip install sounddevice
                q = asyncio.Queue()
                loop = asyncio.get_running_loop()

                def cb(indata, frames, t, status):
                    loop.call_soon_threadsafe(q.put_nowait, bytes(indata))

                with sd.RawInputStream(samplerate=16000, channels=1,
                                       dtype="int16", callback=cb,
                                       blocksize=16 * CHUNK_MS):
                    while True:
                        await ws.send(await q.get())
            else:
                import wave
                with wave.open(source, "rb") as w:
                    n = 16 * CHUNK_MS * 2
                    data = w.readframes(w.getnframes())
                for i in range(0, len(data), n):
                    await ws.send(data[i:i + n])
                    await asyncio.sleep(CHUNK_MS / 1000)
                await ws.send(json.dumps({"is_speaking": False}))

        async def recv():
            async for msg in ws:
                data = json.loads(msg)
                text = data.get("text", "")
                if data.get("is_final"):
                    print("\n[final]", text)
                    if source != "mic":
                        return
                else:
                    print("\r[partial]", text, end="", flush=True)

        await asyncio.gather(feed(), recv())


if __name__ == "__main__":
    asyncio.run(stream(sys.argv[1] if len(sys.argv) > 1 else "mic"))
