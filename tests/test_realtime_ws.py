"""Realtime WS server protocol test: partials + STOP finalization + hotword msg."""

import asyncio
import json
import os
import socket
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = "/root/reference"
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)
from conftest import stub_reference_deps  # noqa: E402

stub_reference_deps()


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_realtime_ws_stop_flow(tmp_path_factory):
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_auto_model import asr_dir as asr_fixture

    class FakeTPF:
        def mktemp(self, name):
            return tmp_path_factory.mktemp(name)

    d = asr_fixture.__wrapped__(FakeTPF())
    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.bin.realtime_ws import RealtimeWSServer
    from funasr_tpu.serving.ws_protocol import connect, serve

    asr = AutoModel(model=d, disable_pbar=True)
    server = RealtimeWSServer(asr, decode_interval=0.05, partial_window_sec=5.0)
    port = _free_port()
    rng = np.random.default_rng(0)

    async def scenario():
        srv = await serve(server.handle, "127.0.0.1", port)
        try:
            ws = await connect("127.0.0.1", port)
            await ws.send("HOTWORDS: 一丁")
            pcm = (rng.standard_normal(16000) * 0.1 * 32767).astype(np.int16)
            for i in range(0, len(pcm), 4800):
                await ws.send(pcm[i:i + 4800].tobytes())
                await asyncio.sleep(0.08)
            # drain partials until we send STOP and get the final
            await ws.send("STOP")
            msgs = []
            try:
                while True:
                    msgs.append(json.loads(await asyncio.wait_for(ws.recv(), 90)))
                    if msgs[-1].get("is_final"):
                        break
            except Exception:
                pass
            await ws.close()
            return msgs
        finally:
            srv.close()
            await srv.wait_closed()

    msgs = asyncio.run(scenario())
    assert msgs, "no messages received"
    finals = [m for m in msgs if m.get("is_final")]
    assert finals and finals[-1]["type"] == "final"
    assert "text" in finals[-1]
