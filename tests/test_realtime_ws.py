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


def _tiny_asr(tmp_path_factory):
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_auto_model import asr_dir as asr_fixture

    class FakeTPF:
        def mktemp(self, name):
            return tmp_path_factory.mktemp(name)

    d = asr_fixture.__wrapped__(FakeTPF())
    from funasr_tpu.auto.auto_model import AutoModel
    return AutoModel(model=d, disable_pbar=True)


def test_realtime_ws_commit_client_mode(tmp_path_factory):
    """Client endpoint mode: COMMIT finalizes the pending utterance and keeps
    the session open for the next one (ref realtime_ws.py commit():676-695);
    utt indices advance; COMMIT in server mode is rejected."""
    from funasr_tpu.bin.realtime_ws import RealtimeWSServer
    from funasr_tpu.serving.ws_protocol import connect, serve

    asr = _tiny_asr(tmp_path_factory)
    server = RealtimeWSServer(asr, chunk_ms=100, first_chunk_ms=100,
                              endpoint_mode="client")
    port = _free_port()
    rng = np.random.default_rng(1)

    async def scenario():
        srv = await serve(server.handle, "127.0.0.1", port)
        try:
            ws = await connect("127.0.0.1", port)
            finals = []
            for _ in range(2):  # two COMMIT-delimited utterances
                pcm = (rng.standard_normal(16000) * 0.1 * 32767
                       ).astype(np.int16)
                await ws.send(pcm.tobytes())
                await ws.send("COMMIT")
                while True:
                    m = json.loads(await asyncio.wait_for(ws.recv(), 90))
                    if m.get("is_final"):
                        finals.append(m)
                        break
            await ws.send("STOP")
            await ws.close()
            return finals
        finally:
            srv.close()
            await srv.wait_closed()

    finals = asyncio.run(scenario())
    assert len(finals) == 2
    assert finals[0]["utt"] == 0 and finals[1]["utt"] == 1
    assert finals[1]["start_ms"] >= finals[0]["end_ms"]
    assert all(f["text"] for f in finals)


def test_realtime_ws_commit_rejected_in_server_mode(tmp_path_factory):
    from funasr_tpu.bin.realtime_ws import RealtimeWSServer
    from funasr_tpu.serving.ws_protocol import connect, serve

    asr = _tiny_asr(tmp_path_factory)
    # no vad model -> default would be client; pin server via config switch
    server = RealtimeWSServer(asr, chunk_ms=100)
    port = _free_port()

    async def scenario():
        srv = await serve(server.handle, "127.0.0.1", port)
        try:
            ws = await connect("127.0.0.1", port)
            # switch this session to server endpoints via the config frame
            await ws.send(json.dumps({"endpoint_mode": "server"}))
            await ws.send("COMMIT")
            m = json.loads(await asyncio.wait_for(ws.recv(), 30))
            await ws.close()
            return m
        finally:
            srv.close()
            await srv.wait_closed()

    m = asyncio.run(scenario())
    assert "error" in m and "COMMIT" in m["error"]


def test_realtime_ws_partial_stability_counter(tmp_path_factory):
    """Consecutive partials with the same normalized text bump the `stable`
    counter (ref _record_partial_text role); a changed text resets it to 1.
    Decode is stubbed so the sequence is deterministic."""
    from funasr_tpu.bin.realtime_ws import RealtimeWSServer
    from funasr_tpu.serving.ws_protocol import connect, serve

    asr = _tiny_asr(tmp_path_factory)
    server = RealtimeWSServer(asr, chunk_ms=50, first_chunk_ms=50,
                              endpoint_mode="client")
    texts = iter(["你好", "你好。", "你好，", "你好 世界", "你好世界"])
    server._decode = lambda audio, hotword=None, **cfg: next(texts, "你好世界")
    port = _free_port()
    rng = np.random.default_rng(2)

    async def scenario():
        srv = await serve(server.handle, "127.0.0.1", port)
        try:
            ws = await connect("127.0.0.1", port)
            pcm = (rng.standard_normal(1600) * 0.1 * 32767).astype(np.int16)
            partials = []
            for _ in range(6):
                await ws.send(pcm.tobytes())
                try:
                    while len(partials) < 6:
                        m = json.loads(await asyncio.wait_for(ws.recv(), 2))
                        if m.get("type") == "partial":
                            partials.append(m)
                            break
                except asyncio.TimeoutError:
                    pass
            await ws.send("STOP")
            await ws.close()
            return partials
        finally:
            srv.close()
            await srv.wait_closed()

    partials = asyncio.run(scenario())
    assert len(partials) >= 4, partials
    stables = [p["stable"] for p in partials]
    # 你好 / 你好。/ 你好， normalize identically -> 1, 2, 3; the text change
    # to 你好世界 resets to 1, then climbs again
    assert stables[:3] == [1, 2, 3], stables
    assert 1 in stables[3:], stables


def test_realtime_ws_vad_worker_stop_semantics(tmp_path_factory):
    """Server-VAD sessions (round 5): VAD runs in a per-session worker task,
    so STOP must (a) finalize ALL remaining audio promptly even with VAD
    batches still queued, (b) never lose an in-flight endpoint final, and
    (c) leave no dangling worker. Uses a tiny random VAD (endpoints may or
    may not fire — both paths are valid; what is pinned is the STOP
    contract and message sanity)."""
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_auto_model import vad_dir as vad_fixture

    class FakeTPF:
        def mktemp(self, name):
            return tmp_path_factory.mktemp(name)

    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.bin.realtime_ws import RealtimeWSServer
    from funasr_tpu.serving.ws_protocol import connect, serve

    asr = _tiny_asr(tmp_path_factory)
    vad = AutoModel(model=vad_fixture.__wrapped__(FakeTPF()),
                    disable_pbar=True)
    server = RealtimeWSServer(asr, vad_model=vad, endpoint_mode="server",
                              chunk_ms=200, first_chunk_ms=200,
                              vad_feed_ms=120)
    port = _free_port()
    rng = np.random.default_rng(5)
    # loud bursts + silences so the VAD state machine has real transitions
    wav = rng.standard_normal(48000).astype(np.float32) * 3e-4
    for beg, end in [(0.25, 1.2), (1.9, 2.6)]:
        i, j = int(beg * 16000), int(end * 16000)
        wav[i:j] += 0.4 * np.sin(2 * np.pi * 300 *
                                 np.arange(j - i) / 16000)
    pcm = np.clip(wav * 32767, -32768, 32767).astype(np.int16)

    async def scenario():
        srv = await serve(server.handle, "127.0.0.1", port)
        try:
            ws = await connect("127.0.0.1", port)
            # flood frames unpaced so VAD batches queue behind the worker
            for i in range(0, len(pcm), 960):
                await ws.send(pcm[i:i + 960].tobytes())
            await ws.send("STOP")
            msgs = []
            try:
                while True:
                    msgs.append(json.loads(
                        await asyncio.wait_for(ws.recv(), 90)))
            except Exception:  # noqa: BLE001 — closed after STOP final
                pass
            await ws.close()
            return msgs
        finally:
            srv.close()
            await srv.wait_closed()

    msgs = asyncio.run(scenario())
    finals = [m for m in msgs if m.get("is_final")]
    # STOP always produces a final for the unfinalized tail (or, if an
    # endpoint already consumed everything, the last endpoint final stands)
    assert finals, msgs
    # finals carry contiguous utt indices from 0 and monotonic time ranges
    utts = [m["utt"] for m in finals]
    assert utts == sorted(utts) and utts[0] == 0
    for m in finals:
        assert m["end_ms"] >= m["start_ms"]
    # no half-finalized duplication: utt indices are unique
    assert len(set(utts)) == len(utts)
