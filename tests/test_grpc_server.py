"""Interop test for the native gRPC ASR service (bin/grpc-server.cc).

The server hand-rolls HTTP/2 + HPACK + proto3 wire encoding (no grpc++ in the
build image), so this test deliberately drives it with the REAL grpc-python
client: the client's HPACK encoder, SETTINGS/flow-control machinery and
length-prefixed message framing exercise the server's h2c implementation end
to end. Service shape mirrors the reference
runtime/python/grpc/proto/paraformer.proto (`paraformer.ASR/Recognize`,
bidi streaming) and runtime/grpc/paraformer-server.cc semantics.
"""

import shutil
import socket
import struct
import subprocess
import time

import numpy as np
import pytest

grpc = pytest.importorskip("grpc")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    shutil.which("cmake") is None or shutil.which("g++") is None,
    reason="no C++ toolchain")]

from test_cpp_runtime import built  # noqa: F401  (module-scoped cmake build)


# --- hand-rolled paraformer.proto wire helpers (proto3 varint encoding) ----

def _varint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def encode_request(mode: int, audio: bytes, is_final: bool,
                   sampling_rate: int = 16000) -> bytes:
    msg = b"\x08" + _varint(mode)              # field 1: mode
    msg += b"\x18" + _varint(sampling_rate)    # field 3: sampling_rate
    msg += b"\x28" + (b"\x01" if is_final else b"\x00")  # field 5: is_final
    if audio:
        msg += b"\x32" + _varint(len(audio)) + audio     # field 6: audio_data
    return msg


def decode_response(buf: bytes) -> dict:
    out = {"mode": 0, "text": "", "is_final": False}
    pos = 0
    while pos < len(buf):
        tag = buf[pos]
        pos += 1
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, shift = 0, 0
            while True:
                b = buf[pos]
                pos += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            if field == 1:
                out["mode"] = v
            elif field == 3:
                out["is_final"] = bool(v)
        elif wire == 2:
            ln, shift = 0, 0
            while True:
                b = buf[pos]
                pos += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            if field == 2:
                out["text"] = buf[pos:pos + ln].decode("utf-8")
            pos += ln
        else:
            raise AssertionError(f"unexpected wire type {wire}")
    return out


@pytest.fixture(scope="module")
def grpc_server(built, tmp_path_factory):  # noqa: F811
    """Export a tiny Paraformer (+streaming caches) and launch the server."""
    import jax

    from funasr_tpu import tables
    from funasr_tpu.export_runtime import export_ftr

    model_dir = tmp_path_factory.mktemp("grpcmodel")
    tokens = ["<blank>", "<s>", "</s>"] + \
        [chr(ord("一") + i) for i in range(37)] + ["<unk>"]
    asr = tables.model_classes["Paraformer"](
        input_size=560, vocab_size=41,
        encoder_conf=dict(output_size=32, attention_heads=4, linear_units=64,
                          num_blocks=2),
        decoder_conf=dict(attention_heads=4, linear_units=64, num_blocks=2,
                          att_layer_num=2, sanm_shfit=0),
        predictor_conf=dict(idim=32), sos=1, eos=2, predictor_bias=1)
    export_ftr(asr, asr.init_params(jax.random.PRNGKey(0)),
               str(model_dir / "weights.ftr"),
               extra_meta={"lfr_m": 7, "lfr_n": 6, "n_mels": 80})
    (model_dir / "tokens.txt").write_text("\n".join(tokens) + "\n")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [str(built / "funasr-tpu-grpc-server"), str(model_dir), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    deadline = time.time() + 10
    while time.time() < deadline:
        try:
            socket.create_connection(("127.0.0.1", port), 0.2).close()
            break
        except OSError:
            time.sleep(0.1)
    yield port
    proc.terminate()
    proc.wait(timeout=10)


def _recognize(port, requests):
    channel = grpc.insecure_channel(f"127.0.0.1:{port}")
    stub = channel.stream_stream(
        "/paraformer.ASR/Recognize",
        request_serializer=lambda b: b,
        response_deserializer=lambda b: b)
    responses = [decode_response(r) for r in stub(iter(requests), timeout=60)]
    channel.close()
    return responses


def _pcm(seconds=1.0, seed=0):
    rng = np.random.default_rng(seed)
    x = np.clip(rng.standard_normal(int(16000 * seconds)) * 0.2, -1, 1)
    return (x * 32767).astype("<i2").tobytes()


def test_grpc_offline_roundtrip(grpc_server):
    pcm = _pcm(1.0)
    reqs = [encode_request(0, pcm[:16000], False),
            encode_request(0, pcm[16000:], True)]
    resp = _recognize(grpc_server, reqs)
    assert len(resp) == 1
    assert resp[0]["mode"] == 0 and resp[0]["is_final"]
    assert isinstance(resp[0]["text"], str) and resp[0]["text"] != ""


def test_grpc_two_pass_stream(grpc_server):
    pcm = _pcm(2.0, seed=1)
    step = 19200  # 600 ms of int16 PCM — the reference server's step size
    reqs = [encode_request(2, pcm[o:o + step], False)
            for o in range(0, len(pcm), step)]
    reqs.append(encode_request(2, b"", True))
    resp = _recognize(grpc_server, reqs)
    finals = [r for r in resp if r["is_final"]]
    assert finals and finals[-1]["mode"] == 2  # two_pass final present
    assert finals[-1]["text"] != ""
    # online partials (mode=1) precede the two_pass final when the streaming
    # engine emits tokens; every non-final message must be mode online
    for r in resp[:-1]:
        if not r["is_final"]:
            assert r["mode"] == 1


def test_grpc_online_mode(grpc_server):
    pcm = _pcm(1.5, seed=2)
    step = 19200
    reqs = [encode_request(1, pcm[o:o + step], False)
            for o in range(0, len(pcm), step)]
    reqs.append(encode_request(1, b"", True))
    resp = _recognize(grpc_server, reqs)
    assert resp, "online mode must emit at least the final flush"
    assert resp[-1]["is_final"] and resp[-1]["mode"] == 1
    # concatenated partials form the utterance text (reference client contract)
    assert all(r["mode"] == 1 for r in resp)


def test_grpc_sequential_rpcs_share_connection(grpc_server):
    """Two RPCs on one channel: HTTP/2 stream ids advance, state is per-RPC."""
    channel = grpc.insecure_channel(f"127.0.0.1:{grpc_server}")
    stub = channel.stream_stream(
        "/paraformer.ASR/Recognize",
        request_serializer=lambda b: b,
        response_deserializer=lambda b: b)
    for seed in (3, 4):
        reqs = [encode_request(0, _pcm(0.8, seed=seed), True)]
        resp = [decode_response(r) for r in stub(iter(reqs), timeout=60)]
        assert len(resp) == 1 and resp[0]["is_final"]
    channel.close()


def test_grpc_python_client_sdk(grpc_server):
    """The bundled python client (runtime/clients/python) round-trips against
    the native server: partial callback fires for online mode, transcribe()
    returns the two_pass final."""
    import sys
    sys.path.insert(0, str(
        __import__("pathlib").Path(__file__).resolve().parents[1]
        / "runtime" / "clients" / "python"))
    try:
        from funasr_tpu_grpc_client import GrpcAsrClient
    finally:
        sys.path.pop(0)

    client = GrpcAsrClient("127.0.0.1", grpc_server)
    partials = []
    text = client.transcribe(_pcm(1.5, seed=5), mode="2pass",
                             on_partial=lambda t, f: partials.append(t))
    assert isinstance(text, str) and text != ""
    # offline mode too
    assert client.transcribe(_pcm(0.8, seed=6), mode="offline") != ""


def test_grpc_concurrent_rpcs_one_connection(grpc_server):
    """Two RPCs multiplexed concurrently on ONE HTTP/2 connection: the server
    keeps per-stream state keyed by stream id, so interleaved DATA frames from
    both streams decode independently."""
    from concurrent.futures import ThreadPoolExecutor

    channel = grpc.insecure_channel(f"127.0.0.1:{grpc_server}")
    stub = channel.stream_stream(
        "/paraformer.ASR/Recognize",
        request_serializer=lambda b: b,
        response_deserializer=lambda b: b)

    def run(seed):
        pcm = _pcm(0.8, seed=seed)
        reqs = [encode_request(0, pcm[:8000], False),
                encode_request(0, pcm[8000:], True)]
        return [decode_response(r) for r in stub(iter(reqs), timeout=120)]

    with ThreadPoolExecutor(2) as ex:
        a, b = ex.map(run, (7, 8))
    assert len(a) == 1 and a[0]["is_final"] and a[0]["text"] != ""
    assert len(b) == 1 and b[0]["is_final"] and b[0]["text"] != ""
    channel.close()
