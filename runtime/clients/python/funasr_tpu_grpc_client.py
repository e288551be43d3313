"""gRPC client for the native funasr-tpu-grpc-server.

Counterpart of the reference python gRPC client (FunASR
runtime/python/grpc/grpc_main_client.py + proto/paraformer.proto): drives the
`paraformer.ASR/Recognize` bidirectional-streaming RPC in offline, online or
two_pass mode. No generated stubs needed — the two proto3 messages are tiny,
so they are encoded/decoded by hand and sent through grpcio's generic
`stream_stream` multi-callable (any stock stub generated from the reference
proto works against the same server unchanged).

Usage:
    python funasr_tpu_client.py --grpc --host 127.0.0.1 --port 10095 a.wav
or as a library:
    from funasr_tpu_grpc_client import GrpcAsrClient
    text = GrpcAsrClient("127.0.0.1", 10095).transcribe(pcm_bytes)
"""

from __future__ import annotations

import argparse
import wave
from typing import Iterator, List, Optional

import grpc

MODE_OFFLINE, MODE_ONLINE, MODE_TWO_PASS = 0, 1, 2
_MODES = {"offline": MODE_OFFLINE, "online": MODE_ONLINE,
          "2pass": MODE_TWO_PASS, "two_pass": MODE_TWO_PASS}


def _varint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def encode_request(mode: int, audio: bytes, is_final: bool,
                   sampling_rate: int = 16000) -> bytes:
    msg = b"\x08" + _varint(mode)
    msg += b"\x18" + _varint(sampling_rate)
    msg += b"\x28" + (b"\x01" if is_final else b"\x00")
    if audio:
        msg += b"\x32" + _varint(len(audio)) + audio
    return msg


def decode_response(buf: bytes) -> dict:
    out = {"mode": 0, "text": "", "is_final": False}
    pos = 0

    def varint() -> int:
        nonlocal pos
        v = shift = 0
        while True:
            b = buf[pos]
            pos += 1
            v |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                return v

    while pos < len(buf):
        tag = varint()
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v = varint()
            if field == 1:
                out["mode"] = v
            elif field == 3:
                out["is_final"] = bool(v)
        elif wire == 2:
            ln = varint()
            if field == 2:
                out["text"] = buf[pos:pos + ln].decode("utf-8")
            pos += ln
        elif wire == 5:
            pos += 4
        elif wire == 1:
            pos += 8
    return out


class GrpcAsrClient:
    """Blocking client over the paraformer.ASR/Recognize bidi stream."""

    def __init__(self, host: str = "127.0.0.1", port: int = 10095,
                 sampling_rate: int = 16000):
        self.target = f"{host}:{port}"
        self.sampling_rate = sampling_rate

    def recognize(self, pcm: bytes, mode: str = "2pass",
                  chunk_ms: int = 600,
                  on_partial=None, timeout: float = 120.0) -> List[dict]:
        """Stream PCM16 audio; returns every Response dict. `on_partial` is
        called with each online-mode partial text as it arrives (the reference
        client prints these live)."""
        m = _MODES[mode]
        step = int(self.sampling_rate * chunk_ms / 1000) * 2

        def requests() -> Iterator[bytes]:
            for off in range(0, len(pcm), step):
                yield encode_request(m, pcm[off:off + step], False,
                                     self.sampling_rate)
            yield encode_request(m, b"", True, self.sampling_rate)

        channel = grpc.insecure_channel(self.target)
        try:
            stub = channel.stream_stream(
                "/paraformer.ASR/Recognize",
                request_serializer=lambda b: b,
                response_deserializer=lambda b: b)
            responses = []
            for raw in stub(requests(), timeout=timeout):
                r = decode_response(raw)
                responses.append(r)
                if on_partial is not None and r["mode"] == MODE_ONLINE:
                    on_partial(r["text"], r["is_final"])
            return responses
        finally:
            channel.close()

    def transcribe(self, pcm: bytes, mode: str = "2pass", **kw) -> str:
        """Final utterance text: the offline/two_pass final, or the
        concatenated online partials in pure online mode."""
        responses = self.recognize(pcm, mode=mode, **kw)
        want = MODE_ONLINE if mode == "online" else _MODES[mode]
        finals = [r["text"] for r in responses
                  if r["is_final"] and r["mode"] == want]
        if mode == "online":
            return "".join(r["text"] for r in responses
                           if r["mode"] == MODE_ONLINE)
        return finals[-1] if finals else ""


def _read_wav(path: str) -> tuple:
    with wave.open(path, "rb") as w:
        assert w.getsampwidth() == 2, "PCM16 wav expected"
        return w.readframes(w.getnframes()), w.getframerate()


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("wav", nargs="+", help="PCM16 wav files")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=10095)
    ap.add_argument("--mode", default="2pass",
                    choices=["offline", "online", "2pass"])
    ap.add_argument("--chunk-ms", type=int, default=600)
    args = ap.parse_args(argv)
    for path in args.wav:
        pcm, rate = _read_wav(path)
        client = GrpcAsrClient(args.host, args.port, sampling_rate=rate)
        text = client.transcribe(
            pcm, mode=args.mode, chunk_ms=args.chunk_ms,
            on_partial=lambda t, f: print(f"[partial] {t}", flush=True))
        print(f"{path}: {text}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
