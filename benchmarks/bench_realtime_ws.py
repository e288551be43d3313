"""Realtime WS SERVICE metrics — the reference's serving-side contract.

Chunk-level p50 is not a service latency number: it omits VAD endpointing,
punctuation, websocket overhead, and concurrency. This harness runs the
repo's own realtime server (funasr_tpu/bin/realtime_ws.py) in-process with
the PRODUCTION stack — Paraformer-large ASR + FSMN streaming VAD +
CT-Transformer punctuation, random-init weights on the real chip — drives N
paced concurrent clients with synthetic tone-burst speech, and reports the
metrics the reference defines
(``/root/reference/docs/benchmark/realtime_ws_benchmark.md:60-70``):

- ``aggregate_audio_per_wall``: total input audio seconds / benchmark wall
- ``first_update_ms_p50/p95``: first audio frame -> first result message
- ``final_after_stop_ms_p50/p95``: STOP sent -> final result received
- ``partial_messages`` / ``final_messages`` / ``errors``

Run (on the TPU host):  python benchmarks/bench_realtime_ws.py [n_clients]
"""

from __future__ import annotations

import asyncio
import json
import os
import socket
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SECONDS = 20.0
FRAME_MS = 60
FS = 16000


def build_server():
    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.bin.realtime_ws import RealtimeWSServer

    token_list = (["<blank>", "<s>", "</s>"]
                  + [chr(0x4E00 + i) for i in range(8400)] + ["<unk>"])
    punc_tokens = ["<unk>"] + [chr(0x4E00 + i) for i in range(8400)]
    asr = AutoModel(
        model="Paraformer", model_conf={},
        input_size=560, vocab_size=8404,
        encoder_conf=dict(output_size=512, attention_heads=4,
                          linear_units=2048, num_blocks=50, kernel_size=11,
                          sanm_shfit=0, dropout_rate=0.0),
        decoder_conf=dict(attention_heads=16, linear_units=2048,
                          num_blocks=16, att_layer_num=16, kernel_size=11,
                          sanm_shfit=0),
        predictor_conf=dict(idim=512, l_order=1, r_order=1,
                            tail_threshold=0.45),
        sos=1, eos=2, predictor_bias=1,
        frontend="WavFrontend",
        frontend_conf=dict(fs=FS, n_mels=80, lfr_m=7, lfr_n=6,
                           cmvn_file=None, dither=0.0),
        tokenizer="CharTokenizer",
        tokenizer_conf=dict(token_list=token_list),
        bf16=True, disable_pbar=True,
        punc_model="CTTransformer",
        punc_kwargs=dict(
            model_conf=dict(punc_list=["<unk>", "_", "，", "。", "？", "、"],
                            embed_unit=256, att_unit=256, sentence_end_id=3),
            encoder="SANMEncoder",
            encoder_conf=dict(input_size=256, output_size=256,
                              attention_heads=8, linear_units=1024,
                              num_blocks=4, input_layer="pe", kernel_size=11,
                              sanm_shfit=0),
            vocab_size=len(punc_tokens),
            tokenizer="CharTokenizer",
            tokenizer_conf=dict(token_list=punc_tokens)))
    vad = AutoModel(
        model="FsmnVADStreaming",
        model_conf=dict(max_end_silence_time=800, speech_noise_thres=0.6,
                        sil_pdf_ids=[0]),
        encoder="FSMN",
        encoder_conf=dict(input_dim=400, input_affine_dim=140, fsmn_layers=4,
                          linear_dim=250, proj_dim=128, lorder=20, rorder=0,
                          lstride=1, rstride=1, output_affine_dim=140,
                          output_dim=248),
        frontend="WavFrontendOnline",
        frontend_conf=dict(fs=FS, n_mels=80, lfr_m=5, lfr_n=1,
                           cmvn_file=None, dither=0.0),
        disable_pbar=True)
    return RealtimeWSServer(asr, vad_model=vad, endpoint_mode="server")


def synth_speech(seconds: float, seed: int) -> np.ndarray:
    """Tone bursts over a noise floor — VAD-activating turn-taking speech."""
    rng = np.random.default_rng(seed)
    n = int(seconds * FS)
    wav = rng.standard_normal(n).astype(np.float32) * 3e-4
    t0 = 0.4 + 0.2 * (seed % 3)
    while t0 + 1.0 < seconds:
        i, j = int(t0 * FS), int(min(t0 + 2.2, seconds - 0.2) * FS)
        t = np.arange(j - i) / FS
        f = 180 + 60 * (seed % 4)
        wav[i:j] += (0.3 * np.sin(2 * np.pi * f * t)
                     * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
        t0 += 2.2 + 1.2  # ~1.2 s inter-utterance silence triggers endpoints
    return np.clip(wav, -1, 1)


async def run_client(port: int, cid: int, pace: bool = True) -> dict:
    from funasr_tpu.serving.ws_protocol import connect

    wav = synth_speech(SECONDS, cid)
    pcm = (wav * 32767).astype(np.int16)
    frame = FS * FRAME_MS // 1000
    ws = await connect("127.0.0.1", port)
    out = {"first_update_ms": None, "final_after_stop_ms": None,
           "partials": 0, "finals": 0, "errors": 0}
    msgs: list = []

    async def reader():
        try:
            while True:
                m = json.loads(await ws.recv())
                msgs.append((time.perf_counter(), m))
        except Exception:  # noqa: BLE001 — connection closed ends the reader
            pass

    task = asyncio.create_task(reader())
    t_start = time.perf_counter()
    for i in range(0, len(pcm), frame):
        await ws.send(pcm[i: i + frame].tobytes())
        if pace:
            # absolute-deadline pacing: a fixed post-send sleep accumulates
            # event-loop drift under concurrent decodes and understates
            # aggregate_audio_per_wall
            target = t_start + (i + frame) / FS
            delay = target - time.perf_counter()
            if delay > 0:
                await asyncio.sleep(delay)
    t_stop = time.perf_counter()
    await ws.send("STOP")
    # wait for the final message after STOP
    deadline = time.perf_counter() + 120
    t_final = None
    while time.perf_counter() < deadline:
        fin = [(ts, m) for ts, m in msgs
               if m.get("is_final") and ts >= t_stop]
        if fin:
            t_final = fin[-1][0]
            break
        await asyncio.sleep(0.02)
    await ws.close()
    task.cancel()

    for ts, m in msgs:
        if m.get("type") in ("partial", "final") or m.get("text") \
                or m.get("sentences") or m.get("is_final"):
            out["first_update_ms"] = (ts - t_start) * 1000
            break
    out["partials"] = sum(1 for _, m in msgs if m.get("type") == "partial")
    out["finals"] = sum(1 for _, m in msgs if m.get("is_final"))
    if t_final is not None:
        out["final_after_stop_ms"] = (t_final - t_stop) * 1000
    else:
        out["errors"] += 1
    return out


def pct(vals, q):
    vals = sorted(v for v in vals if v is not None)
    if not vals:
        return None
    return round(vals[min(int(len(vals) * q), len(vals) - 1)], 1)


def main():
    n_clients = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from funasr_tpu.serving.ws_protocol import serve

    server = build_server()
    server.vad_feed_samples = FS * 240 // 1000  # tunneled chip: batch VAD dispatches
    port = _free_port()

    # compile the decode buckets BEFORE serving (B=1 hits frame buckets 128
    # and 256 only; a 50-block compile takes minutes on the tunneled chip and
    # must not land inside a client's latency window)
    t0 = time.perf_counter()
    for secs in (2.0, 15.0):
        server.asr.generate(
            input=np.zeros(int(secs * FS), np.float32))
    print(f"# prewarm (2 buckets + punc): {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    async def scenario():
        srv = await serve(server.handle, "127.0.0.1", port)
        try:
            # warm run exercises the full WS path once (VAD + partial cadence)
            warm = await run_client(port, 999, pace=False)
            assert warm["finals"] >= 1 or warm["partials"] >= 1, warm
            t0 = time.perf_counter()
            outs = await asyncio.gather(
                *(run_client(port, i) for i in range(n_clients)))
            wall = time.perf_counter() - t0
            return outs, wall
        finally:
            srv.close()
            await srv.wait_closed()

    outs, wall = asyncio.run(scenario())
    fu = [o["first_update_ms"] for o in outs]
    fa = [o["final_after_stop_ms"] for o in outs]
    report = {
        "metric": "realtime_ws_service",
        "n_clients": n_clients, "audio_s_per_client": SECONDS,
        "aggregate_audio_per_wall": round(n_clients * SECONDS / wall, 2),
        "first_update_ms_p50": pct(fu, 0.5),
        "first_update_ms_p95": pct(fu, 0.95),
        "final_after_stop_ms_p50": pct(fa, 0.5),
        "final_after_stop_ms_p95": pct(fa, 0.95),
        "partial_messages": sum(o["partials"] for o in outs),
        "final_messages": sum(o["finals"] for o in outs),
        "errors": sum(o["errors"] for o in outs),
    }
    print(json.dumps(report))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


if __name__ == "__main__":
    main()
