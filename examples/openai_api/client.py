#!/usr/bin/env python3
"""Call the funasr_tpu OpenAI-compatible endpoint with the official openai
client (or raw HTTP if the package is absent). Reference counterpart:
``examples/openai_api/`` client demos."""

import io
import json
import sys
import urllib.request

BASE = "http://localhost:8000"
wav = sys.argv[1] if len(sys.argv) > 1 else "asr_example_zh.wav"

try:
    from openai import OpenAI
    client = OpenAI(base_url=f"{BASE}/v1", api_key="funasr-tpu")
    with open(wav, "rb") as f:
        tr = client.audio.transcriptions.create(
            model="funasr-tpu", file=f, response_format="verbose_json")
    print(tr)
except ImportError:
    boundary = "funasrtpuboundary"
    with open(wav, "rb") as f:
        audio = f.read()
    body = (
        f"--{boundary}\r\nContent-Disposition: form-data; name=\"file\"; "
        f"filename=\"{wav}\"\r\nContent-Type: audio/wav\r\n\r\n"
    ).encode() + audio + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        f"{BASE}/v1/audio/transcriptions", data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"})
    print(json.load(urllib.request.urlopen(req)))
