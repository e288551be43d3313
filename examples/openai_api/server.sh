#!/usr/bin/env bash
# Start the OpenAI-compatible transcription server (funasr_tpu counterpart of
# the reference examples/openai_api/: POST /v1/audio/transcriptions).
set -euo pipefail
model="${1:-paraformer-zh}"
port="${PORT:-8000}"
exec python -m funasr_tpu.bin.server ++model="$model" ++port="$port" \
    ++vad_model=fsmn-vad ++punc_model=ct-punc-c
