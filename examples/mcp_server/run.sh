#!/usr/bin/env bash
# Start the funasr_tpu MCP server (reference counterpart:
# examples/mcp_server/ — exposes transcription as an MCP tool over stdio).
exec python -m funasr_tpu.bin.mcp_server ++model="${1:-paraformer-zh}"
