#!/usr/bin/env bash
# AISHELL-1 transformer recipe (funasr_tpu rebuild of the reference
# examples/aishell/transformer/run.sh): staged data prep -> jsonl -> CMVN ->
# dictionary -> GSPMD training -> inference+CER. Single-program SPMD sharding
# (++sharding=dp|fsdp|tp|pp|sp) over jax.devices() replaces torchrun/NCCL.
#
# Usage: bash run.sh [stage=N] [stop_stage=N] [raw_data=DIR] [sharding=MODE]
cd "$(dirname "$0")"

# parse key=value args (the reference's utils/parse_options.sh role)
for arg in "$@"; do
    case "$arg" in (*=*) eval "${arg%%=*}='${arg#*=}'";; esac
done

utils_dir="$(cd ../utils && pwd)"
feats_dir="${feats_dir:-../DATA}"
exp_dir="${exp_dir:-$(pwd)}"
config="${config:-$(pwd)/conf/transformer_12e_6d_2048_256}"
cmvn_dim="${cmvn_dim:-80}"
stage="${stage:-0}"
stop_stage="${stop_stage:-5}"

. "${utils_dir}/stages.sh"
