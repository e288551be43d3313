#!/usr/bin/env bash
# Finetune transducer (funasr_tpu counterpart of the reference
# examples/industrial_data_pretraining/transducer/finetune.sh).
# GSPMD sharding over jax.devices() replaces torchrun/DeepSpeed: pick the
# parallelism with ++sharding=dp|fsdp|tp|pp|sp (see docs/training.md).
set -euo pipefail
workspace=$(cd "$(dirname "$0")" && pwd)

model_name_or_model_dir="${1:-iic/speech_bat_asr-zh-cn-16k-aishell1-vocab4234-pytorch}"
data_dir="${data_dir:-${workspace}/../../../data/list}"
output_dir="${output_dir:-./outputs}"
sharding="${sharding:-fsdp}"

mkdir -p "${output_dir}"

# build train/val jsonl from wav.scp + text.txt pairs
python -m funasr_tpu.bin.data_tools scp2jsonl \
    ++scp_file_list="[\"${data_dir}/train_wav.scp\",\"${data_dir}/train_text.txt\"]" \
    ++data_type_list='["source","target"]' \
    ++jsonl_file_out="${data_dir}/train.jsonl"
python -m funasr_tpu.bin.data_tools scp2jsonl \
    ++scp_file_list="[\"${data_dir}/val_wav.scp\",\"${data_dir}/val_text.txt\"]" \
    ++data_type_list='["source","target"]' \
    ++jsonl_file_out="${data_dir}/val.jsonl"

python -m funasr_tpu.bin.train \
    ++model="${model_name_or_model_dir}" \
    ++train_data_set_list="${data_dir}/train.jsonl" \
    ++valid_data_set_list="${data_dir}/val.jsonl" \
    ++sharding="${sharding}" \
    ++dataset_conf.batch_size=6000 \
    ++dataset_conf.batch_type=token \
    ++train_conf.max_epoch=50 \
    ++train_conf.keep_nbest_models=10 \
    ++train_conf.avg_nbest_model=5 \
    ++optim_conf.lr=0.0002 \
    ++output_dir="${output_dir}" \
    2>&1 | tee "${output_dir}/log.txt"
