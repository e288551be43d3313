#!/usr/bin/env bash
# WenetSpeech conformer recipe (funasr_tpu rebuild of the reference
# examples/wenetspeech/conformer/run.sh): jsonl from the official
# wav.scp/text manifests -> CMVN -> dictionary -> GSPMD training -> CER.
# WenetSpeech ships pre-cut manifests per subset (S/M/L + dev/test_net/
# test_meeting), so stage 0 here converts manifests instead of walking a
# corpus tree like the AISHELL recipe.
#
# Usage: bash run.sh [stage=N] [stop_stage=N] [manifest_dir=DIR]
#        [train_set=train_s] [sharding=MODE]
# manifest_dir must hold <split>/wav.scp + <split>/text for each split.
cd "$(dirname "$0")"

for arg in "$@"; do
    case "$arg" in (*=*) eval "${arg%%=*}='${arg#*=}'";; esac
done

utils_dir="$(cd ../../aishell/utils && pwd)"
feats_dir="${feats_dir:-../DATA}"
exp_dir="${exp_dir:-$(pwd)}"
config="${config:-$(cd ../../aishell/conformer/conf && pwd)/conformer_12e_6d_2048_256}"
cmvn_dim="${cmvn_dim:-80}"
stage="${stage:-0}"
stop_stage="${stop_stage:-5}"
manifest_dir="${manifest_dir:-../manifests}"
train_set="${train_set:-train_s}"
valid_set="${valid_set:-dev}"
test_sets="${test_sets:-dev test_net test_meeting}"

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "stage 0: manifests -> jsonl"
    for x in ${train_set} ${valid_set} ${test_sets}; do
        mkdir -p "${feats_dir}/data/${x}"
        cp "${manifest_dir}/${x}/wav.scp" "${manifest_dir}/${x}/text" \
            "${feats_dir}/data/${x}/"
        python3 -m funasr_tpu.bin.data_tools scp2jsonl \
            ++scp_file_list="[\"${feats_dir}/data/${x}/wav.scp\",\"${feats_dir}/data/${x}/text\"]" \
            ++data_type_list='["source","target"]' \
            ++jsonl_file_out="${feats_dir}/data/${x}/audio_datasets.jsonl"
    done
fi

# stages.sh runs 1..5 (CMVN, dict, LM, train, CER); stage 0 was handled above
stage=$(( stage > 1 ? stage : 1 ))
. "${utils_dir}/stages.sh"
