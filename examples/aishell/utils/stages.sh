# Shared AISHELL-1 recipe stages (sourced by each examples/aishell/<model>/run.sh).
#
# TPU-era counterpart of the reference's per-recipe run.sh staged pipeline
# (reference examples/aishell/paraformer/run.sh:1-140): data prep -> jsonl ->
# CMVN -> dictionary -> train -> inference+CER. The caller sets:
#   config       conf dir containing config.yaml (passed as ++model=)
#   feats_dir    data/feature workspace
#   exp_dir      experiment output root
#   cmvn_dim     CMVN stats dim (n_mels * lfr_m; 560 for the lfr7 recipes)
#   stage / stop_stage
#   train_args / infer_args   extra ++key=value overrides
#   sharding     dp|fsdp|tp|pp|sp (GSPMD mode; replaces torchrun/deepspeed)
# Optional: raw_data, train_set, valid_set, test_sets, tag, python.

set -e
set -u
set -o pipefail

python="${python:-python3}"
raw_data="${raw_data:-../raw_data}"
train_set="${train_set:-train}"
valid_set="${valid_set:-dev}"
test_sets="${test_sets:-dev test}"
tag="${tag:-exp1}"
sharding="${sharding:-dp}"
train_args="${train_args:-}"
infer_args="${infer_args:-}"

model_dir="baseline_$(basename "${config}")_zh_char_${tag}"
token_list="${feats_dir}/data/zh_token_list/char/tokens.txt"

if [ "${stage}" -le -1 ] && [ "${stop_stage}" -ge -1 ]; then
    echo "stage -1: Data Download"
    echo "AISHELL-1 is at https://www.openslr.org/33 (data_aishell.tgz +"
    echo "resource_aishell.tgz). Download and extract under ${raw_data}, then"
    echo "re-run from stage 0."
fi

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "stage 0: Data preparation"
    ${python} "${utils_dir}/../local/aishell_data_prep.py" \
        "${raw_data}/data_aishell/wav" \
        "${raw_data}/data_aishell/transcript/aishell_transcript_v0.8.txt" \
        "${feats_dir}"
    for x in ${train_set} ${valid_set} ${test_sets}; do
        ${python} -m funasr_tpu.bin.data_tools scp2jsonl \
            ++scp_file_list="[\"${feats_dir}/data/${x}/wav.scp\",\"${feats_dir}/data/${x}/text\"]" \
            ++data_type_list='["source","target"]' \
            ++jsonl_file_out="${feats_dir}/data/${x}/audio_datasets.jsonl"
    done
fi

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "stage 1: CMVN Generation"
    ${python} -m funasr_tpu.bin.data_tools compute_cmvn \
        ++jsonl="${feats_dir}/data/${train_set}/audio_datasets.jsonl" \
        ++out="${feats_dir}/data/${train_set}/am.mvn" \
        ++dim="${cmvn_dim}"
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
    echo "stage 2: Dictionary Preparation"
    mkdir -p "$(dirname "${token_list}")"
    ${python} - "${feats_dir}/data/${train_set}/text" "${token_list}" <<'PYEOF'
import sys
chars = set()
with open(sys.argv[1], encoding="utf-8") as f:
    for line in f:
        parts = line.strip().split(maxsplit=1)
        if len(parts) == 2:
            chars.update(parts[1].replace(" ", ""))
toks = ["<blank>", "<s>", "</s>"] + sorted(chars) + ["<unk>"]
with open(sys.argv[2], "w", encoding="utf-8") as f:
    f.write("\n".join(toks) + "\n")
print(f"dictionary: {len(toks)} tokens -> {sys.argv[2]}")
PYEOF
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
    echo "stage 3: LM Training (optional; see funasr_tpu/models/language_model)"
fi

if [ "${stage}" -le 4 ] && [ "${stop_stage}" -ge 4 ]; then
    echo "stage 4: ASR Training (GSPMD ++sharding=${sharding} over jax.devices())"
    mkdir -p "${exp_dir}/exp/${model_dir}"
    # shellcheck disable=SC2086
    ${python} -m funasr_tpu.bin.train \
        ++model="${config}" \
        ++train_data_set_list="${feats_dir}/data/${train_set}/audio_datasets.jsonl" \
        ++valid_data_set_list="${feats_dir}/data/${valid_set}/audio_datasets.jsonl" \
        ++tokenizer_conf.token_list="${token_list}" \
        ++frontend_conf.cmvn_file="${feats_dir}/data/${train_set}/am.mvn" \
        ++sharding="${sharding}" \
        ++output_dir="${exp_dir}/exp/${model_dir}" ${train_args} \
        2>&1 | tee "${exp_dir}/exp/${model_dir}/train.log.txt"
fi

if [ "${stage}" -le 5 ] && [ "${stop_stage}" -ge 5 ]; then
    echo "stage 5: Inference + CER"
    ckpt="${exp_dir}/exp/${model_dir}/model.pt.avg"
    if [ ! -f "${ckpt}" ] && [ -f "${exp_dir}/exp/${model_dir}/model.pt.latest" ]; then
        ckpt="${exp_dir}/exp/${model_dir}/$(cat "${exp_dir}/exp/${model_dir}/model.pt.latest")"
    fi
    [ -f "${ckpt}" ] || { echo "no checkpoint found under ${exp_dir}/exp/${model_dir}" >&2; exit 1; }
    for x in ${test_sets}; do
        # shellcheck disable=SC2086
        ${python} -m funasr_tpu.bin.benchmark ++mode=cer \
            ++model="${config}" \
            ++init_param="${ckpt}" \
            ++tokenizer_conf.token_list="${token_list}" \
            ++frontend_conf.cmvn_file="${feats_dir}/data/${train_set}/am.mvn" \
            ++wav_scp="${feats_dir}/data/${x}/wav.scp" \
            ++text="${feats_dir}/data/${x}/text" ${infer_args} \
            | tee "${exp_dir}/exp/${model_dir}/cer.${x}.json"
    done
fi
