#!/usr/bin/env bash
# AIShell-1 recipe: data prep -> dict -> format -> train -> average ->
# decode (4 modes) -> CER. Mirrors the reference recipe's stages
# (reference examples/aishell/run.sh:87-246) on the TPU framework: one
# process drives all chips (mesh data parallelism), and decode runs
# batched on-device instead of shell-level process spraying.
set -euo pipefail

stage=0
stop_stage=4
data=/export/data/aishell        # corpus root (wav/ + transcript/)
exp_dir=exp/conformer
script_dir="$(cd "$(dirname "$0")" && pwd)"
config=$script_dir/conf/train_conformer.yaml
beam_size=10
decode_dp=1            # shard decode batches over N devices (-1: all)
decode_batch_size=8
ctc_weight=0.5
reverse_weight=0.3
average_num=5
decode_modes="ctc_greedy_search ctc_prefix_beam_search attention attention_rescoring"
repo_root="$(cd "$(dirname "$0")/../.." && pwd)"
export PYTHONPATH="$repo_root:${PYTHONPATH:-}"

. "$repo_root/tools/parse_options.sh" || exit 1

if [ $stage -le -1 ] && [ $stop_stage -ge -1 ]; then
  echo "stage -1: corpus download is site-specific; expecting $data"
fi

if [ $stage -le 0 ] && [ $stop_stage -ge 0 ]; then
  echo "stage 0: data prep"
  python "$script_dir/local/aishell_data_prep.py" \
    "$data/wav" "$data/transcript/aishell_transcript_v0.8.txt" data
fi

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "stage 1: dict + manifests"
  python "$repo_root/tools/build_dict.py" data/train/text data/dict.txt
  for x in train dev test; do
    python "$repo_root/tools/format_data.py" data/$x
  done
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "stage 2: train"
  python -m openeat_tpu.bin.train \
    --config "$config" \
    --train_data data/train/format.data \
    --cv_data data/dev/format.data \
    --dict data/dict.txt \
    --exp_dir "$exp_dir"
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "stage 3: average best-$average_num"
  python -m openeat_tpu.bin.average_model \
    --exp_dir "$exp_dir" --dst "avg_best${average_num}" \
    --num "$average_num" --val_best
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  echo "stage 4: decode + CER"
  for mode in $decode_modes; do
    python -m openeat_tpu.bin.recognize \
      --config "$exp_dir/train.yaml" \
      --checkpoint "$exp_dir/avg_best${average_num}" \
      --test_data data/test/format.data \
      --dict data/dict.txt \
      --mode "$mode" \
      --beam_size "$beam_size" \
      --dp "$decode_dp" --batch_size "$decode_batch_size" \
      --ctc_weight "$ctc_weight" \
      --reverse_weight "$reverse_weight" \
      --result_file "$exp_dir/hyp_${mode}.txt"
    python "$repo_root/tools/compute_wer.py" data/test/text \
      "$exp_dir/hyp_${mode}.txt" > "$exp_dir/cer_${mode}.txt"
    tail -1 "$exp_dir/cer_${mode}.txt"
  done
fi
