#!/usr/bin/env bash
# ASRU-CS-2019 Mandarin-English code-switch recipe: combine AISHELL-style
# CN data + LibriSpeech EN data + the CS corpus, fine-tune from a WeNet
# pre-trained checkpoint with adapters.
# Parity: reference examples/asrucs2019/run.sh:31-115 — the combined
# manifest is the concatenation of per-corpus format.data files (the
# manifest format is line-oriented, so `cat` is the combine step), and
# --checkpoint + --only_adapter reproduce the partial-init + adapter
# fine-tuning flow (reference train.py:173-185).
set -euo pipefail

stage=1
stop_stage=4
exp_dir=exp/cs_conformer
script_dir="$(cd "$(dirname "$0")" && pwd)"
config=$script_dir/conf/train_conformer.yaml
pretrained=             # converted WeNet checkpoint dir (convert_wenet)
only_adapter=false
beam_size=10
ctc_weight=0.5
reverse_weight=0.3
average_num=5
repo_root="$(cd "$(dirname "$0")/../.." && pwd)"
export PYTHONPATH="$repo_root:${PYTHONPATH:-}"

. "$repo_root/tools/parse_options.sh" || exit 1

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "stage 1: combine manifests + dict"
  mkdir -p data/train_all data/dev_all
  cat data/train_cn/format.data data/train_en/format.data \
      data/train_cs/format.data > data/train_all/format.data
  cat data/dev_cs/format.data > data/dev_all/format.data
  cat data/train_cn/text data/train_en/text data/train_cs/text \
      > data/train_all/text
  python "$repo_root/tools/build_dict.py" data/train_all/text data/dict.txt
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  extra=()
  [ -n "$pretrained" ] && extra+=(--checkpoint "$pretrained")
  [ "$only_adapter" = true ] && extra+=(--only_adapter)
  python -m openeat_tpu.bin.train \
    --config "$config" \
    --train_data data/train_all/format.data \
    --cv_data data/dev_all/format.data \
    --dict data/dict.txt \
    --exp_dir "$exp_dir" "${extra[@]}"
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  python -m openeat_tpu.bin.average_model \
    --exp_dir "$exp_dir" --dst "avg_best${average_num}" \
    --num "$average_num" --val_best
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  python -m openeat_tpu.bin.recognize \
    --config "$exp_dir/train.yaml" \
    --checkpoint "$exp_dir/avg_best${average_num}" \
    --test_data data/test_cs/format.data \
    --dict data/dict.txt \
    --mode attention_rescoring --beam_size "$beam_size" \
    --ctc_weight "$ctc_weight" --reverse_weight "$reverse_weight" \
    --result_file "$exp_dir/hyp.txt"
  python "$repo_root/tools/compute_wer.py" data/test_cs/text \
    "$exp_dir/hyp.txt" | tail -1
fi
