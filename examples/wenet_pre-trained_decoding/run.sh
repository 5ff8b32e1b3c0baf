#!/usr/bin/env bash
# Decode-only recipe using WeNet released checkpoints (u2pp conformer,
# wenetspeech/gigaspeech): convert the torch .pt -> framework checkpoint,
# then decode with the released train_aed.yaml + words.txt.
# Parity: reference examples/wenet_pre-trained_decoding/run.sh:28-97.
set -euo pipefail

stage=0
stop_stage=2
model_dir=./20220506_u2pp_conformer_exp   # unpacked WeNet release
test_data=data/test/format.data
test_text=data/test/text
exp_dir=exp/wenet_decode
mode=attention_rescoring
beam_size=10
ctc_weight=0.5
reverse_weight=0.3
d_model=256
repo_root="$(cd "$(dirname "$0")/../.." && pwd)"
export PYTHONPATH="$repo_root:${PYTHONPATH:-}"

. "$repo_root/tools/parse_options.sh" || exit 1

if [ $stage -le 0 ] && [ $stop_stage -ge 0 ]; then
  echo "stage 0: convert $model_dir/final.pt"
  # --wenet_config adapts the released train_aed.yaml (encoder_conf/
  # decoder_conf layout) into a framework train.yaml written next to
  # the converted checkpoint, so the released architecture is built
  wenet_yaml=$(ls "$model_dir"/train*.yaml | head -1)
  python -m openeat_tpu.bin.convert_wenet \
    --pt "$model_dir/final.pt" --d_model "$d_model" \
    --out "$exp_dir/converted" --wenet_config "$wenet_yaml"
fi

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "stage 1: decode"
  python -m openeat_tpu.bin.recognize \
    --config "$exp_dir/train.yaml" \
    --checkpoint "$exp_dir/converted" \
    --test_data "$test_data" \
    --dict "$model_dir/words.txt" \
    --mode "$mode" --beam_size "$beam_size" \
    --ctc_weight "$ctc_weight" --reverse_weight "$reverse_weight" \
    --result_file "$exp_dir/hyp_${mode}.txt"
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  python "$repo_root/tools/compute_wer.py" "$test_text" \
    "$exp_dir/hyp_${mode}.txt" | tail -1
fi
