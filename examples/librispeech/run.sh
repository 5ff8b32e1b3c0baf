#!/usr/bin/env bash
# LibriSpeech recipe. Raw-corpus FLAC is ingested DIRECTLY (first-party
# decoder, openeat_tpu/dataset/flac.py + native/openeat_io.cc) — no
# flac->wav conversion step. Point wav.scp at the distributed .flac
# files (local/prepare_data.py writes it from an extracted corpus dir);
# from kaldi-style data dirs onward this mirrors the reference
# (examples/librispeech/run.sh:79-204) with BPE-1000 units; the WER
# stage re-joins BPE pieces automatically (token_ids_to_text replaces
# the sed '▁'->space step).
set -euo pipefail

stage=1
stop_stage=4
exp_dir=exp/conformer
script_dir="$(cd "$(dirname "$0")" && pwd)"
config=$script_dir/conf/train_conformer.yaml
bpe_size=1000
beam_size=10
decode_dp=1            # shard decode batches over N devices (-1: all)
decode_batch_size=8
ctc_weight=0.5
reverse_weight=0.3
average_num=5
train_set=train_960
dev_set=dev
test_sets="test_clean test_other"
decode_modes="ctc_greedy_search attention_rescoring"
repo_root="$(cd "$(dirname "$0")/../.." && pwd)"
export PYTHONPATH="$repo_root:${PYTHONPATH:-}"

. "$repo_root/tools/parse_options.sh" || exit 1

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "stage 1: BPE + dict + manifests"
  python -m openeat_tpu.bin.train_bpe \
    --input data/$train_set/text --skip_ncols 1 \
    --model_prefix data/bpe_$bpe_size --vocab_size $bpe_size
  python "$repo_root/tools/build_dict.py" data/$train_set/text \
    data/dict.txt --bpe_model data/bpe_$bpe_size.bpe.json
  for x in $train_set $dev_set $test_sets; do
    python "$repo_root/tools/format_data.py" data/$x
  done
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  python -m openeat_tpu.bin.train \
    --config "$config" \
    --train_data data/$train_set/format.data \
    --cv_data data/$dev_set/format.data \
    --dict data/dict.txt \
    --bpe_model data/bpe_$bpe_size.bpe.json \
    --exp_dir "$exp_dir"
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  python -m openeat_tpu.bin.average_model \
    --exp_dir "$exp_dir" --dst "avg_best${average_num}" \
    --num "$average_num" --val_best
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  for tset in $test_sets; do
    for mode in $decode_modes; do
      python -m openeat_tpu.bin.recognize \
        --config "$exp_dir/train.yaml" \
        --checkpoint "$exp_dir/avg_best${average_num}" \
        --test_data data/$tset/format.data \
        --dict data/dict.txt \
        --bpe_model data/bpe_$bpe_size.bpe.json \
        --mode "$mode" --beam_size "$beam_size" \
        --dp "$decode_dp" --batch_size "$decode_batch_size" \
        --ctc_weight "$ctc_weight" --reverse_weight "$reverse_weight" \
        --result_file "$exp_dir/${tset}_hyp_${mode}.txt"
      python "$repo_root/tools/compute_wer.py" --word data/$tset/text \
        "$exp_dir/${tset}_hyp_${mode}.txt" \
        > "$exp_dir/${tset}_wer_${mode}.txt"
      tail -1 "$exp_dir/${tset}_wer_${mode}.txt"
    done
  done
fi
