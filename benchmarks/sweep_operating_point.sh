#!/usr/bin/env bash
# Decode operating-point sweep on the DEV set of a trained recipe work
# dir (tune on dev, report on test — the methodology behind the
# r3_recipe_hard results): attention_rescoring CER as a function of
# --ctc_weight, plus n-gram LM-fusion weight probes. The reference
# exposes the same knobs (reference openeat/bin/recognize.py args) but
# ships no tuning driver; this scripts the loop the reference README's
# tables imply.
#
# Usage: PYTHONPATH=/root/repo:/root/.axon_site \
#        bash benchmarks/sweep_operating_point.sh [work] [out_dir]
# `work` must hold a completed run_recipe_tpu.sh layout (exp/train.yaml,
# exp/avg_best3, data/dev). One TPU client at a time — never run this
# concurrently with bench.py or another drive.
set -uo pipefail

work=${1:-/tmp/recipe_hard}
out=${2:-$work/exp/sweep}
repo_root="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$repo_root:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_compile_cache
exp_dir=$work/exp
cd "$work"
mkdir -p "$out"

run() {
  tag=$1; shift
  echo "=== $tag $(date +%H:%M:%S) ==="
  python -m openeat_tpu.bin.recognize \
    --config "$exp_dir/train.yaml" --checkpoint "$exp_dir/avg_best3" \
    --test_data data/dev/format.data --dict data/dict.txt \
    --mode attention_rescoring --batch_size 64 --beam_size 10 \
    --reverse_weight 0.3 --max_hyp_len 24 \
    --result_file "$out/dev_hyp_$tag.txt" "$@" \
    > "$out/$tag.log" 2>&1 \
    || { echo "$tag FAILED (see $out/$tag.log)"; return 1; }
  python "$repo_root/tools/compute_wer.py" data/dev/text \
    "$out/dev_hyp_$tag.txt" | tail -1 | sed "s/^/$tag /" \
    | tee -a "$out/summary.txt"
}

# Override the grids via env: CTC_WEIGHTS, LM_WEIGHTS (n-gram fusion at
# LM_CTC_WEIGHT), TRANSLM_WEIGHTS (transformer-LM fusion, needs
# $work/conf_lm.yaml + exp/lm/epoch_$LM_EPOCH), LM_CTC_WEIGHT.
CTC_WEIGHTS=${CTC_WEIGHTS:-"0.3 0.5 0.8 1.2 2.0"}
LM_WEIGHTS=${LM_WEIGHTS:-"0.1"}
TRANSLM_WEIGHTS=${TRANSLM_WEIGHTS:-""}
LM_CTC_WEIGHT=${LM_CTC_WEIGHT:-0.5}
LM_EPOCH=${LM_EPOCH:-6}
for cw in $CTC_WEIGHTS; do
  run "cw$cw" --ctc_weight "$cw"
done
for lw in $LM_WEIGHTS; do
  run "cw${LM_CTC_WEIGHT}_lm$lw" --ctc_weight "$LM_CTC_WEIGHT" \
    --ngram_lm "$exp_dir/lm.arpa" --lm_weight "$lw"
done
for lw in $TRANSLM_WEIGHTS; do
  run "cw${LM_CTC_WEIGHT}_translm$lw" --ctc_weight "$LM_CTC_WEIGHT" \
    --lm_config "$work/conf_lm.yaml" \
    --lm_checkpoint "$exp_dir/lm/epoch_$LM_EPOCH" --lm_weight "$lw"
done
echo SWEEP_DONE
