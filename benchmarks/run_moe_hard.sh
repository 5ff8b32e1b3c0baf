#!/usr/bin/env bash
# Mixture-of-experts flagship on the HARD corpus, REAL TPU: the MoE
# encoder FFN (GShard static-capacity top-2-of-4, Switch aux loss —
# modules/feed_forward.py, beyond-reference per SURVEY.md 2.7) trained
# end-to-end through the same recipe as the dense hard-profile drive
# (benchmarks/results/r3_recipe_hard: greedy 8.78 / rescoring 8.84),
# then decoded greedy + rescoring. Done-criterion: the MoE model
# trains stably on-chip (finite losses, decreasing cv) and lands CER
# in the dense model's neighbourhood — the on-hardware proof for the
# MoE/EP feature whose evidence was previously CPU-only.
#
# Usage: PYTHONPATH=/root/repo:/root/.axon_site \
#        bash benchmarks/run_moe_hard.sh [work] [corpus_work]
set -euo pipefail

work=${1:-/tmp/moe_hard}
corpus=${2:-/tmp/recipe_hard}
repo_root="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$repo_root:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_compile_cache
exp_dir=$work/exp
max_epoch=${MAX_EPOCH:-60}   # env-overridable: short windows train fewer epochs
average_num=${AVG_NUM:-3}
# MoE needs the GENTLER ramp: at the dense run's warmup 2 the routed
# flagship never aligns (measured: cv_loss pinned at ~30 / cv_acc ~0.18
# through epoch 10 — the same warmup-2 creep the lmhard and causal
# flagships showed, while dense-hard reached cv_acc 0.53 by epoch 4).
# Router noise early in training effectively hardens the corpus, so the
# lmhard/streaming remedy applies: warmup 8 at the same 5e-4 peak.
warmup_epoch=${WARMUP_EPOCH:-8}

[ -f "$corpus/data/train/format.data" ] || {
  echo "hard corpus not found at $corpus (run run_recipe_tpu.sh hard)"
  exit 1
}
mkdir -p "$work"
cd "$work"
[ -e data ] || ln -s "$corpus/data" data

if [ ! -d "$exp_dir/epoch_$max_epoch" ]; then
  echo "=== train MoE flagship ($max_epoch epochs) ==="
  python - <<PY
# dense hard-profile config + the MoE fields from
# examples/aishell/conf/train_conformer_moe.yaml; same peak lr/epochs as
# the dense run, but warmup 8 (see warmup_epoch note above) — the only
# schedule deviation from the dense comparison point
import yaml
cfg = yaml.safe_load(open("$corpus/conf_synth.yaml"))
cfg["model_conf"].update(moe_experts=4, moe_top_k=2,
                         moe_capacity_factor=1.25, moe_aux_weight=0.01)
cfg["max_epoch"] = $max_epoch
cfg["warmup_epoch"] = $warmup_epoch
yaml.safe_dump(cfg, open("$work/conf_moe.yaml", "w"), sort_keys=False)
PY
  resume=()
  last=$(find "$exp_dir" -maxdepth 1 -type d -name 'epoch_*' 2>/dev/null |
         sed 's/.*epoch_//' | sort -n | tail -1 || true)
  if [ -n "${last:-}" ]; then
    echo "resuming from epoch_$last"
    resume=(--checkpoint "$exp_dir/epoch_$last")
  fi
  python -m openeat_tpu.bin.train \
    --config "$work/conf_moe.yaml" \
    --train_data data/train/format.data \
    --cv_data data/dev/format.data \
    --dict data/dict.txt \
    --exp_dir "$exp_dir" "${resume[@]}"
fi

echo "=== average best-$average_num ==="
python -m openeat_tpu.bin.average_model \
  --exp_dir "$exp_dir" --dst "avg_best${average_num}" \
  --num "$average_num" --val_best

ckpt=$exp_dir/avg_best${average_num}

echo "=== decode (greedy + rescoring) ==="
for mode in ctc_greedy_search attention_rescoring; do
  [ -s "$exp_dir/cer_${mode}.txt" ] && {
    tail -1 "$exp_dir/cer_${mode}.txt"; continue; }
  python -m openeat_tpu.bin.recognize \
    --config "$exp_dir/train.yaml" \
    --checkpoint "$ckpt" \
    --test_data data/test/format.data \
    --dict data/dict.txt \
    --mode "$mode" \
    --batch_size 64 --beam_size 10 \
    --ctc_weight 0.5 --reverse_weight 0.3 --max_hyp_len 24 \
    --result_file "$exp_dir/hyp_${mode}.txt"
  python "$repo_root/tools/compute_wer.py" data/test/text \
    "$exp_dir/hyp_${mode}.txt" > "$exp_dir/cer_${mode}.txt"
  tail -1 "$exp_dir/cer_${mode}.txt"
done

python - <<PY
import json, re
out = {}
for mode in ["ctc_greedy_search", "attention_rescoring"]:
    text = open("$exp_dir/cer_" + mode + ".txt").read()
    m = re.findall(r"Overall.*?(\d+\.\d+)", text)
    out[mode] = float(m[-1]) if m else None
json.dump(out, open("$exp_dir/results_moe.json", "w"), indent=1)
print(json.dumps(out))
PY
