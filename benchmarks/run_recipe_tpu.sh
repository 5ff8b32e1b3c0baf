#!/usr/bin/env bash
# Full-recipe quality proxy on REAL TPU hardware (VERDICT r1 item 5):
# drives the AIShell recipe's stages 1-4 verbatim (dict -> format ->
# train -> average -> 4 decode modes -> CER) over the 10k-utterance
# structured synthetic corpus (benchmarks/make_structured_corpus.py) at
# realistic batch sizes (static 64-utt batches; dev/test ingested from
# FLAC), then stages 5-6: LM training (first-party KN ARPA estimator +
# transformer LM) and attention-rescoring LM-fusion decodes.
# Results land in $work/exp/results.json + results_lm.json.
#
# Profiles (2nd arg): v1 (round-2 corpus, saturated at ~0% CER) or
# hard (confusable pairs + noise; VERDICT r2 weak #1 — greedy CER is
# meant to land at a few %, so mode margins are measurable).
#
# Usage: PYTHONPATH=/root/repo:/root/.axon_site \
#        bash benchmarks/run_recipe_tpu.sh [work_dir] [v1|hard]
set -euo pipefail

work=${1:-/tmp/recipe_quality}
profile=${2:-v1}
repo_root="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$repo_root:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_compile_cache
exp_dir=$work/exp
beam_size=10
ctc_weight=0.5
reverse_weight=0.3
average_num=3
lm_weight=0.3
max_epoch=60
corpus_flags=""
ngram_order=3
lm_epochs=8
lm_text=data/train/text
train_lr=0.0005
train_warmup=2
if [ "$profile" = hard ]; then
  # 2048 test utts (~48k tokens): at ~8% CER the paired-bootstrap
  # noise floor is ~0.1 CER points, small enough to resolve the
  # reference's 0.1-1.1-point mode margins (BASELINE.md).
  corpus_flags="--hard --n_test 2048"
elif [ "$profile" = lmhard ]; then
  # hard + order-4 pair prior (only learnable from the 100k-sentence
  # text-only lm_text split -> LMs train on it, order-4 n-gram) + a
  # deeper quiet-token deletion channel; see
  # benchmarks/make_structured_corpus.py LMHARD
  corpus_flags="--profile lmhard --n_test 2048"
  ngram_order=4
  lm_epochs=6   # 100k-sentence corpus: 6 epochs ~ 55 epochs of train/text
  # lmhard needs a GENTLER lr ramp than hard: at warmup 2 the flagship
  # hits peak lr before CTC alignment settles on this noisier corpus
  # and creeps at train_loss~29 for 20+ epochs (measured); warmup 8 at
  # the same 5e-4 peak aligns by epoch 2 and reaches cv_acc 0.83 by
  # epoch 14 (15-epoch schedule probes A/B/C, round 3)
  train_warmup=8
fi

mkdir -p "$work"
cd "$work"

# a work dir is bound to ONE corpus profile: reusing a v1 corpus under
# the hard label (or vice versa) would silently mislabel every result
if [ -f data/.corpus_profile ] && \
   [ "$(cat data/.corpus_profile)" != "$profile" ]; then
  echo "ERROR: $work was generated with profile" \
       "'$(cat data/.corpus_profile)', requested '$profile';" \
       "use a fresh work dir" >&2
  exit 1
fi

if [ ! -f data/train/wav.scp ]; then
  n_test=512; [ "$profile" = hard ] && n_test=2048
  echo "=== corpus [$profile] (10240 train / 512 dev / $n_test test) ==="
  python "$repo_root/benchmarks/make_structured_corpus.py" "$work" \
    $corpus_flags
  echo "$profile" > data/.corpus_profile
fi

if [ ! -f data/train/format.data ]; then
  echo "=== stage 1: dict + manifests ==="
  python "$repo_root/tools/build_dict.py" data/train/text data/dict.txt
  for x in train dev test; do
    python "$repo_root/tools/format_data.py" data/$x
  done
fi

if [ ! -d "$exp_dir/epoch_$max_epoch" ]; then
  echo "=== stage 2: train ($max_epoch epochs, static 64-utt batches) ==="
  python - <<PY
# derive the synth config from the flagship TPU conf: static batching
# (bounded compile-shape count on the remote-compile tunnel), epochs and
# warmup sized for the corpus
import yaml
cfg = yaml.safe_load(open("$repo_root/examples/aishell/conf/train_conformer_tpu.yaml"))
cfg["dataset_conf"].update(batch_type="static", batch_size=64,
                           max_length=400, min_length=10)
# SpecAug re-scaled for ~1.2-2 s utterances (the AIShell conf's
# 3x50-frame time masks would erase most of a 120-frame utterance).
# batch 64 gives 160 optimizer steps/epoch — the 256-utt variant
# starved the 12-block flagship of steps (a d=128 4-block probe through
# the same CLI hits 98% in 480 steps).
#
# Schedule: the 12-block flagship on this corpus is lr-fragile —
# measured grid: peak 1.5e-3/warmup 1.5ep and flat 1e-3 both plateau
# at cv_acc~0.2-0.35; peak 2e-3/warmup 5ep diverges once lr passes
# ~1.2e-3; peak 5e-4/warmup 2ep converges cleanly (cv_acc 0.38 ->
# 0.53 by epoch 4 and onward). The AIShell conf's lr 1e-3/warmup 25k
# steps assumes ~350k total steps; at 160 steps/epoch the equivalent
# is a lower peak, reached after ~2 epochs.
cfg["collate_conf"]["spec_aug_conf"].update(num_t_mask=2, max_t=15)
cfg["max_epoch"] = $max_epoch
cfg["warmup_epoch"] = $train_warmup
cfg["optim_conf"]["lr"] = $train_lr
cfg["log_interval"] = 40
yaml.safe_dump(cfg, open("$work/conf_synth.yaml", "w"), sort_keys=False)
PY
  # resume from the newest epoch checkpoint if a previous run was
  # interrupted (train.py --checkpoint restores params + optimizer)
  resume=()
  # dirs only (epoch_N.yaml info files also match the glob)
  last=$(find "$exp_dir" -maxdepth 1 -type d -name 'epoch_*' 2>/dev/null |
         sed 's/.*epoch_//' | sort -n | tail -1 || true)
  if [ -n "${last:-}" ]; then
    echo "resuming from epoch_$last"
    resume=(--checkpoint "$exp_dir/epoch_$last")
  fi
  python -m openeat_tpu.bin.train \
    --config "$work/conf_synth.yaml" \
    --train_data data/train/format.data \
    --cv_data data/dev/format.data \
    --dict data/dict.txt \
    --exp_dir "$exp_dir" "${resume[@]}"
fi

echo "=== stage 3: average best-$average_num ==="
python -m openeat_tpu.bin.average_model \
  --exp_dir "$exp_dir" --dst "avg_best${average_num}" \
  --num "$average_num" --val_best

echo "=== stage 4: decode (4 modes) + CER ==="
for mode in ctc_greedy_search ctc_prefix_beam_search attention \
    attention_rescoring; do
  python -m openeat_tpu.bin.recognize \
    --config "$exp_dir/train.yaml" \
    --checkpoint "$exp_dir/avg_best${average_num}" \
    --test_data data/test/format.data \
    --dict data/dict.txt \
    --mode "$mode" \
    --batch_size 64 \
    --beam_size "$beam_size" \
    --ctc_weight "$ctc_weight" \
    --reverse_weight "$reverse_weight" \
    --max_hyp_len 24 \
    --result_file "$exp_dir/hyp_${mode}.txt"
  python "$repo_root/tools/compute_wer.py" data/test/text \
    "$exp_dir/hyp_${mode}.txt" > "$exp_dir/cer_${mode}.txt"
  tail -2 "$exp_dir/cer_${mode}.txt"
done

python - <<PY
import json, re
out = {}
for mode in ["ctc_greedy_search", "ctc_prefix_beam_search", "attention",
             "attention_rescoring"]:
    text = open("$exp_dir/cer_" + mode + ".txt").read()
    m = re.findall(r"Overall.*?(\d+\.\d+)", text)
    out[mode] = float(m[-1]) if m else None
json.dump(out, open("$exp_dir/results.json", "w"), indent=1)
print(json.dumps(out))
PY

echo "=== stage 5: LMs (KN ARPA + transformer) ==="
# profiles with a text-only lm_text split train the LMs on it (the
# big-text vs paired-data asymmetry is the point of the lmhard profile)
[ -f data/lm_text/text ] && lm_text=data/lm_text/text
if [ ! -f "$exp_dir/lm.arpa" ]; then
  python "$repo_root/tools/train_ngram.py" "$lm_text" \
    "$exp_dir/lm.arpa" --order "$ngram_order" --format kaldi \
    --tokenizer char
fi
if [ ! -d "$exp_dir/lm/epoch_$lm_epochs" ]; then
  python - <<PY
import yaml
cfg = yaml.safe_load(open("$repo_root/examples/aishell/conf/train_lm.yaml"))
cfg["max_epoch"] = $lm_epochs
yaml.safe_dump(cfg, open("$work/conf_lm.yaml", "w"), sort_keys=False)
PY
  python -m openeat_tpu.bin.train_lm \
    --config "$work/conf_lm.yaml" \
    --train_data "$lm_text" \
    --cv_data data/dev/text \
    --dict data/dict.txt \
    --exp_dir "$exp_dir/lm"
fi

echo "=== stage 6: attention_rescoring + LM fusion ==="
python -m openeat_tpu.bin.recognize \
  --config "$exp_dir/train.yaml" \
  --checkpoint "$exp_dir/avg_best${average_num}" \
  --test_data data/test/format.data \
  --dict data/dict.txt \
  --mode attention_rescoring \
  --batch_size 64 --beam_size "$beam_size" \
  --ctc_weight "$ctc_weight" --reverse_weight "$reverse_weight" \
  --max_hyp_len 24 \
  --ngram_lm "$exp_dir/lm.arpa" --lm_weight "$lm_weight" \
  --result_file "$exp_dir/hyp_rescoring_ngram.txt"
python "$repo_root/tools/compute_wer.py" data/test/text \
  "$exp_dir/hyp_rescoring_ngram.txt" > "$exp_dir/cer_rescoring_ngram.txt"
tail -2 "$exp_dir/cer_rescoring_ngram.txt"

python -m openeat_tpu.bin.recognize \
  --config "$exp_dir/train.yaml" \
  --checkpoint "$exp_dir/avg_best${average_num}" \
  --test_data data/test/format.data \
  --dict data/dict.txt \
  --mode attention_rescoring \
  --batch_size 64 --beam_size "$beam_size" \
  --ctc_weight "$ctc_weight" --reverse_weight "$reverse_weight" \
  --max_hyp_len 24 \
  --lm_config "$work/conf_lm.yaml" \
  --lm_checkpoint "$exp_dir/lm/epoch_$lm_epochs" \
  --lm_weight "$lm_weight" \
  --result_file "$exp_dir/hyp_rescoring_translm.txt"
python "$repo_root/tools/compute_wer.py" data/test/text \
  "$exp_dir/hyp_rescoring_translm.txt" > "$exp_dir/cer_rescoring_translm.txt"
tail -2 "$exp_dir/cer_rescoring_translm.txt"

python - <<PY
import json, re
out = {}
for tag in ["rescoring_ngram", "rescoring_translm"]:
    text = open("$exp_dir/cer_" + tag + ".txt").read()
    m = re.findall(r"Overall.*?(\d+\.\d+)", text)
    out[tag] = float(m[-1]) if m else None
json.dump(out, open("$exp_dir/results_lm.json", "w"), indent=1)
print(json.dumps(out))
PY

echo "=== stage 7: paired significance (mode deltas vs noise floor) ==="
python - <<PY
# every interesting delta as a paired bootstrap: is A worse than B by
# more than sampling noise? (tools/compare_wer.py)
import json, subprocess
pairs = [
    ("greedy_vs_rescoring", "hyp_ctc_greedy_search.txt",
     "hyp_attention_rescoring.txt"),
    ("greedy_vs_prefix", "hyp_ctc_greedy_search.txt",
     "hyp_ctc_prefix_beam_search.txt"),
    ("attention_vs_rescoring", "hyp_attention.txt",
     "hyp_attention_rescoring.txt"),
    ("rescoring_vs_ngram_fusion", "hyp_attention_rescoring.txt",
     "hyp_rescoring_ngram.txt"),
    ("rescoring_vs_translm_fusion", "hyp_attention_rescoring.txt",
     "hyp_rescoring_translm.txt"),
]
out = {}
for name, a, b in pairs:
    r = subprocess.run(
        ["python", "$repo_root/tools/compare_wer.py", "data/test/text",
         "$exp_dir/" + a, "$exp_dir/" + b], capture_output=True,
        text=True, check=True)
    out[name] = json.loads(r.stdout)
    print(name, r.stdout.strip())
json.dump(out, open("$exp_dir/results_significance.json", "w"), indent=1)
PY

if [ "$profile" = lmhard ]; then
  echo "=== stage 8: executable quality gate (CLAUDE.md band) ==="
  python "$repo_root/benchmarks/check_quality_gate.py" "$exp_dir"

  echo "=== stage 9: adversarial splits (reverb channel + length extrapolation) ==="
  # VERDICT r4 next #6: two conditions the lmhard training distribution
  # doesn't cover, decoded with the SAME checkpoint — the mode ordering
  # (greedy > rescoring, fusion helps) must survive domain shift with
  # bootstrap significance.
  if [ ! -f data/test_reverb/wav.scp ]; then
    python "$repo_root/benchmarks/make_structured_corpus.py" "$work" \
      --profile lmhard --only_adversarial
  fi
  for x in test_reverb test_long; do
    [ -f data/$x/format.data ] || \
      python "$repo_root/tools/format_data.py" data/$x
  done
  for split in test_reverb test_long; do
    max_hyp=24; [ "$split" = test_long ] && max_hyp=32
    for mode in ctc_greedy_search attention_rescoring; do
      python -m openeat_tpu.bin.recognize \
        --config "$exp_dir/train.yaml" \
        --checkpoint "$exp_dir/avg_best${average_num}" \
        --test_data data/$split/format.data \
        --dict data/dict.txt \
        --mode "$mode" \
        --batch_size 64 --beam_size "$beam_size" \
        --ctc_weight "$ctc_weight" --reverse_weight "$reverse_weight" \
        --max_hyp_len "$max_hyp" \
        --result_file "$exp_dir/hyp_${split}_${mode}.txt"
    done
    python -m openeat_tpu.bin.recognize \
      --config "$exp_dir/train.yaml" \
      --checkpoint "$exp_dir/avg_best${average_num}" \
      --test_data data/$split/format.data \
      --dict data/dict.txt \
      --mode attention_rescoring \
      --batch_size 64 --beam_size "$beam_size" \
      --ctc_weight "$ctc_weight" --reverse_weight "$reverse_weight" \
      --max_hyp_len "$max_hyp" \
      --ngram_lm "$exp_dir/lm.arpa" --lm_weight "$lm_weight" \
      --result_file "$exp_dir/hyp_${split}_rescoring_ngram.txt"
  done
  python - <<PY
import json, re, subprocess
out = {}
for split in ["test_reverb", "test_long"]:
    out[split] = {}
    for tag in ["ctc_greedy_search", "attention_rescoring",
                "rescoring_ngram"]:
        hyp = "$exp_dir/hyp_%s_%s.txt" % (split, tag)
        cer = "$exp_dir/cer_%s_%s.txt" % (split, tag)
        subprocess.run(
            ["python", "$repo_root/tools/compute_wer.py",
             "data/%s/text" % split, hyp],
            stdout=open(cer, "w"), check=True)
        m = re.findall(r"Overall.*?(\d+\.\d+)", open(cer).read())
        out[split][tag] = float(m[-1]) if m else None
    for name, a, b in [
            ("greedy_vs_rescoring", "ctc_greedy_search",
             "attention_rescoring"),
            ("rescoring_vs_ngram_fusion", "attention_rescoring",
             "rescoring_ngram")]:
        r = subprocess.run(
            ["python", "$repo_root/tools/compare_wer.py",
             "data/%s/text" % split,
             "$exp_dir/hyp_%s_%s.txt" % (split, a),
             "$exp_dir/hyp_%s_%s.txt" % (split, b)],
            capture_output=True, text=True, check=True)
        out[split][name] = json.loads(r.stdout)
    print(split, json.dumps(out[split]))
json.dump(out, open("$exp_dir/results_adversarial.json", "w"), indent=1)
PY
fi
