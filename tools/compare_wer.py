#!/usr/bin/env python3
"""Paired significance test between two hypothesis files.

Beyond-reference tool (the reference scores each decode mode
independently, tools/compute-wer.py, and reports point CERs — its
README compares modes with no noise-floor analysis). When decode modes
differ by a few tenths of a CER point, a point comparison can be
sampling noise; this tool quantifies it on the *paired* per-utterance
error counts, which removes the shared between-utterance variance:

  - paired bootstrap over utterances (Bisani & Ney 2004 style):
    resample utterances with replacement, recompute dCER = CER_A -
    CER_B per replicate, report the 95% CI and P(dCER > 0);
  - a matched-pairs sign test on utterances whose error counts differ.

Usage: compare_wer.py ref hypA hypB [--word] [--n_boot 10000]
Prints one JSON line; exit code 0 always (analysis, not a gate).
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from openeat_tpu.utils.wer import align, characterize, wordize  # noqa: E402


def read_trn(path: str) -> dict:
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(None, 1)
            if parts:
                out[parts[0]] = parts[1] if len(parts) > 1 else ""
    return out


def per_utt_errors(refs, hyps, char_mode=True):
    """Arrays (errors, ref_len) over EVERY reference utterance (a
    missing hypothesis scores as all-deletions, matching
    tools/compute_wer.py), plus the keys in iteration order."""
    tok = characterize if char_mode else wordize
    keys = list(refs)
    missing = sum(1 for k in keys if k not in hyps)
    if missing:
        print(f"warning: {missing}/{len(keys)} ref utts have no "
              "hypothesis — scored as deletions", file=sys.stderr)
    errs = np.zeros(len(keys), np.int64)
    lens = np.zeros(len(keys), np.int64)
    for i, k in enumerate(keys):
        s = align(tok(refs[k]), tok(hyps.get(k, "")))
        errs[i] = s.errors
        lens[i] = s.ref_len
    return errs, lens, keys


def paired_bootstrap(err_a, err_b, lens, n_boot=10000, seed=0):
    rng = np.random.default_rng(seed)
    n = len(lens)
    idx = rng.integers(0, n, (n_boot, n))
    tot = lens[idx].sum(axis=1).astype(np.float64)
    d = (err_a[idx].sum(axis=1) - err_b[idx].sum(axis=1)) / tot * 100.0
    return d


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ref")
    p.add_argument("hyp_a")
    p.add_argument("hyp_b")
    p.add_argument("--word", action="store_true")
    p.add_argument("--n_boot", type=int, default=10000)
    args = p.parse_args()
    refs = read_trn(args.ref)
    char_mode = not args.word
    hyp_a, hyp_b = read_trn(args.hyp_a), read_trn(args.hyp_b)
    # a paired test is only meaningful when both systems decoded the
    # same utterances: per_utt_errors scores any miss as full deletion,
    # which would silently charge an A/B coverage difference to quality
    cov_a, cov_b = set(hyp_a) & set(refs), set(hyp_b) & set(refs)
    assert cov_a == cov_b, (
        f"hyp files cover different utterance sets "
        f"({len(cov_a ^ cov_b)} utts differ, e.g. "
        f"{sorted(cov_a ^ cov_b)[:3]})")
    err_a, lens, keys = per_utt_errors(refs, hyp_a, char_mode)
    err_b, lens_b, keys_b = per_utt_errors(refs, hyp_b, char_mode)
    n_tok = int(lens.sum())
    cer_a = 100.0 * err_a.sum() / n_tok
    cer_b = 100.0 * err_b.sum() / n_tok
    d = paired_bootstrap(err_a, err_b, lens, args.n_boot)
    lo, hi = np.percentile(d, [2.5, 97.5])
    # sign test on discordant utterances
    a_worse = int((err_a > err_b).sum())
    b_worse = int((err_a < err_b).sum())
    m = a_worse + b_worse
    if m:
        from math import comb
        k = min(a_worse, b_worse)
        p_sign = min(1.0, 2.0 * sum(comb(m, i) for i in range(k + 1))
                     * 0.5 ** m)
    else:
        p_sign = 1.0
    print(json.dumps({
        "cer_a": round(cer_a, 3), "cer_b": round(cer_b, 3),
        "delta": round(cer_a - cer_b, 3),
        "delta_ci95": [round(float(lo), 3), round(float(hi), 3)],
        "p_a_worse_bootstrap": round(float((d > 0).mean()), 4),
        "utts": len(keys), "tokens": n_tok,
        "discordant": {"a_worse": a_worse, "b_worse": b_worse},
        "p_sign_test": round(p_sign, 5),
    }))


if __name__ == "__main__":
    main()
