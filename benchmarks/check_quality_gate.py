"""Executable quality-regression gate for the lmhard recipe drive.

Encodes the CLAUDE.md quality band (r3 anchors: greedy 14.38,
rescoring 13.91, blind 4-gram fusion 13.44, dev-tuned fusion 12.25 —
benchmarks/results/r3_recipe_lmhard/) as assertions over a results
directory, so the next accuracy regression fails a script instead of
relying on a human remembering thresholds (VERDICT r3 weak #5).

The reference's analog is its recipe-driven WER table
(reference examples/aishell/README.md:13-16) checked by eye; here the
mode ORDERING and margins are the contract:

    greedy CER in [13, 16]          (training sanity on the lmhard corpus)
    rescoring - greedy   <= -0.2    (attention rescoring must help)
    fusion(w=0.3) - rescoring <= -0.25  (blind n-gram fusion must help)
    tuned_fusion - rescoring  <= -1.2   (dev-tuned fusion, if present)

Usage: python benchmarks/check_quality_gate.py <results_dir>
where <results_dir> holds results.json (4 decode modes) and optionally
results_lm.json (fusion rows). Exits 1 with a FAIL line per broken
inequality; prints QUALITY_GATE PASS otherwise.
"""

from __future__ import annotations

import json
import os
import sys


def check(results_dir: str) -> list[str]:
    with open(os.path.join(results_dir, "results.json")) as f:
        res = json.load(f)
    lm_path = os.path.join(results_dir, "results_lm.json")
    lm = {}
    if os.path.exists(lm_path):
        with open(lm_path) as f:
            lm = json.load(f)

    failures: list[str] = []

    def req(cond: bool, msg: str):
        if not cond:
            failures.append(msg)

    greedy = res.get("ctc_greedy_search")
    rescoring = res.get("attention_rescoring")
    req(greedy is not None and rescoring is not None,
        f"missing decode results: greedy={greedy} rescoring={rescoring}")
    if failures:
        return failures

    req(13.0 <= greedy <= 16.0,
        f"greedy CER {greedy} outside the [13, 16] sanity band")
    req(rescoring - greedy <= -0.2,
        f"rescoring {rescoring} - greedy {greedy} = "
        f"{rescoring - greedy:+.2f} > -0.2 (rescoring must help)")

    fusion = lm.get("rescoring_ngram")
    if fusion is not None:
        req(fusion - rescoring <= -0.25,
            f"ngram fusion {fusion} - rescoring {rescoring} = "
            f"{fusion - rescoring:+.2f} > -0.25 (blind fusion must help)")
    tuned = next((v for k, v in lm.items()
                  if k.startswith("rescoring_ngram_tuned")), None)
    if tuned is not None:
        req(tuned - rescoring <= -1.2,
            f"tuned fusion {tuned} - rescoring {rescoring} = "
            f"{tuned - rescoring:+.2f} > -1.2")
    return failures


def main():
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(2)
    failures = check(sys.argv[1])
    for msg in failures:
        print(f"QUALITY_GATE FAIL: {msg}")
    if failures:
        sys.exit(1)
    print("QUALITY_GATE PASS")


if __name__ == "__main__":
    main()
