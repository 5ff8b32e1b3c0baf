#!/usr/bin/env python3
"""ROVER system combination: merge N recognizers' outputs by alignment
+ voting.

Functional replacement for the reference's crowd-kit Dawid-Skene label
aggregation (reference tools/rover.py:1-9): hypotheses for each
utterance are progressively aligned into a word transition network with
edit-distance alignment, then each slot is decided by majority vote
(ties broken by system order; '*' deletions can win, dropping the
slot).

Usage: rover.py out.txt hyp1.txt hyp2.txt [hyp3.txt ...]
"""

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from openeat_tpu.utils.wer import align, characterize  # noqa: E402


def read_trn(path):
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(None, 1)
            if parts:
                out[parts[0]] = parts[1] if len(parts) > 1 else ""
    return out


def combine_utt(hyps: list[list[str]]) -> list[str]:
    """Progressive alignment into slots, then per-slot plurality vote."""
    # network: list of slots; each slot is a list of candidate words
    # (one per already-merged system, '*' for absent)
    network = [[w] for w in hyps[0]]
    n_merged = 1
    for hyp in hyps[1:]:
        base = [slot[0] if slot[0] != "*" else
                next((w for w in slot if w != "*"), "*")
                for slot in network]
        stats = align(base, hyp)
        new_net = []
        i = 0  # slot index
        for r, h, op in stats.alignment:
            if op in ("C", "S"):
                new_net.append(network[i] + [h])
                i += 1
            elif op == "D":
                new_net.append(network[i] + ["*"])
                i += 1
            else:  # insertion: new slot, absent in merged systems
                new_net.append(["*"] * n_merged + [h])
        while i < len(network):
            new_net.append(network[i] + ["*"])
            i += 1
        network = new_net
        n_merged += 1
    out = []
    for slot in network:
        winner, _ = collections.Counter(slot).most_common(1)[0]
        if winner != "*":
            out.append(winner)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("output")
    p.add_argument("hyps", nargs="+")
    p.add_argument("--word", action="store_true",
                   help="word units (default CJK-aware char units)")
    args = p.parse_args()
    systems = [read_trn(h) for h in args.hyps]
    keys = sorted(set().union(*[set(s) for s in systems]))
    tok = (lambda t: t.split()) if args.word else characterize
    with open(args.output, "w", encoding="utf-8") as f:
        for k in keys:
            hyps = [tok(s.get(k, "")) for s in systems]
            hyps = [h for h in hyps if h] or [[]]
            merged = combine_utt(hyps)
            joiner = " " if args.word else ""
            f.write(f"{k} {joiner.join(merged)}\n")
    print(f"wrote {args.output} ({len(keys)} utts)", file=sys.stderr)


if __name__ == "__main__":
    main()
