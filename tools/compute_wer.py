#!/usr/bin/env python3
"""Corpus WER/CER scorer CLI.

Own implementation with the reference scorer's interface shape
(reference tools/compute-wer.py): `compute_wer.py ref hyp [--word]`,
prints per-utt alignments and the overall summary line.
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from openeat_tpu.utils.wer import corpus_wer  # noqa: E402


def read_trn(path: str) -> dict:
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(None, 1)
            if parts:
                out[parts[0]] = parts[1] if len(parts) > 1 else ""
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ref")
    p.add_argument("hyp")
    p.add_argument("--word", action="store_true",
                   help="word mode (default char/CER)")
    p.add_argument("--case_sensitive", action="store_true")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--clusters", action="store_true",
                   help="Mandarin/English per-cluster breakdown")
    args = p.parse_args()
    refs = read_trn(args.ref)
    hyps = read_trn(args.hyp)
    out = corpus_wer(refs, hyps, char_mode=not args.word,
                     case_sensitive=args.case_sensitive,
                     verbose_file=sys.stdout if args.verbose else None,
                     clusters=args.clusters)
    total, per = out if args.clusters else (out, {})
    for name, s in per.items():
        if s.ref_len or s.ins:
            print(f"{name} -> {s.wer:.2f} % N={s.ref_len} C={s.cor} "
                  f"S={s.sub} D={s.dele} I={s.ins}")
    print(f"Overall -> {total.wer:.2f} % N={total.ref_len} C={total.cor} "
          f"S={total.sub} D={total.dele} I={total.ins}")


if __name__ == "__main__":
    main()
