#!/usr/bin/env python3
"""Decode BPE pieces back to text (spm_decode equivalent).

Joins piece streams on the ▁ word-boundary convention; works with both
sentencepiece pieces and the first-party BPE.
"""

import argparse
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", default=None, help="default stdin")
    p.add_argument("--skip_ncols", type=int, default=0)
    args = p.parse_args()
    fin = open(args.input, encoding="utf-8") if args.input else sys.stdin
    for line in fin:
        parts = line.rstrip("\n").split(None, args.skip_ncols)
        head = parts[: args.skip_ncols]
        rest = parts[args.skip_ncols] if len(parts) > args.skip_ncols else ""
        text = "".join(rest.split()).replace("▁", " ").strip()
        print(" ".join(head + ([text] if text else [])))


if __name__ == "__main__":
    main()
