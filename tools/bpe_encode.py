#!/usr/bin/env python3
"""Encode text lines to BPE pieces (spm_encode equivalent).

Reference tools/spm_encode wraps sentencepiece; this uses whichever BPE
backend openeat_tpu.dataset.bpe resolves (sentencepiece .model or the
first-party .bpe.json).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from openeat_tpu.dataset.bpe import load_bpe  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--input", default=None, help="default stdin")
    p.add_argument("--skip_ncols", type=int, default=0)
    args = p.parse_args()
    bpe = load_bpe(args.model)
    fin = open(args.input, encoding="utf-8") if args.input else sys.stdin
    for line in fin:
        parts = line.rstrip("\n").split(None, args.skip_ncols)
        head = parts[: args.skip_ncols]
        text = parts[args.skip_ncols] if len(parts) > args.skip_ncols else ""
        print(" ".join(head + bpe.encode_as_pieces(text)))


if __name__ == "__main__":
    main()
