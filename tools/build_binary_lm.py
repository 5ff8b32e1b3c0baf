#!/usr/bin/env python3
"""Compile a text/gzip ARPA n-gram into the first-party binary format.

The kenlm `build_binary` analog (reference loads .klm binaries at
openeat/bin/recognize.py:163-178): the output is mmap-loaded by
openeat_tpu.lm.ngram.BinaryNgramLM in O(header) time with identical
scores to the source ARPA.

Usage: python tools/build_binary_lm.py lm.arpa[.gz] lm.bin
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from openeat_tpu.lm.ngram import ArpaLM  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("arpa", help="input ARPA (text or .gz)")
    p.add_argument("output", help="output binary model")
    args = p.parse_args()
    lm = ArpaLM.load(args.arpa)
    lm.save_binary(args.output)
    n = sum(1 for _ in lm.ngrams)
    print(f"{args.output}: order {lm.order}, {n} n-grams, "
          f"{os.path.getsize(args.output)} bytes", file=sys.stderr)


if __name__ == "__main__":
    main()
