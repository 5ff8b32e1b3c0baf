"""Text -> token stream CLI (dict building).

Parity: reference openeat/bin/text2token.py:32-49 and
tools/text2token_wenet.py — reads `<utt> <text>` lines, emits
`<utt> <tok1> <tok2> ...` using the CJK+BPE tokenizer; used by recipes
to build the character dict.
"""

from __future__ import annotations

import argparse
import sys

from openeat_tpu.dataset.bpe import load_bpe
from openeat_tpu.dataset.text import remove_punctuation, tokenize


def get_parser():
    p = argparse.ArgumentParser(description="tokenize text")
    p.add_argument("text", nargs="?", default=None,
                   help="input file (default stdin)")
    p.add_argument("--bpe_model", default=None)
    p.add_argument("--skip_ncols", type=int, default=1,
                   help="leading columns (utt ids) to pass through")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    bpe = load_bpe(args.bpe_model)
    fin = open(args.text, encoding="utf-8") if args.text else sys.stdin
    for line in fin:
        parts = line.rstrip("\n").split(None, args.skip_ncols)
        head = parts[: args.skip_ncols]
        text = parts[args.skip_ncols] if len(parts) > args.skip_ncols else ""
        toks = tokenize(remove_punctuation(text), bpe)
        print(" ".join(head + toks))
    if args.text:
        fin.close()


if __name__ == "__main__":
    main()
