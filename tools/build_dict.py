#!/usr/bin/env python3
"""Build the token dict from transcripts.

Own implementation of the reference recipe's dict stage
(reference examples/aishell/run.sh:93-104 + tools/prepare_dict.py):
tokenizes the training text (CJK chars + optional BPE), applies a
frequency threshold, and writes `<token> <id>` with the conventions
<blank>=0, <unk>=1, <sos/eos>=last.
"""

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from openeat_tpu.dataset.bpe import load_bpe  # noqa: E402
from openeat_tpu.dataset.text import remove_punctuation, tokenize  # noqa


def main():
    p = argparse.ArgumentParser()
    p.add_argument("text", help="'<utt> <text>' transcript file")
    p.add_argument("output")
    p.add_argument("--bpe_model", default=None)
    p.add_argument("--min_count", type=int, default=1)
    args = p.parse_args()

    bpe = load_bpe(args.bpe_model)
    counts = collections.Counter()
    with open(args.text, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(None, 1)
            if len(parts) < 2:
                continue
            counts.update(tokenize(remove_punctuation(parts[1]), bpe))
    vocab = ["<blank>", "<unk>"]
    vocab += sorted(t for t, c in counts.items() if c >= args.min_count)
    vocab.append("<sos/eos>")
    with open(args.output, "w", encoding="utf-8") as f:
        for i, tok in enumerate(vocab):
            f.write(f"{tok} {i}\n")
    print(f"{args.output}: {len(vocab)} tokens", file=sys.stderr)


if __name__ == "__main__":
    main()
