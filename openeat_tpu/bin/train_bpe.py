"""Train the first-party BPE tokenizer.

Replaces the reference's `tools/spm_train` sentencepiece CLI for
environments without the C++ sentencepiece package; produces the JSON
model consumed by openeat_tpu.dataset.bpe.load_bpe.
"""

from __future__ import annotations

import argparse

from openeat_tpu.dataset.bpe import train_bpe


def get_parser():
    p = argparse.ArgumentParser(description="train BPE model")
    p.add_argument("--input", required=True, help="text file, one line each")
    p.add_argument("--model_prefix", required=True)
    p.add_argument("--vocab_size", type=int, default=1000)
    p.add_argument("--skip_ncols", type=int, default=0)
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    lines = []
    with open(args.input, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(None, args.skip_ncols)
            lines.append(parts[args.skip_ncols]
                         if len(parts) > args.skip_ncols else "")
    model = train_bpe(lines, args.vocab_size)
    path = args.model_prefix + ".bpe.json"
    model.save(path)
    with open(args.model_prefix + ".vocab", "w", encoding="utf-8") as f:
        for tok in model.vocab:
            f.write(tok + "\n")
    print(path)


if __name__ == "__main__":
    main()
