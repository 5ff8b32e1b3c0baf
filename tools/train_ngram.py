#!/usr/bin/env python3
"""First-party n-gram LM estimator: text -> ARPA (interpolated modified
Kneser-Ney, Chen & Goodman 1998), loadable by openeat_tpu.lm.ngram.

The reference consumes kenlm/SRILM-built LMs but cannot build one
(reference openeat/bin/recognize.py:163-178 loads, never trains); in a
zero-egress environment that leaves the --ngram_lm decode path without
a model. This tool closes the loop: train text -> ARPA here ->
(optionally) tools/build_binary_lm.py -> recognize --ngram_lm.

Smoothing follows the kenlm/SRILM conventions so generic ARPA scorers
reproduce interpolated KN exactly:
- highest order uses raw counts; lower orders use continuation counts
  (number of distinct left extensions), except n-grams starting with
  <s>, which cannot be left-extended and keep raw counts;
- three discounts per order (D1/D2/D3+) from count-of-counts,
  D_i = i - (i+1) * Y * n_{i+1} / n_i with Y = n1 / (n1 + 2 n2),
  clamped to [0, i] (degenerate count-of-counts fall back to 0.75);
- the ARPA "backoff" column of a context is log10 of its interpolation
  weight gamma(ctx) = sum_i D_i * N_i(ctx *) / c(ctx);
- unigrams interpolate with uniform 1/|V|; <unk> is a regular vocab
  entry so every word has nonzero probability; <s> is never predicted
  (log10 prob -99, kenlm convention) but carries a backoff weight.

Usage:
  python tools/train_ngram.py TEXT OUT.arpa [--order 3]
      [--format kaldi|raw] [--tokenizer char|space]

--format kaldi strips the leading utterance id per line. --tokenizer
char applies the CJK char / latin word split used by the ASR dict
(dataset.text.tokenize); space splits on whitespace.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from openeat_tpu.dataset.text import tokenize  # noqa: E402

BOS, EOS, UNK = "<s>", "</s>", "<unk>"


def read_sentences(path: str, fmt: str, tokenizer: str) -> list[list[str]]:
    sents = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if fmt == "kaldi":
                parts = line.split(maxsplit=1)
                line = parts[1] if len(parts) == 2 else ""
                if not line:
                    continue
            toks = tokenize(line) if tokenizer == "char" else line.split()
            if toks:
                sents.append(toks)
    return sents


def _discounts(counts_of_counts: Counter) -> list[float]:
    """[D1, D2, D3+] from n1..n4 (Chen & Goodman eq. 26)."""
    n = [counts_of_counts.get(i, 0) for i in (1, 2, 3, 4)]
    if n[0] == 0 or n[1] == 0:
        return [0.75, 0.75, 0.75]
    y = n[0] / (n[0] + 2.0 * n[1])
    ds = []
    for i in (1, 2, 3):
        if n[i - 1] == 0:
            ds.append(0.75)
            continue
        d = i - (i + 1) * y * n[i] / n[i - 1]
        ds.append(min(max(d, 0.0), float(i)))
    return ds


def estimate(sents: list[list[str]], order: int
             ) -> dict[tuple[str, ...], tuple[float, float | None]]:
    """Returns {ngram: (log10 prob, log10 backoff | None)}."""
    # --- raw counts per order (one <s> pad, one </s>) ---------------
    raw: list[Counter] = [Counter() for _ in range(order + 1)]
    for toks in sents:
        words = [BOS] + toks + [EOS]
        for k in range(1, order + 1):
            for i in range(len(words) - k + 1):
                g = tuple(words[i: i + k])
                if k == 1 and g == (BOS,):
                    continue  # <s> is context-only
                raw[k][g] += 1
    vocab = sorted({w for g in raw[1] for w in g} | {UNK, BOS})

    # --- adjusted counts: continuation counts below the top order ---
    # c'(g) = |{w0 : raw(w0 + g) > 0}|, except g starting with <s>
    adj: list[Counter] = [Counter() for _ in range(order + 1)]
    adj[order] = raw[order]
    for k in range(order - 1, 0, -1):
        cont = Counter()
        for g in raw[k + 1]:
            cont[g[1:]] += 1
        adj[k] = Counter({g: (raw[k][g] if g[0] == BOS else cont.get(g, 0))
                          for g in raw[k]})
        for g in cont:  # grams seen only as continuations
            if g not in adj[k] and g[0] != BOS:
                adj[k][g] = cont[g]

    # --- discounts per order ----------------------------------------
    ds = [None] + [_discounts(Counter(Counter(adj[k]).values()))
                   for k in range(1, order + 1)]

    def disc(k: int, c: int) -> float:
        return ds[k][min(c, 3) - 1] if c > 0 else 0.0

    # --- interpolated probabilities, lowest order first -------------
    probs: dict[tuple[str, ...], float] = {}
    # unigram: interpolate continuation counts with uniform
    tot1 = sum(adj[1].values())
    bucket = Counter()
    for g, c in adj[1].items():
        bucket[min(c, 3)] += 1
    gamma1 = (sum(ds[1][i - 1] * bucket[i] for i in (1, 2, 3))
              / max(tot1, 1))
    # uniform interpolation over the PREDICTABLE vocab (<s> is context
    # -only and must receive no unigram mass or distributions leak)
    pred_vocab = [w for w in vocab if w != BOS]
    v = len(pred_vocab)
    for w in pred_vocab:
        c = adj[1].get((w,), 0)
        p = max(c - disc(1, c), 0.0) / max(tot1, 1) + gamma1 / v
        probs[(w,)] = p

    backoffs: dict[tuple[str, ...], float] = {(): gamma1}
    for k in range(2, order + 1):
        # group k-grams by context
        by_ctx: dict[tuple[str, ...], list[tuple[str, int]]] = \
            defaultdict(list)
        for g, c in adj[k].items():
            if c > 0:
                by_ctx[g[:-1]].append((g[-1], c))
        for ctx, items in by_ctx.items():
            tot = sum(c for _, c in items)
            gamma = sum(disc(k, c) for _, c in items) / tot
            backoffs[ctx] = gamma
            for w, c in items:
                lower = probs[(ctx[1:] + (w,))[-(k - 1):]] \
                    if k > 2 else probs[(w,)]
                probs[ctx + (w,)] = (max(c - disc(k, c), 0.0) / tot
                                     + gamma * lower)

    # --- assemble ARPA entries --------------------------------------
    out: dict[tuple[str, ...], tuple[float, float | None]] = {}
    def _bo_lp(g):
        bo = backoffs.get(g)
        if bo is None or len(g) >= order:
            return None
        return math.log10(bo) if bo > 0 else -99.0

    for g, p in probs.items():
        if g == (BOS,):
            continue
        lp = math.log10(p) if p > 0 else -99.0
        out[g] = (lp, _bo_lp(g))
    out[(BOS,)] = (-99.0, _bo_lp((BOS,)))
    return out


def write_arpa(path: str, ngrams: dict, order: int) -> None:
    per_order: list[list] = [[] for _ in range(order + 1)]
    for g, (lp, bo) in sorted(ngrams.items()):
        per_order[len(g)].append((g, lp, bo))
    with open(path, "w", encoding="utf-8") as f:
        f.write("\\data\\\n")
        for k in range(1, order + 1):
            f.write(f"ngram {k}={len(per_order[k])}\n")
        for k in range(1, order + 1):
            f.write(f"\n\\{k}-grams:\n")
            for g, lp, bo in per_order[k]:
                line = f"{lp:.7f}\t{' '.join(g)}"
                if bo is not None:
                    line += f"\t{bo:.7f}"
                f.write(line + "\n")
        f.write("\n\\end\\\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("text")
    p.add_argument("output")
    p.add_argument("--order", type=int, default=3)
    p.add_argument("--format", choices=["kaldi", "raw"], default="kaldi")
    p.add_argument("--tokenizer", choices=["char", "space"],
                   default="char")
    args = p.parse_args()
    sents = read_sentences(args.text, args.format, args.tokenizer)
    if not sents:
        raise SystemExit("no sentences read")
    ngrams = estimate(sents, args.order)
    write_arpa(args.output, ngrams, args.order)
    print(f"{len(sents)} sentences -> {args.output} "
          f"(order {args.order}, {len(ngrams)} entries)", file=sys.stderr)


if __name__ == "__main__":
    main()
