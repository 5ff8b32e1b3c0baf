"""First-party byte-pair-encoding tokenizer (train / encode / decode).

Replaces the reference's sentencepiece dependency
(reference openeat/dataset/dataset.py:290-292, tools/spm_train:1-16)
with a self-contained BPE implementation using the same `▁`
word-boundary convention, so models trained with either tokenizer
interoperate at the piece level. If sentencepiece is installed,
`load_bpe()` prefers it for exact compatibility with existing .model
files; this module is the always-available fallback and the trainer for
new vocabularies.
"""

from __future__ import annotations

import collections
import json
from typing import Iterable

WORD_BOUNDARY = "▁"  # ▁


class BPEModel:
    """Greedy longest-merge BPE with sentencepiece-style ▁ prefix."""

    def __init__(self, merges: list[tuple[str, str]],
                 vocab: list[str] | None = None):
        self.merges = [tuple(m) for m in merges]
        self.ranks = {m: i for i, m in enumerate(self.merges)}
        self.vocab = vocab or []

    # -- encoding --

    def _encode_word(self, word: str) -> list[str]:
        pieces = [WORD_BOUNDARY + word[0]] + list(word[1:]) if word else []
        while len(pieces) > 1:
            best, best_rank = None, None
            for i in range(len(pieces) - 1):
                r = self.ranks.get((pieces[i], pieces[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            pieces[best: best + 2] = [pieces[best] + pieces[best + 1]]
        return pieces

    def encode_as_pieces(self, text: str) -> list[str]:
        out: list[str] = []
        for word in text.strip().split():
            out.extend(self._encode_word(word))
        return out

    def decode_pieces(self, pieces: Iterable[str]) -> str:
        return "".join(pieces).replace(WORD_BOUNDARY, " ").strip()

    # -- persistence --

    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump({"format": "openeat_tpu_bpe_v1",
                       "merges": self.merges, "vocab": self.vocab}, f,
                      ensure_ascii=False)

    @classmethod
    def load(cls, path: str) -> "BPEModel":
        with open(path, encoding="utf-8") as f:
            blob = json.load(f)
        return cls([tuple(m) for m in blob["merges"]], blob.get("vocab"))


def train_bpe(lines: Iterable[str], vocab_size: int = 1000) -> BPEModel:
    """Learn BPE merges from an iterable of text lines.

    Standard BPE: start from characters (words prefixed with ▁), merge
    the most frequent adjacent pair until vocab_size symbols exist.
    """
    word_freq = collections.Counter()
    for line in lines:
        for w in line.strip().upper().split():
            word_freq[w] += 1
    # words as tuples of symbols
    words = {w: tuple([WORD_BOUNDARY + w[0]] + list(w[1:]))
             for w in word_freq}
    symbols = set()
    for t in words.values():
        symbols.update(t)
    merges: list[tuple[str, str]] = []

    def pair_counts():
        pc = collections.Counter()
        for w, freq in word_freq.items():
            t = words[w]
            for i in range(len(t) - 1):
                pc[(t[i], t[i + 1])] += freq
        return pc

    while len(symbols) + len(merges) < vocab_size:
        pc = pair_counts()
        if not pc:
            break
        (a, b), cnt = pc.most_common(1)[0]
        if cnt < 2:
            break
        merges.append((a, b))
        merged = a + b
        symbols.add(merged)
        for w in list(words):
            t = words[w]
            if a not in t:
                continue
            out = []
            i = 0
            while i < len(t):
                if i < len(t) - 1 and t[i] == a and t[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            words[w] = tuple(out)
    vocab = sorted(symbols)
    return BPEModel(merges, vocab)


def load_bpe(path: str | None):
    """Load a BPE model: sentencepiece .model if available & binary,
    else the first-party JSON format. None -> None."""
    if path is None:
        return None
    if path.endswith(".model"):
        try:
            import sentencepiece as spm
            sp = spm.SentencePieceProcessor()
            sp.load(path)
            return sp
        except ImportError:
            raise ImportError(
                "sentencepiece not available for .model files; train a "
                "first-party model with openeat_tpu.bin.train_bpe")
    return BPEModel.load(path)
