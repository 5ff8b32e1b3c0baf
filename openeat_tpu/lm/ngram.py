"""ARPA n-gram language model scorer (kenlm replacement).

The reference shallow-fuses a kenlm n-gram during attention rescoring
(reference openeat/bin/recognize.py:163-178, asr_model.py:514-516:
`lm.score(' '.join(tokens), bos=True, eos=True)`). kenlm is a C++
dependency; this module implements standard ARPA backoff scoring
(Katz-style: use the highest-order matching n-gram's probability, else
back off with the (n-1)-gram backoff weight) from the file-format spec,
with the same `score(sentence, bos, eos)` API in log10 like kenlm.

Host-side by design: n-gram hash lookups are pointer-chasing work that
belongs on CPU; the primary fusion path is the on-device Transformer LM
(openeat_tpu.models.language_model).
"""

from __future__ import annotations

import gzip
import math

LOG10 = math.log(10.0)


class ArpaLM:
    def __init__(self, ngrams: dict[tuple[str, ...], tuple[float, float]],
                 order: int):
        self.ngrams = ngrams  # tuple(words) -> (log10 prob, log10 backoff)
        self.order = order

    @classmethod
    def load(cls, path: str) -> "ArpaLM":
        opener = gzip.open if path.endswith(".gz") else open
        ngrams: dict[tuple[str, ...], tuple[float, float]] = {}
        order = 0
        cur_n = 0
        with opener(path, "rt", encoding="utf-8") as f:
            section = None
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if line == "\\data\\":
                    section = "data"
                    continue
                if line.startswith("\\") and line.endswith("-grams:"):
                    cur_n = int(line[1:].split("-")[0])
                    order = max(order, cur_n)
                    section = "ngrams"
                    continue
                if line == "\\end\\":
                    break
                if section == "ngrams" and cur_n > 0:
                    parts = line.split("\t")
                    if len(parts) < 2:
                        parts = line.split()
                        if len(parts) < cur_n + 1:
                            continue
                        prob = float(parts[0])
                        words = tuple(parts[1: 1 + cur_n])
                        backoff = (float(parts[1 + cur_n])
                                   if len(parts) > 1 + cur_n else 0.0)
                    else:
                        prob = float(parts[0])
                        words = tuple(parts[1].split())
                        backoff = float(parts[2]) if len(parts) > 2 else 0.0
                    ngrams[words] = (prob, backoff)
        if order == 0:
            raise ValueError(f"{path}: no n-gram sections found")
        return cls(ngrams, order)

    def _word_logprob(self, context: tuple[str, ...], word: str) -> float:
        """log10 P(word | context) with Katz backoff."""
        while True:
            key = context + (word,)
            if key in self.ngrams:
                return self.ngrams[key][0]
            if not context:
                # OOV: use <unk> if present, else a floor
                if ("<unk>",) in self.ngrams:
                    return self.ngrams[("<unk>",)][0]
                return -7.0
            bo = self.ngrams.get(context, (0.0, 0.0))[1]
            context = context[1:]
            # accumulate backoff then retry shorter context
            return bo + self._word_logprob(context, word)

    def score(self, sentence: str, bos: bool = True, eos: bool = True
              ) -> float:
        """Total log10 prob of the sentence (kenlm-compatible API)."""
        words = sentence.split()
        if eos:
            words = words + ["</s>"]
        context: tuple[str, ...] = ("<s>",) if bos else ()
        total = 0.0
        for w in words:
            ctx = context[-(self.order - 1):] if self.order > 1 else ()
            total += self._word_logprob(ctx, w)
            context = context + (w,)
        return total

    def score_nats(self, sentence: str, **kw) -> float:
        return self.score(sentence, **kw) * LOG10
