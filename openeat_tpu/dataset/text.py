"""Text processing: CJK+BPE mixed tokenization, punctuation stripping.

Parity: reference openeat/dataset/text_processor.py:2-38 — text is
uppercased and split on CJK characters; each CJK char is one token,
non-CJK spans are BPE-encoded (or kept whole without a BPE model);
punctuation (Chinese + ASCII, keeping apostrophes) is removed; `<unk>`
survives punctuation stripping and maps to '#'-marked tokens.

The BPE backend is sentencepiece when available, else the first-party
openeat_tpu.dataset.bpe model (same `▁` word-boundary convention).
"""

from __future__ import annotations

import re
from string import punctuation as _ascii_punct

CJK_PATTERN = re.compile(r"([一-鿿])")

# Chinese/fullwidth punctuation (zhon.hanzi.punctuation equivalent set)
_CN_PUNCT = (
    "＂＃＄％＆＇（）＊＋，－／：；＜＝＞＠［＼］＾＿｀｛｜｝～｟｠｢｣､、〃〈〉《》"
    "「」『』【】〔〕〖〗〘〙〚〛〜〝〞〟〰〾〿–—‘’‛“”„‟…‧﹏﹑﹔·！？｡。")
_EN_PUNCT = _ascii_punct.replace("'", "")  # keep apostrophes (I'M)
_PUNCT_RE = re.compile("[%s]+" % re.escape(_CN_PUNCT + _EN_PUNCT))


def remove_punctuation(text: str) -> str:
    """Strip CN+EN punctuation, keep apostrophes (text_processor.py:24-37)."""
    return _PUNCT_RE.sub("", text).replace("\\", "")


def tokenize(text: str, bpe=None) -> list[str]:
    """CJK chars individually; non-CJK spans BPE-encoded
    (text_processor.py:2-22). `bpe` must expose encode_as_pieces()."""
    tokens: list[str] = []
    chars = CJK_PATTERN.split(text.upper())
    for span in (w for w in chars if len(w.strip()) > 0):
        if "#" in span or CJK_PATTERN.fullmatch(span) is not None:
            tokens.append(span)
        elif bpe is not None:
            tokens.extend(bpe.encode_as_pieces(span))
        else:
            tokens.append(span.strip())
    return tokens


def text_to_token_ids(text: str, char_dict: dict[str, int], bpe=None,
                      unk: str = "<unk>") -> list[int]:
    """Full reference pipeline (dataset.py:313-317): protect <unk>,
    strip punctuation, tokenize, map to ids with unk fallback."""
    text = text.replace(unk, "\x00")
    text = remove_punctuation(text)
    text = text.replace("\x00", "#")
    tokens = tokenize(text, bpe)
    unk_id = char_dict.get(unk, 1)
    return [char_dict.get(t, unk_id) for t in tokens]


def load_dict(path: str) -> dict[str, int]:
    """Load `<token> <id>` dict file (recipe stage 1 format)."""
    d = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) == 2:
                d[parts[0]] = int(parts[1])
    return d


def token_ids_to_text(ids, id2tok: dict[int, str], eos_id: int | None = None,
                      bpe_join: bool = True) -> str:
    """ids -> text; stops at eos; re-joins '▁' BPE pieces with spaces
    (reference recipe WER stage rejoin, librispeech/run.sh:192-194)."""
    toks = []
    for i in ids:
        i = int(i)
        if eos_id is not None and i == eos_id:
            break
        toks.append(id2tok.get(i, "<unk>"))
    s = "".join(toks)
    if bpe_join:
        s = s.replace("▁", " ").strip()
    return s
