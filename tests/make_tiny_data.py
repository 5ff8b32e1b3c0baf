"""Synthetic tiny dataset builder for integration tests and CLI drives.

Creates wavs + a kaldi-style `format.data` manifest + a char dict under a
target directory. Utterances are sine/noise mixtures, transcripts are
random strings over a small Mandarin+English vocab, so the whole
train->decode loop can run hermetically (no external corpora).
"""

from __future__ import annotations

import os

import numpy as np

from openeat_tpu.dataset.audio import write_wav

CHARS = list("你好我们他去学校吃饭天气很好")
WORDS = ["HELLO", "WORLD", "GOOD", "DAY"]


def build(root: str, n_utts: int = 24, rate: int = 16000,
          seed: int = 0, min_dur: float = 0.6,
          max_dur: float = 2.0) -> dict:
    rng = np.random.default_rng(seed)
    wav_dir = os.path.join(root, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    lines = []
    texts = {}
    for i in range(n_utts):
        dur = float(rng.uniform(min_dur, max_dur))
        n = int(dur * rate)
        freq = float(rng.uniform(100, 2000))
        t = np.arange(n) / rate
        x = (0.3 * np.sin(2 * np.pi * freq * t)
             + 0.05 * rng.standard_normal(n)).astype(np.float32)
        key = f"utt{i:04d}"
        path = os.path.join(wav_dir, key + ".wav")
        write_wav(path, x, rate)
        n_char = int(rng.integers(2, 8))
        toks = [CHARS[int(rng.integers(len(CHARS)))] for _ in range(n_char)]
        if rng.random() < 0.3:
            toks.append(" " + WORDS[int(rng.integers(len(WORDS)))])
        text = "".join(toks)
        texts[key] = text
        lines.append(f"utt:{key}\tfeat:{path}\tfeat_shape:{dur:.3f}\t"
                     f"text:{text}")
    manifest = os.path.join(root, "format.data")
    with open(manifest, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    # char dict: <blank>=0, <unk>=1, chars..., <sos/eos>=last
    vocab = ["<blank>", "<unk>"] + CHARS + WORDS + ["<sos/eos>"]
    dict_path = os.path.join(root, "dict.txt")
    with open(dict_path, "w", encoding="utf-8") as f:
        for i, tok in enumerate(vocab):
            f.write(f"{tok} {i}\n")
    text_path = os.path.join(root, "text")
    with open(text_path, "w", encoding="utf-8") as f:
        for k, v in texts.items():
            f.write(f"{k} {v}\n")
    return {"manifest": manifest, "dict": dict_path, "text": text_path,
            "vocab_size": len(vocab), "texts": texts}


if __name__ == "__main__":
    import sys
    out = build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny_data")
    print(out["manifest"], out["dict"], out["vocab_size"])
