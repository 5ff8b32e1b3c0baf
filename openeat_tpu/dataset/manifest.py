"""format.data manifest parsing.

Parity: reference openeat/dataset/dataset.py:304-336 and
tools/format_data.sh:131-165 — each line is tab-separated
`utt:<id>  feat:<path>  feat_shape:<dur_s | frames,dim>  text:<...>`
(4 fields, tokenized on the fly) or the 7-field variant with
pre-tokenized `token:`/`tokenid:`/`token_shape:` columns. wav entries may
carry `path,start,end` segment slices (dataset.py:57-70).

Length filtering, offline speed-perturb expansion (one entry per speed,
without the reference's compounding `num_frames *= speed` bug,
dataset.py:334-336) and sorting happen here; batching lives in
openeat_tpu.dataset.batching.
"""

from __future__ import annotations

import codecs
from dataclasses import dataclass
from typing import Optional

import numpy as np

from openeat_tpu.dataset.text import text_to_token_ids


@dataclass
class Utterance:
    key: str
    path: str              # wav path or 'ark_path:offset'
    num_frames: float      # 10ms frames (estimated for wav)
    token_ids: list[int]
    speed: float = 1.0
    feat_dim: int = 0      # >0 for precomputed-feature entries


def parse_manifest(data_file: str, char_dict: dict[str, int], bpe=None,
                   max_length: float = 10240, min_length: float = 0,
                   token_max_length: int = 200, token_min_length: int = 0,
                   speed_perturb: bool = False,
                   speeds=(0.9, 1.1, 0.1),
                   data_type: str = "wav",
                   sort: bool = True) -> list[Utterance]:
    if speed_perturb:
        speed_list = [float(s) for s in
                      np.arange(speeds[0], speeds[1], speeds[2])]
    else:
        speed_list = [1.0]
    utts: list[Utterance] = []
    with codecs.open(data_file, "r", encoding="utf-8") as f:
        for line in f:
            arr = line.strip().split("\t")
            if len(arr) not in (4, 7):
                continue
            key = arr[0].split(":", 1)[1]
            path = arr[1].split(":", 1)[1]
            if len(arr) == 4:
                text = arr[3].split(":", 1)[1]
                token_ids = text_to_token_ids(text, char_dict, bpe)
            else:
                token_ids = [int(t) for t in arr[5].split(":", 1)[1].split()]
            shape = arr[2].split(":", 1)[1]
            if data_type == "wav":
                num_frames = float(shape) * 1000.0 / 10.0
                feat_dim = 0
            else:
                parts = shape.split(",")
                num_frames = int(parts[0].strip())
                feat_dim = int(parts[1].strip())
            if not (min_length < num_frames < max_length):
                continue
            if not (token_min_length < len(token_ids) < token_max_length):
                continue
            for speed in speed_list:
                # duration scales by 1/speed under sox-style speed perturb
                n = num_frames / speed if data_type == "wav" else num_frames
                utts.append(Utterance(key, path, n, token_ids, speed,
                                      feat_dim))
    if sort:
        utts.sort(key=lambda u: u.num_frames)
    return utts


def parse_wav_entry(path: str) -> tuple[str, Optional[float], Optional[float]]:
    """'file.wav' or 'file.wav,start_s,end_s' (dataset.py:57-70)."""
    parts = path.split(",")
    if len(parts) == 3:
        return parts[0], float(parts[1]), float(parts[2])
    return parts[0], None, None
