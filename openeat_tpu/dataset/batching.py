"""Batch assembly: reference batching semantics + XLA shape bucketing.

Parity: reference openeat/dataset/dataset.py:337-368 — `dynamic` (fill a
batch until `max_frames_in_batch` total frames), `static` (fixed
batch_size), `shuffle` (static + shuffled order), over length-sorted
utterances.

TPU addition (SURVEY.md §7 step 3): every batch is padded to a bucketed
shape — time padded up to a multiple of `frame_bucket` frames, token
length to a multiple of `token_bucket` — so XLA compiles a bounded set
of program shapes instead of one per batch. Frame-budget semantics are
preserved; only the padding amount changes.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

from openeat_tpu.dataset.manifest import Utterance


def make_batches(utts: Sequence[Utterance], batch_type: str = "dynamic",
                 batch_size: int = 12, max_frames_in_batch: int = 10000,
                 seed: int = 777) -> list[list[Utterance]]:
    """Group utterances into batches (reference dataset.py:341-368)."""
    assert batch_type in ("static", "dynamic", "shuffle")
    utts = list(utts)
    if batch_type == "dynamic":
        assert max_frames_in_batch > 0
        batches: list[list[Utterance]] = [[]]
        acc = 0.0
        for u in utts:
            if acc + u.num_frames > max_frames_in_batch and batches[-1]:
                batches.append([])
                acc = 0.0
            batches[-1].append(u)
            acc += u.num_frames
        return [b for b in batches if b]
    if batch_type == "shuffle":
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(utts))
        utts = [utts[i] for i in order]
    return [utts[i: i + batch_size] for i in range(0, len(utts), batch_size)]


def round_up(n: int, multiple: int) -> int:
    return int(math.ceil(max(n, 1) / multiple) * multiple)


def bucket_samples(n: int, sample_rate: int = 16000,
                   bucket_ms: int = 1000) -> int:
    """Pad a sample count up to the next `bucket_ms` boundary."""
    return round_up(n, int(sample_rate * bucket_ms / 1000))


def pad_batch_1d(arrays: list[np.ndarray], pad_value,
                 bucket: int, dtype) -> tuple[np.ndarray, np.ndarray]:
    """Stack variable-length 1-D arrays into [B, round_up(maxlen,bucket)]."""
    lens = np.array([len(a) for a in arrays], np.int32)
    width = round_up(int(lens.max()), bucket)
    out = np.full((len(arrays), width), pad_value, dtype)
    for i, a in enumerate(arrays):
        out[i, : len(a)] = a
    return out, lens


def pad_batch_2d(arrays: list[np.ndarray], pad_value, bucket: int,
                 dtype) -> tuple[np.ndarray, np.ndarray]:
    """Stack [Ti, F] feature matrices into [B, round_up(maxT,bucket), F]."""
    lens = np.array([a.shape[0] for a in arrays], np.int32)
    width = round_up(int(lens.max()), bucket)
    f = arrays[0].shape[1]
    out = np.full((len(arrays), width, f), pad_value, dtype)
    for i, a in enumerate(arrays):
        out[i, : a.shape[0]] = a
    return out, lens
