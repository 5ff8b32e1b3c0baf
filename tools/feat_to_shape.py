#!/usr/bin/env python3
"""Scan a kaldi feats.scp and emit `<utt> <frames>,<dim>` shapes.

Own implementation of the reference's parallel shape scanner
(reference tools/feat_to_shape.sh + feat_to_shape.py via kaldiio):
reads only each matrix header (rows/cols), so the scan is O(1) IO per
utterance; a thread pool replaces the split-N-ways shell jobs.
"""

import argparse
import concurrent.futures as futures
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def mat_shape(path_with_offset: str) -> tuple[int, int]:
    if ":" in path_with_offset:
        path, offset = path_with_offset.rsplit(":", 1)
        offset = int(offset)
    else:
        path, offset = path_with_offset, 0
    with open(path, "rb") as f:
        f.seek(offset)
        if f.read(2) != b"\x00B":
            raise ValueError(f"{path}:{offset}: not binary kaldi")
        token = b""
        while not token.endswith(b" "):
            token += f.read(1)
        if token.strip() not in (b"FM", b"DM"):
            raise ValueError(f"unsupported token {token!r}")
        assert f.read(1) == b"\x04"
        rows = struct.unpack("<i", f.read(4))[0]
        assert f.read(1) == b"\x04"
        cols = struct.unpack("<i", f.read(4))[0]
    return rows, cols


def main():
    p = argparse.ArgumentParser()
    p.add_argument("feats_scp")
    p.add_argument("--output", default=None,
                   help="default <feats_scp>.shape")
    p.add_argument("--nj", type=int, default=16)
    args = p.parse_args()
    entries = []
    with open(args.feats_scp, encoding="utf-8") as f:
        for line in f:
            parts = line.split(None, 1)
            if len(parts) == 2:
                entries.append((parts[0], parts[1].strip()))
    with futures.ThreadPoolExecutor(args.nj) as pool:
        shapes = list(pool.map(lambda e: mat_shape(e[1]), entries))
    out = args.output or args.feats_scp + ".shape"
    with open(out, "w", encoding="utf-8") as f:
        for (utt, _), (r, c) in zip(entries, shapes):
            f.write(f"{utt} {r},{c}\n")
    print(f"{out}: {len(entries)} shapes", file=sys.stderr)


if __name__ == "__main__":
    main()
