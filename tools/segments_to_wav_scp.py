#!/usr/bin/env python3
"""segments + wav.scp -> segment-sliced wav.scp (`path,start,end`).

Drop-in for reference tools/segments_to_wav_scp.py:1-13; the output
`path,start,end` entries are understood by the manifest/collate layer
(dataset/manifest.py:parse_wav_entry).
"""

import argparse
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("segments")
    p.add_argument("wav_scp")
    p.add_argument("out", nargs="?", default=None)
    args = p.parse_args()
    wavs = {}
    with open(args.wav_scp, encoding="utf-8") as f:
        for line in f:
            parts = line.split(None, 1)
            if len(parts) == 2:
                wavs[parts[0]] = parts[1].strip()
    out = open(args.out, "w") if args.out else sys.stdout
    with open(args.segments, encoding="utf-8") as f:
        for line in f:
            utt, rec, start, end = line.split()
            out.write(f"{utt} {wavs[rec]},{start},{end}\n")
    if args.out:
        out.close()


if __name__ == "__main__":
    main()
