#!/usr/bin/env python3
"""Scan a wav.scp and emit `<utt> <seconds>` durations.

Drop-in for the reference's split-N-ways shell scanner
(reference tools/wav_to_duration.sh + wav2dur.py): header-only reads
(no decode) through a thread pool.
"""

import argparse
import concurrent.futures as futures
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from format_data import read_scp, wav_duration  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("wav_scp")
    p.add_argument("out", nargs="?", default=None, help="default stdout")
    p.add_argument("--nj", type=int, default=16)
    args = p.parse_args()
    wavs = read_scp(args.wav_scp)
    with futures.ThreadPoolExecutor(args.nj) as pool:
        durs = list(pool.map(wav_duration, wavs.values()))
    out = open(args.out, "w") if args.out else sys.stdout
    for utt, dur in zip(wavs, durs):
        out.write(f"{utt} {dur:.3f}\n")
    if args.out:
        out.close()


if __name__ == "__main__":
    main()
