#!/usr/bin/env python3
"""AIShell-1 data preparation: raw corpus -> kaldi-style data dirs.

Own implementation of the reference's prep stage
(reference examples/aishell/local/aishell_data_prep.sh:31-63): scans
`wav/{train,dev,test}/SSSS/*.wav` and the transcript file, writes
wav.scp / text / utt2spk per split.
"""

import argparse
import glob
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("wav_dir", help=".../data_aishell/wav")
    p.add_argument("transcript",
                   help=".../data_aishell/transcript/aishell_transcript_v0.8.txt")
    p.add_argument("out_dir", help="output root (data/)")
    args = p.parse_args()

    trans = {}
    with open(args.transcript, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if len(parts) == 2:
                trans[parts[0]] = parts[1].replace(" ", "")

    for split in ("train", "dev", "test"):
        wavs = sorted(glob.glob(os.path.join(args.wav_dir, split,
                                             "*", "*.wav")))
        out = os.path.join(args.out_dir, split)
        os.makedirs(out, exist_ok=True)
        n_miss = 0
        with open(os.path.join(out, "wav.scp"), "w") as fw, \
                open(os.path.join(out, "text"), "w", encoding="utf-8") as ft, \
                open(os.path.join(out, "utt2spk"), "w") as fu:
            for wav in wavs:
                utt = os.path.splitext(os.path.basename(wav))[0]
                if utt not in trans:
                    n_miss += 1
                    continue
                spk = os.path.basename(os.path.dirname(wav))
                fw.write(f"{utt} {wav}\n")
                ft.write(f"{utt} {trans[utt]}\n")
                fu.write(f"{utt} {spk}\n")
        print(f"{split}: {len(wavs) - n_miss} utts "
              f"({n_miss} missing transcripts)", file=sys.stderr)


if __name__ == "__main__":
    main()
