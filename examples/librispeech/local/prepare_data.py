#!/usr/bin/env python3
"""LibriSpeech raw-corpus prep: extracted corpus dir -> kaldi data dir.

Walks LibriSpeech/<subset>/<speaker>/<chapter>/ for .flac files and the
chapter's .trans.txt, and writes wav.scp (pointing at the FLAC files
directly — the framework decodes FLAC first-party), text, utt2spk and
spk2utt. Replaces the reference's kaldi local/data_prep.sh.

Usage:
  python local/prepare_data.py /path/LibriSpeech/train-clean-100 \
      data/train_clean_100
Combine subsets into train_960 with:
  python tools/data_dir.py combine data/train_960 data/train_clean_100 ...
"""

import argparse
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("corpus_dir", help="e.g. LibriSpeech/train-clean-100")
    p.add_argument("data_dir", help="output kaldi-style dir")
    args = p.parse_args()

    wav_scp, text, utt2spk = {}, {}, {}
    for spk in sorted(os.listdir(args.corpus_dir)):
        spk_dir = os.path.join(args.corpus_dir, spk)
        if not os.path.isdir(spk_dir):
            continue
        for chap in sorted(os.listdir(spk_dir)):
            chap_dir = os.path.join(spk_dir, chap)
            if not os.path.isdir(chap_dir):
                continue
            trans = os.path.join(chap_dir, f"{spk}-{chap}.trans.txt")
            if os.path.exists(trans):
                with open(trans, encoding="utf-8") as f:
                    for line in f:
                        utt, _, sent = line.strip().partition(" ")
                        text[utt] = sent
            for fn in sorted(os.listdir(chap_dir)):
                if fn.endswith(".flac"):
                    utt = fn[:-5]
                    wav_scp[utt] = os.path.abspath(
                        os.path.join(chap_dir, fn))
                    utt2spk[utt] = spk
    missing = [u for u in wav_scp if u not in text]
    if missing:
        print(f"warning: {len(missing)} utts without transcript, dropped",
              file=sys.stderr)
        for u in missing:
            wav_scp.pop(u)
            utt2spk.pop(u)
    os.makedirs(args.data_dir, exist_ok=True)
    with open(os.path.join(args.data_dir, "wav.scp"), "w") as f:
        for u in sorted(wav_scp):
            f.write(f"{u} {wav_scp[u]}\n")
    with open(os.path.join(args.data_dir, "text"), "w",
              encoding="utf-8") as f:
        for u in sorted(wav_scp):
            f.write(f"{u} {text[u]}\n")
    with open(os.path.join(args.data_dir, "utt2spk"), "w") as f:
        for u in sorted(wav_scp):
            f.write(f"{u} {utt2spk[u]}\n")
    spk2utt = {}
    for u, s in utt2spk.items():
        spk2utt.setdefault(s, []).append(u)
    with open(os.path.join(args.data_dir, "spk2utt"), "w") as f:
        for s in sorted(spk2utt):
            f.write(f"{s} {' '.join(sorted(spk2utt[s]))}\n")
    print(f"{args.data_dir}: {len(wav_scp)} utts, {len(spk2utt)} speakers")


if __name__ == "__main__":
    main()
