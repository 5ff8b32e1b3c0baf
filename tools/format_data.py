#!/usr/bin/env python3
"""Build the tab-separated `format.data` manifest from a kaldi-style
data directory.

Own implementation of the reference's shell pipeline
(reference tools/format_data.sh:75-165 + merge_scp2txt.py): reads
wav.scp (+ optional segments) and text, computes durations (or takes
feats.scp + shapes for precomputed features), and writes lines

  utt:<id>\tfeat:<path[,start,end]>\tfeat_shape:<dur|frames,dim>\ttext:<text>

which openeat_tpu.dataset.manifest parses. Durations come from WAV
headers directly (no decode) so the scan is IO-light; a thread pool
replaces the reference's split-N-ways parallel shell jobs
(tools/wav_to_duration.sh).
"""

import argparse
import concurrent.futures as futures
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def wav_duration(path: str) -> float:
    """Duration in seconds from the header only: RIFF `data` chunk size
    or FLAC STREAMINFO total-samples (no PCM decode either way)."""
    with open(path, "rb") as f:
        riff = f.read(12)
        if riff[:4] == b"fLaC":
            f.seek(4)
            si = f.read(4 + 34)  # first block header + STREAMINFO
            if (si[0] & 0x7F) != 0:
                raise ValueError(f"{path}: FLAC without leading STREAMINFO")
            s = si[4:]
            rate = (s[10] << 12) | (s[11] << 4) | (s[12] >> 4)
            total = ((s[13] & 0x0F) << 32) | int.from_bytes(s[14:18], "big")
            if rate == 0 or total == 0:
                raise ValueError(f"{path}: FLAC missing rate/total samples")
            return total / rate
        if riff[:4] != b"RIFF":
            raise ValueError(f"{path}: not RIFF")
        rate = None
        bytes_per_frame = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
            if cid == b"fmt ":
                fmt = f.read(size)
                _, ch, rate = struct.unpack("<HHI", fmt[:8])
                bits = struct.unpack("<H", fmt[14:16])[0]
                bytes_per_frame = ch * bits // 8
            elif cid == b"data":
                if rate is None:
                    raise ValueError(f"{path}: data before fmt")
                return size / (rate * bytes_per_frame)
            else:
                f.seek(size + (size & 1), 1)
    raise ValueError(f"{path}: no data chunk")


def read_scp(path: str) -> dict:
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(None, 1)
            if len(parts) == 2:
                out[parts[0]] = parts[1]
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("data_dir", help="kaldi dir with wav.scp/text[/segments]")
    p.add_argument("--output", default=None,
                   help="output manifest (default <data_dir>/format.data)")
    p.add_argument("--feats_scp", default=None,
                   help="use precomputed features instead of wavs")
    p.add_argument("--feat_dim", type=int, default=80)
    p.add_argument("--nj", type=int, default=16)
    args = p.parse_args()

    text = read_scp(os.path.join(args.data_dir, "text"))
    out_path = args.output or os.path.join(args.data_dir, "format.data")

    lines = []
    if args.feats_scp:
        feats = read_scp(args.feats_scp)
        shapes_path = args.feats_scp + ".shape"
        shapes = read_scp(shapes_path) if os.path.exists(shapes_path) else {}
        for utt, feat in feats.items():
            if utt not in text:
                continue
            shape = shapes.get(utt, f"0,{args.feat_dim}")
            lines.append(f"utt:{utt}\tfeat:{feat}\tfeat_shape:{shape}\t"
                         f"text:{text[utt]}")
    else:
        wavs = read_scp(os.path.join(args.data_dir, "wav.scp"))
        seg_path = os.path.join(args.data_dir, "segments")
        if os.path.exists(seg_path):
            entries = []
            with open(seg_path, encoding="utf-8") as f:
                for line in f:
                    utt, rec, start, end = line.split()
                    entries.append((utt, f"{wavs[rec]},{start},{end}",
                                    float(end) - float(start)))
        else:
            with futures.ThreadPoolExecutor(args.nj) as pool:
                durs = dict(zip(wavs, pool.map(
                    lambda p: wav_duration(p), wavs.values())))
            entries = [(u, p, durs[u]) for u, p in wavs.items()]
        for utt, path, dur in entries:
            if utt not in text:
                continue
            lines.append(f"utt:{utt}\tfeat:{path}\tfeat_shape:{dur:.3f}\t"
                         f"text:{text[utt]}")
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(f"{out_path}: {len(lines)} utterances", file=sys.stderr)


if __name__ == "__main__":
    main()
