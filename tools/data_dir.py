#!/usr/bin/env python3
"""Kaldi-style data-directory utilities in one CLI.

Own implementations of the reference's shell/perl data-dir tooling
(reference tools/: fix_data_dir.sh, validate_data_dir.sh,
subset_data_dir.sh, subset_data_dir_tr_cv.sh, combine_data.sh,
filter_scp.pl, shuffle_list.pl, utt2spk_to_spk2utt.pl,
spk2utt_to_utt2spk.pl — SURVEY.md §2.5):

  data_dir.py validate <dir>           consistency checks
  data_dir.py fix <dir>                intersect keys, rewrite sorted
  data_dir.py subset <dir> <out> --n N [--random]
  data_dir.py combine <out> <dir1> <dir2>...
  data_dir.py tr_cv_split <dir> <tr_out> <cv_out> --cv_spk_frac 0.1
  data_dir.py filter <key_list> <scp>  keep lines whose key is listed
  data_dir.py shuffle <scp> [--seed N]
  data_dir.py utt2spk_to_spk2utt <file> / spk2utt_to_utt2spk <file>
"""

from __future__ import annotations

import argparse
import os
import random
import sys

FILES = ("wav.scp", "text", "utt2spk", "segments", "feats.scp")


def read_kv(path):
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(None, 1)
            if parts:
                out[parts[0]] = parts[1] if len(parts) > 1 else ""
    return out


def write_kv(path, kv):
    with open(path, "w", encoding="utf-8") as f:
        for k in sorted(kv):
            f.write(f"{k} {kv[k]}\n".rstrip() + "\n")


def present_files(d):
    return [f for f in FILES if os.path.exists(os.path.join(d, f))]


def cmd_validate(args):
    d = args.dir
    files = present_files(d)
    if "text" not in files or not ({"wav.scp", "feats.scp"} & set(files)):
        print(f"{d}: missing text or wav.scp/feats.scp", file=sys.stderr)
        return 1
    tables = {f: read_kv(os.path.join(d, f)) for f in files}
    ok = True
    for f, kv in tables.items():
        keys = list(kv)
        if keys != sorted(keys):
            print(f"{d}/{f}: not sorted", file=sys.stderr)
            ok = False
        if len(set(keys)) != len(keys):
            print(f"{d}/{f}: duplicate keys", file=sys.stderr)
            ok = False
        empty = [k for k, v in kv.items() if not v.strip()]
        if empty:
            print(f"{d}/{f}: {len(empty)} empty values "
                  f"(e.g. {empty[0]})", file=sys.stderr)
            ok = False
    key_sets = {f: set(tables[f]) for f in files if f != "segments"}
    base = set.intersection(*key_sets.values())
    for f, s in key_sets.items():
        extra = s - base
        if extra:
            print(f"{d}/{f}: {len(extra)} utts missing from other files",
                  file=sys.stderr)
            ok = False
    print(f"{d}: {'OK' if ok else 'INVALID'} "
          f"({len(base)} consistent utts)", file=sys.stderr)
    return 0 if ok else 1


def cmd_fix(args):
    d = args.dir
    files = present_files(d)
    tables = {f: read_kv(os.path.join(d, f)) for f in files}
    keep = set.intersection(*[set(tables[f]) for f in files
                              if f != "segments"])
    for f in files:
        kv = {k: v for k, v in tables[f].items()
              if k in keep or f == "segments"}
        write_kv(os.path.join(d, f), kv)
    print(f"{d}: kept {len(keep)} utts", file=sys.stderr)
    return 0


def cmd_subset(args):
    files = present_files(args.dir)
    tables = {f: read_kv(os.path.join(args.dir, f)) for f in files}
    keys = sorted(tables["text"])
    if args.random:
        random.Random(args.seed).shuffle(keys)
    keys = set(keys[: args.n])
    os.makedirs(args.out, exist_ok=True)
    for f in files:
        write_kv(os.path.join(args.out, f),
                 {k: v for k, v in tables[f].items() if k in keys})
    return 0


def cmd_combine(args):
    os.makedirs(args.out, exist_ok=True)
    for f in FILES:
        merged = {}
        found = False
        for d in args.dirs:
            p = os.path.join(d, f)
            if os.path.exists(p):
                found = True
                merged.update(read_kv(p))
        if found:
            write_kv(os.path.join(args.out, f), merged)
    return 0


def cmd_tr_cv_split(args):
    """Speaker-disjoint train/cv split (subset_data_dir_tr_cv.sh)."""
    files = present_files(args.dir)
    tables = {f: read_kv(os.path.join(args.dir, f)) for f in files}
    utt2spk = tables.get("utt2spk")
    if not utt2spk:
        print("tr_cv_split needs utt2spk", file=sys.stderr)
        return 1
    spks = sorted(set(utt2spk.values()))
    random.Random(args.seed).shuffle(spks)
    n_cv = max(1, int(len(spks) * args.cv_spk_frac))
    cv_spks = set(spks[:n_cv])
    cv_keys = {u for u, s in utt2spk.items() if s in cv_spks}
    for out, pred in ((args.tr_out, lambda k: k not in cv_keys),
                      (args.cv_out, lambda k: k in cv_keys)):
        os.makedirs(out, exist_ok=True)
        for f in files:
            write_kv(os.path.join(out, f),
                     {k: v for k, v in tables[f].items() if pred(k)})
    print(f"train spks {len(spks) - n_cv}, cv spks {n_cv}",
          file=sys.stderr)
    return 0


def cmd_filter(args):
    keys = set(read_kv(args.key_list))
    with open(args.scp, encoding="utf-8") as f:
        for line in f:
            if line.split(None, 1)[0] in keys:
                sys.stdout.write(line)
    return 0


def cmd_shuffle(args):
    with open(args.scp, encoding="utf-8") as f:
        lines = f.readlines()
    random.Random(args.seed).shuffle(lines)
    sys.stdout.writelines(lines)
    return 0


def cmd_utt2spk_to_spk2utt(args):
    u2s = read_kv(args.file)
    s2u: dict[str, list] = {}
    for u, s in u2s.items():
        s2u.setdefault(s, []).append(u)
    for s in sorted(s2u):
        print(s, " ".join(sorted(s2u[s])))
    return 0


def cmd_spk2utt_to_utt2spk(args):
    s2u = read_kv(args.file)
    pairs = []
    for s, us in s2u.items():
        pairs.extend((u, s) for u in us.split())
    for u, s in sorted(pairs):
        print(u, s)
    return 0


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("validate"); s.add_argument("dir")
    s = sub.add_parser("fix"); s.add_argument("dir")
    s = sub.add_parser("subset")
    s.add_argument("dir"); s.add_argument("out")
    s.add_argument("--n", type=int, required=True)
    s.add_argument("--random", action="store_true")
    s.add_argument("--seed", type=int, default=777)
    s = sub.add_parser("combine")
    s.add_argument("out"); s.add_argument("dirs", nargs="+")
    s = sub.add_parser("tr_cv_split")
    s.add_argument("dir"); s.add_argument("tr_out"); s.add_argument("cv_out")
    s.add_argument("--cv_spk_frac", type=float, default=0.1)
    s.add_argument("--seed", type=int, default=777)
    s = sub.add_parser("filter")
    s.add_argument("key_list"); s.add_argument("scp")
    s = sub.add_parser("shuffle")
    s.add_argument("scp"); s.add_argument("--seed", type=int, default=777)
    s = sub.add_parser("utt2spk_to_spk2utt"); s.add_argument("file")
    s = sub.add_parser("spk2utt_to_utt2spk"); s.add_argument("file")
    args = p.parse_args()
    sys.exit(globals()[f"cmd_{args.cmd}"](args))


if __name__ == "__main__":
    main()
