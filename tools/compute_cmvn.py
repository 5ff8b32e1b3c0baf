#!/usr/bin/env python3
"""Compute global CMVN statistics from a format.data manifest.

Completes the CMVN story: the reference consumes WeNet/kaldi-produced
stats files (openeat/utils/cmvn.py loaders); this produces them
first-party by streaming the corpus through the device fbank frontend
and accumulating sum / sum-of-squares / frame counts, written in the
WeNet JSON format `{mean_stat, var_stat, frame_num}` that
openeat_tpu.utils.cmvn.load_cmvn (and WeNet itself) reads.

Stats are over RAW fbank output (no per-utterance normalization) —
the WeNet convention. bin/train.py therefore disables per-utterance
normalization whenever --cmvn_file is given, and rejects an explicit
`normalization: true` alongside it.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("manifest", help="format.data file (wav entries)")
    p.add_argument("output", help="output cmvn json")
    p.add_argument("--mel_bins", type=int, default=80)
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_utts", type=int, default=0, help="0 = all")
    args = p.parse_args()

    from openeat_tpu.dataset.batching import pad_batch_1d
    from openeat_tpu.dataset.dataset import AudioCollate
    from openeat_tpu.dataset.manifest import parse_manifest, parse_wav_entry
    from openeat_tpu.ops.fbank import fbank

    utts = parse_manifest(args.manifest, {"<unk>": 1}, max_length=10 ** 9,
                          token_min_length=-1, sort=False)
    if args.max_utts:
        utts = utts[: args.max_utts]
    collate = AudioCollate(resample_rate=args.sample_rate)

    @jax.jit
    def stats(wav, lens):
        feats, flens = fbank(wav, lens, sample_rate=args.sample_rate,
                             num_mel_bins=args.mel_bins)
        valid = (jnp.arange(feats.shape[1])[None, :]
                 < flens[:, None])[..., None]
        feats = jnp.where(valid, feats, 0.0)
        return (jnp.sum(feats, axis=(0, 1)),
                jnp.sum(feats * feats, axis=(0, 1)),
                jnp.sum(flens))

    mean_stat = np.zeros(args.mel_bins, np.float64)
    var_stat = np.zeros(args.mel_bins, np.float64)
    frames = 0
    for i in range(0, len(utts), args.batch_size):
        chunk = utts[i: i + args.batch_size]
        _, batch = collate(chunk)
        s, ss, n = stats(jnp.asarray(batch["wav"]),
                         jnp.asarray(batch["wav_lens"]))
        mean_stat += np.asarray(s, np.float64)
        var_stat += np.asarray(ss, np.float64)
        frames += int(n)
        if (i // args.batch_size) % 50 == 0:
            print(f"{i + len(chunk)}/{len(utts)} utts", file=sys.stderr)
    with open(args.output, "w") as f:
        json.dump({"mean_stat": mean_stat.tolist(),
                   "var_stat": var_stat.tolist(),
                   "frame_num": frames}, f)
    print(f"{args.output}: {frames} frames from {len(utts)} utts",
          file=sys.stderr)


if __name__ == "__main__":
    main()
