"""Checkpoint averaging CLI.

Parity: reference openeat/bin/average_model.py:38-115 — average the
best-N checkpoints by cv_loss (--val_best) or the last N in an epoch
range, writing a new checkpoint directory.
"""

from __future__ import annotations

import argparse

from openeat_tpu.utils import checkpoint as ckpt_lib
from openeat_tpu.utils.common import init_logger


def get_parser():
    p = argparse.ArgumentParser(description="average checkpoints")
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--dst", required=True,
                   help="output checkpoint name (e.g. avg_best5)")
    p.add_argument("--num", type=int, default=5)
    p.add_argument("--val_best", action="store_true")
    p.add_argument("--min_epoch", type=int, default=0)
    p.add_argument("--max_epoch", type=int, default=10 ** 9)
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    logger = init_logger()
    avg = ckpt_lib.average_checkpoints(
        args.exp_dir, args.num, args.val_best, args.min_epoch,
        args.max_epoch)
    path = ckpt_lib.save_checkpoint(
        args.exp_dir, args.dst, avg,
        {"averaged": args.num, "val_best": bool(args.val_best)})
    logger.info("wrote %s", path)


if __name__ == "__main__":
    main()
