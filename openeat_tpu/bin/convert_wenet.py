"""Convert a WeNet / reference PyTorch .pt checkpoint to openeat_tpu.

Usage:
  python -m openeat_tpu.bin.convert_wenet --pt final.pt --d_model 256 \
      --out exp/wenet_import/converted

The output is a regular framework checkpoint usable with --checkpoint
for fine-tuning (reference train.py:173-185 partial init + adapter
freeze) or directly with bin/recognize for decoding
(reference examples/wenet_pre-trained_decoding/run.sh:60-97).
"""

from __future__ import annotations

import argparse
import os

from openeat_tpu.utils import checkpoint as ckpt_lib
from openeat_tpu.utils.common import init_logger
from openeat_tpu.utils.wenet_convert import load_wenet_checkpoint


def get_parser():
    p = argparse.ArgumentParser(description="convert WeNet .pt checkpoint")
    p.add_argument("--pt", required=True, help="torch checkpoint path")
    p.add_argument("--d_model", type=int, default=256)
    p.add_argument("--out", required=True,
                   help="output checkpoint directory path")
    p.add_argument("--wenet_config", default=None,
                   help="released train.yaml; when given, an adapted "
                        "framework train.yaml is written next to --out")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    logger = init_logger()
    params = load_wenet_checkpoint(args.pt, args.d_model)
    n = len([1 for _ in _iter_leaves(params)])
    out_dir, tag = os.path.split(os.path.abspath(args.out))
    path = ckpt_lib.save_checkpoint(out_dir, tag, params,
                                    {"source": args.pt, "tensors": n})
    logger.info("converted %d tensors -> %s", n, path)
    if args.wenet_config:
        import yaml

        from openeat_tpu.config import save_config
        from openeat_tpu.utils.wenet_convert import (convert_wenet_config,
                                                     is_wenet_config)
        with open(args.wenet_config) as f:
            wcfg = yaml.safe_load(f) or {}
        cfg = convert_wenet_config(wcfg) if is_wenet_config(wcfg) else wcfg
        conf_path = os.path.join(out_dir, "train.yaml")
        save_config(cfg, conf_path)
        logger.info("adapted config -> %s", conf_path)


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
