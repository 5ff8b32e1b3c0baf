"""Language-model training entry point.

Parity: reference openeat/bin/train_lm.py:46-171 (intended behavior —
the reference's undefined DataLoaderX and wrong executor arity,
train_lm.py:86,152, are bugs per SURVEY.md): TextDataset + masking
collate + LanguageModel + the same epoch/checkpoint loop as bin/train.
"""

from __future__ import annotations

import argparse
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml

from openeat_tpu.config import TrainConfig, load_config
from openeat_tpu.dataset.bpe import load_bpe
from openeat_tpu.dataset.dataset import PrefetchLoader, TextCollate, \
    TextDataset
from openeat_tpu.dataset.text import load_dict
from openeat_tpu.models.language_model import build_language_model
from openeat_tpu.utils import checkpoint as ckpt_lib
from openeat_tpu.utils.common import init_logger
from openeat_tpu.utils.optim import build_optimizer


def get_parser():
    p = argparse.ArgumentParser(description="train a language model (TPU)")
    p.add_argument("--config", required=True)
    p.add_argument("--train_data", required=True)
    p.add_argument("--cv_data", required=True)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--dict", dest="dict_path", required=True)
    p.add_argument("--bpe_model", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--max_epoch", type=int, default=None)
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    os.makedirs(args.exp_dir, exist_ok=True)
    logger = init_logger(log_file=os.path.join(args.exp_dir, "train.log"))
    cfg = load_config(args.config)
    train_cfg = TrainConfig.from_dict(cfg)
    if args.max_epoch is not None:
        train_cfg.max_epoch = args.max_epoch
    char_dict = load_dict(args.dict_path)
    bpe = load_bpe(args.bpe_model)
    model_conf = dict(cfg.get("model_conf", {}) or {})
    dataset_conf = dict(cfg.get("dataset_conf", {}) or {})
    autoregressive = model_conf.get("autoregressive", True)

    ds_kwargs = dict(
        token_max_length=dataset_conf.get("token_max_length", 200),
        token_min_length=dataset_conf.get("token_min_length", 0),
        batch_size=dataset_conf.get("batch_size", 32),
        sort=dataset_conf.get("sort", True))
    train_ds = TextDataset(args.train_data, char_dict, bpe, **ds_kwargs)
    cv_ds = TextDataset(args.cv_data, char_dict, bpe, **ds_kwargs)
    collate = TextCollate(len(char_dict), autoregressive,
                          seed=train_cfg.seed)
    logger.info("train batches %d cv batches %d", len(train_ds), len(cv_ds))

    model = build_language_model(model_conf, len(char_dict))
    with open(os.path.join(args.exp_dir, "train.yaml"), "w") as f:
        resolved = dict(cfg)
        resolved["vocab_size"] = len(char_dict)
        yaml.safe_dump(resolved, f, sort_keys=False)

    example = collate(train_ds[0])
    init_args = (jnp.asarray(example["tokens"]),
                 jnp.asarray(example["tokens_length"]),
                 jnp.asarray(example["masked_targets"])
                 if "masked_targets" in example else None)
    params = jax.jit(model.init)(jax.random.PRNGKey(train_cfg.seed),
                                 *init_args)
    steps_per_epoch = max(len(train_ds), 1)
    warmup = (train_cfg.warmup_steps if train_cfg.warmup_steps
              else int(train_cfg.warmup_epoch * steps_per_epoch))
    tx, schedule = build_optimizer(train_cfg.lr, warmup, train_cfg.optim,
                                   params)
    opt_state = tx.init(params)
    if args.checkpoint:
        params, _ = ckpt_lib.load_checkpoint(args.checkpoint, params)

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            m = model.apply(p, batch["tokens"], batch["tokens_length"],
                            batch.get("masked_targets"),
                            deterministic=False, rngs={"dropout": rng})
            return m["loss"], m
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm)
        scale = jnp.where(finite, jnp.minimum(
            1.0, train_cfg.grad_clip / jnp.maximum(gnorm, 1e-12)), 0.0)
        grads = jax.tree.map(lambda g: g * scale, grads)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, metrics

    @jax.jit
    def eval_step(params, batch):
        return model.apply(params, batch["tokens"], batch["tokens_length"],
                           batch.get("masked_targets"))

    step = 0
    rng = jax.random.PRNGKey(train_cfg.seed)
    for epoch in range(train_cfg.max_epoch):
        loader = PrefetchLoader(train_ds, collate, args.num_workers,
                                shuffle_batches=True,
                                seed=train_cfg.seed + epoch)
        t0, losses = time.time(), []
        for batch in loader:
            rng, k = jax.random.split(rng)
            params, opt_state, metrics = train_step(params, opt_state,
                                                    batch, k)
            step += 1
            if step % train_cfg.log_interval == 0:
                m = jax.device_get(metrics)
                logger.info("epoch %d step %d loss %.4f acc %.4f", epoch,
                            step, float(m["loss"]), float(m["acc"]))
        cv_losses, cv_accs, n = [], [], 0
        for batch in PrefetchLoader(cv_ds, collate, args.num_workers):
            m = jax.device_get(eval_step(params, batch))
            if math.isfinite(float(m["loss"])):
                b = len(batch["tokens"])
                cv_losses.append(float(m["loss"]) * b)
                cv_accs.append(float(m["acc"]) * b)
                n += b
        info = {"epoch": epoch + 1, "step": step,
                "lr": float(schedule(step)),
                "cv_loss": sum(cv_losses) / max(n, 1),
                "cv_acc": sum(cv_accs) / max(n, 1),
                "epoch_time_s": time.time() - t0}
        logger.info("epoch %d done: %s", epoch, info)
        ckpt_lib.save_checkpoint(args.exp_dir, f"epoch_{epoch + 1}",
                                 jax.device_get(params), info)
    return params


if __name__ == "__main__":
    main()
