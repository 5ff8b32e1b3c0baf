"""ASR training entry point.

Parity: reference openeat/bin/train.py:46-240 and train_ddp.py — one CLI
covers both: the reference's single-GPU / DataParallel / DDP split
collapses into a mesh-sharded SPMD program (data parallel over all local
chips by default; `--dp/--tp` select the mesh). Flags mirror the
reference (config, train/cv data, dict, exp_dir, checkpoint resume,
partial init via --init_mods, adapter-only fine-tuning, cmvn).

Per-epoch flow (reference train.py:203-240): train -> cv -> save
`epoch_N` orbax checkpoint + `epoch_N.yaml` metadata (cv loss, lr,
step); resolved config re-dumped to exp_dir/train.yaml for decode reuse.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np
import yaml

from openeat_tpu.config import TrainConfig, load_config, resolve_mesh_conf
from openeat_tpu.dataset.bpe import load_bpe
from openeat_tpu.dataset.dataset import (AudioCollate, AudioDataset,
                                         PrefetchLoader)
from openeat_tpu.dataset.text import load_dict
from openeat_tpu.models.asr_model import build_asr_model
from openeat_tpu.ops.frontend import FrontendConfig
from openeat_tpu.parallel import mesh as mesh_lib
from openeat_tpu.parallel.train_step import (TrainState, build_eval_step,
                                             build_train_step, init_params)
from openeat_tpu.pipeline import DeviceFeeder
from openeat_tpu.utils import checkpoint as ckpt_lib
from openeat_tpu.utils.common import init_logger, train_prng
from openeat_tpu.utils.executor import Executor
from openeat_tpu.utils.optim import build_optimizer


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="train an ASR model (TPU)")
    p.add_argument("--config", required=True)
    p.add_argument("--train_data", required=True)
    p.add_argument("--cv_data", required=True)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--dict", dest="dict_path", required=True)
    p.add_argument("--bpe_model", default=None)
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint to resume/init from")
    p.add_argument("--init_mods", default="encoder.,ctc.,decoder.",
                   help="comma-separated module prefixes for partial init")
    p.add_argument("--cmvn_file", default=None)
    p.add_argument("--is_json_cmvn", type=lambda s: s.lower() != "false",
                   default=True)
    p.add_argument("--only_adapter", action="store_true",
                   help="freeze all non-adapter parameters")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--dp", type=int, default=None,
                   help="data-parallel size (default: config/auto)")
    p.add_argument("--tp", type=int, default=None,
                   help="tensor-parallel size (default: config)")
    p.add_argument("--max_epoch", type=int, default=None)
    p.add_argument("--data_type", default="wav", choices=["wav", "feat",
                                                          "kaldi"])
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of early steps here")
    p.add_argument("--multihost", action="store_true",
                   help="initialize the jax.distributed runtime (multi-host "
                        "pods over DCN; reads JAX_COORDINATOR_ADDRESS / "
                        "JAX_PROCESS_ID / JAX_NUM_PROCESSES)")
    p.add_argument("--save_optimizer", type=lambda s: s.lower() != "false",
                   default=True,
                   help="also checkpoint the optimizer state (one rolling "
                        "'optimizer' dir) so --checkpoint resume is exact; "
                        "the reference re-initializes Adam on resume")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    if args.multihost:
        # single-controller-per-host SPMD over DCN; the mesh below then
        # spans every chip in the pod (reference train_ddp.py:127-130's
        # env:// NCCL rendezvous analog)
        jax.distributed.initialize()
    os.makedirs(args.exp_dir, exist_ok=True)
    logger = init_logger(log_file=os.path.join(args.exp_dir, "train.log"))

    cfg = load_config(args.config)
    train_cfg = TrainConfig.from_dict(cfg)
    if args.max_epoch is not None:
        train_cfg.max_epoch = args.max_epoch
    np.random.seed(train_cfg.seed)

    char_dict = load_dict(args.dict_path)
    vocab_size = len(char_dict)
    bpe = load_bpe(args.bpe_model)

    dataset_conf = dict(cfg.get("dataset_conf", {}) or {})
    collate_conf = dict(cfg.get("collate_conf", {}) or {})
    fe_conf = collate_conf.get("feature_extraction_conf", {}) or {}
    data_type = "wav" if args.data_type == "wav" else "feat"

    ds_kwargs = dict(
        max_length=dataset_conf.get("max_length", 10240),
        min_length=dataset_conf.get("min_length", 0),
        token_max_length=dataset_conf.get("token_max_length", 200),
        token_min_length=dataset_conf.get("token_min_length", 0),
        batch_type=dataset_conf.get("batch_type", "dynamic"),
        batch_size=dataset_conf.get("batch_size", 12),
        max_frames_in_batch=dataset_conf.get("max_frames_in_batch", 10000),
        sort=dataset_conf.get("sort", True),
        data_type=data_type, seed=train_cfg.seed)
    train_ds = AudioDataset(
        args.train_data, char_dict, bpe,
        speed_perturb=dataset_conf.get("speed_perturb", False),
        speeds=dataset_conf.get("speeds", (0.9, 1.1, 0.1)), **ds_kwargs)
    cv_ds = AudioDataset(args.cv_data, char_dict, bpe, **ds_kwargs)
    logger.info("train batches %d cv batches %d vocab %d",
                len(train_ds), len(cv_ds), vocab_size)

    collate = AudioCollate(
        resample_rate=fe_conf.get("resample_rate", 16000),
        speed_perturb_rate=fe_conf.get("speed_perturb_rate", 0.0),
        speeds=fe_conf.get("speeds", (0.9, 1.1, 0.1)),
        seed=train_cfg.seed)
    cv_collate = AudioCollate(resample_rate=fe_conf.get("resample_rate",
                                                        16000))
    frontend = FrontendConfig.from_collate_conf(collate_conf)
    # init/resume checkpoint params are loaded BEFORE model build: the
    # presence of encoder/global_cmvn stats in the checkpoint (a
    # converted WeNet release, or a resumed --cmvn_file run) means the
    # model must be built with the global_cmvn submodule or flax
    # silently drops the stats — and the features must then be raw
    # fbank, not per-utterance normalized (the WeNet-init fine-tune
    # path, reference train.py:173-177 + checkpoint.py:71-96).
    ckpt_src, ckpt_info = (ckpt_lib.load_checkpoint(args.checkpoint)
                           if args.checkpoint else (None, {}))
    ckpt_has_cmvn = ckpt_src is not None and "global_cmvn" in (
        ckpt_src.get("params", {}).get("encoder", {}) or {})
    use_global_cmvn = args.cmvn_file is not None or ckpt_has_cmvn
    # global CMVN and per-utterance normalization are exclusive (WeNet
    # convention): the stats from tools/compute_cmvn.py describe RAW
    # fbank output, so applying them after per-utt norm would normalize
    # an already mean-0/var-1 distribution with raw log-mel stats
    # (ADVICE r1). An explicit normalization: true + --cmvn_file is a
    # config error; the default (unset) flips to false.
    if use_global_cmvn and frontend.normalization:
        if collate_conf.get("normalization") is True:
            raise ValueError(
                "collate_conf.normalization: true is incompatible with "
                "global CMVN (--cmvn_file or a checkpoint carrying "
                "global_cmvn stats; the stats are computed on raw "
                "fbank); remove one of the two")
        from dataclasses import replace as _dc_replace
        frontend = _dc_replace(frontend, normalization=False)
        collate_conf["normalization"] = False
        cfg.setdefault("collate_conf", {})["normalization"] = False
        logger.info("global CMVN configured: per-utterance normalization "
                    "disabled (stats are over raw fbank)")
    input_size = (fe_conf.get("mel_bins", 80) if data_type == "wav"
                  else train_ds.input_size)

    # mesh (CLI overrides config)
    mesh_conf = resolve_mesh_conf(cfg)
    mesh = mesh_lib.make_mesh(
        args.dp if args.dp is not None else mesh_conf.get("data", -1),
        args.tp if args.tp is not None else mesh_conf.get("model", 1))
    logger.info("mesh %s over %d devices", dict(mesh.shape),
                mesh.devices.size)

    # model
    model_conf = dict(cfg.get("model_conf", {}) or {})
    model = build_asr_model(model_conf, input_size, vocab_size,
                            use_global_cmvn=use_global_cmvn)

    # resolved config for decode-time reuse (reference train.py:149-152).
    # use_global_cmvn MUST be recorded or recognize.py silently builds a
    # model without the global_cmvn submodule and flax ignores the
    # checkpoint's stats (ADVICE r1: severe silent accuracy loss).
    resolved = dict(cfg)
    resolved["input_size"] = input_size
    resolved["vocab_size"] = vocab_size
    resolved["use_global_cmvn"] = use_global_cmvn
    with open(os.path.join(args.exp_dir, "train.yaml"), "w") as f:
        yaml.safe_dump(resolved, f, sort_keys=False)

    # steps & optimizer. accum_grad splits each loader batch into
    # micro-batches inside the jit (DeviceFeeder emits [accum, micro,...]),
    # so one loader batch == one optimizer step regardless of accum_grad
    # (the reference instead groups accum_grad loader batches per step,
    # executor.py:42-63 — equivalent with batch_size scaled accordingly).
    steps_per_epoch = max(len(train_ds), 1)
    warmup_steps = (train_cfg.warmup_steps if train_cfg.warmup_steps
                    else int(train_cfg.warmup_epoch * steps_per_epoch))
    example_keys, example_host = collate(train_ds[len(train_ds) // 2])
    feeder_probe = DeviceFeeder([(example_keys, example_host)], frontend,
                                mesh=None, train=False)
    _, example_batch = next(iter(feeder_probe))
    # single jitted init; the same params feed the optimizer's freeze
    # masks (round-1 initialized twice, eagerly — minutes of per-op
    # dispatches on the remote-compile tunnel)
    params0 = init_params(model, example_batch, train_cfg.seed)
    tx, schedule = build_optimizer(train_cfg.lr, warmup_steps,
                                   train_cfg.optim, params0,
                                   only_adapter=args.only_adapter)
    state = TrainState(params0, tx.init(params0),
                       jax.numpy.zeros((), jax.numpy.int32))

    # cmvn stats
    if args.cmvn_file:
        from openeat_tpu.modules.cmvn import cmvn_params
        from openeat_tpu.utils.cmvn import load_cmvn
        mean, istd = load_cmvn(args.cmvn_file, args.is_json_cmvn)
        p = state.params["params"]["encoder"]["global_cmvn"]
        p.update(cmvn_params(mean, istd))

    # checkpoint init/resume (params were pre-loaded for the cmvn probe)
    start_epoch, step0 = 0, 0
    if args.checkpoint:
        src, info = ckpt_src, ckpt_info
        init_mods = [m.strip() for m in args.init_mods.split(",") if m]
        new_params, copied = ckpt_lib.load_trained_modules(
            state.params, src, init_mods)
        logger.info("initialized %d tensors from %s", len(copied),
                    args.checkpoint)
        state = state._replace(params=new_params)
        if info.get("epoch") is not None and not args.only_adapter:
            start_epoch = int(info["epoch"])
            step0 = int(info.get("step", 0))
            state = state._replace(step=jax.numpy.asarray(step0))
            # exact resume: restore optimizer moments if the rolling
            # optimizer checkpoint matches the resumed epoch
            opt_path = os.path.join(os.path.dirname(
                os.path.abspath(args.checkpoint)), "optimizer")
            if os.path.isdir(opt_path):
                opt_state, opt_info = ckpt_lib.load_checkpoint(
                    opt_path, state.opt_state)
                if int(opt_info.get("epoch", -1)) == start_epoch:
                    state = state._replace(opt_state=opt_state)
                    logger.info("restored optimizer state (epoch %d)",
                                start_epoch)

    # shard the state
    pshard = mesh_lib.param_shardings(state.params, mesh)
    state_shardings = TrainState(
        pshard,
        jax.tree.map(lambda _: mesh_lib.replicated(mesh), state.opt_state),
        mesh_lib.replicated(mesh))
    state = jax.device_put(state, state_shardings)
    train_step = jax.jit(
        build_train_step(model, tx, train_cfg.accum_grad,
                         train_cfg.grad_clip),
        donate_argnums=(0,))
    eval_step = jax.jit(build_eval_step(model))

    executor = Executor(train_step, eval_step, schedule,
                        train_cfg.log_interval, logger,
                        metrics_file=os.path.join(args.exp_dir,
                                                  "metrics.jsonl"))
    # per-process batch-dim padding target (multi-host: each process
    # contributes its local slice of the global batch)
    dp = mesh.shape["data"] // jax.process_count()
    shard_kw = dict(shard_id=jax.process_index(),
                    num_shards=jax.process_count())
    rng = train_prng(train_cfg.seed)
    if args.profile_dir:
        # trace a few warm steps for TensorBoard/Perfetto inspection
        from openeat_tpu.utils.profiling import trace
        warm_loader = PrefetchLoader(train_ds, collate, args.num_workers)
        warm_feed = DeviceFeeder(warm_loader, frontend, mesh, train=True,
                                 seed=train_cfg.seed,
                                 pad_batch_multiple=dp,
                                 accum_grad=train_cfg.accum_grad)
        it = iter(warm_feed)
        _, wb = next(it)
        state, _ = train_step(state, wb, jax.random.PRNGKey(0))  # compile
        with trace(args.profile_dir):
            for _ in range(3):
                state, _ = train_step(state, wb, jax.random.PRNGKey(1))
        logger.info("profiler trace written to %s", args.profile_dir)
    for epoch in range(start_epoch, train_cfg.max_epoch):
        train_loader = PrefetchLoader(train_ds, collate, args.num_workers,
                                      shuffle_batches=True,
                                      seed=train_cfg.seed + epoch,
                                      **shard_kw)
        train_feed = DeviceFeeder(train_loader, frontend, mesh, train=True,
                                  seed=train_cfg.seed + epoch,
                                  pad_batch_multiple=dp,
                                  accum_grad=train_cfg.accum_grad)
        rng, erng = jax.random.split(rng)
        state, summary = executor.train(
            state, (b for _, b in iter(train_feed)), erng, epoch)
        cv_loader = PrefetchLoader(cv_ds, cv_collate, args.num_workers,
                                   **shard_kw)
        cv_feed = DeviceFeeder(cv_loader, frontend.without_augmentation(),
                               mesh, train=False, pad_batch_multiple=dp)
        cv_metrics = executor.cv(state.params,
                                 (b for _, b in iter(cv_feed)), epoch)
        lr_now = float(schedule(int(state.step)))
        info = {"epoch": epoch + 1, "step": int(state.step), "lr": lr_now,
                "cv_loss": float(cv_metrics["cv_loss"]),
                "cv_acc": float(cv_metrics["cv_acc"]), **summary}
        logger.info("epoch %d done: %s", epoch, info)
        ckpt_lib.save_checkpoint(args.exp_dir, f"epoch_{epoch + 1}",
                                 jax.device_get(state.params), info)
        if args.save_optimizer:
            ckpt_lib.save_checkpoint(args.exp_dir, "optimizer",
                                     jax.device_get(state.opt_state),
                                     {"epoch": epoch + 1,
                                      "step": int(state.step)})
    logger.info("training finished")
    return state


if __name__ == "__main__":
    main()
