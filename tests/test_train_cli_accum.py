"""Grad accumulation THROUGH THE CLI: accum_grad=4 must match
accum_grad=1 on identical data.

Round-1 gap (VERDICT): the scan kernel in parallel.train_step was
unit-correct but unreachable — no caller reshaped batches to
[accum, micro, ...]. DeviceFeeder now does the host-side split, so the
reference's first-class accumulation feature
(reference openeat/utils/executor.py:42-63) works end-to-end.

Determinism notes: dropout_rate=0 and all augmentation off so the only
difference between the runs is the micro-batch split; losses then agree
to fp32 summation noise.
"""

import os

import numpy as np
import yaml

from openeat_tpu.bin import train
from tests.make_tiny_data import build as build_tiny

CONF = {
    "model_conf": {
        "d_model": 32, "attention_heads": 2, "linear_units": 64,
        "encoder_num_blocks": 2, "decoder_num_blocks": 1,
        "r_decoder_num_blocks": 1, "reverse_weight": 0.3,
        "input_layer": "conv2d", "pos_enc_layer_type": "rel_pos",
        "macaron_style": True, "use_cnn_module": True,
        "cnn_module_kernel": 7, "ctc_weight": 0.3,
        "compute_dtype": "float32", "dropout_rate": 0.0,
    },
    "collate_conf": {
        "feature_extraction_conf": {"resample_rate": 16000, "mel_bins": 40,
                                    "wav_dither": 0.0},
        "spec_aug": False,
    },
    "dataset_conf": {"max_length": 2000, "min_length": 10,
                     "batch_type": "static", "batch_size": 16,
                     "sort": True},
    "grad_clip": 5, "max_epoch": 2, "log_interval": 1,
    "optim": "adam", "optim_conf": {"lr": 0.002}, "warmup_epoch": 1,
}


def _train(root: str, data: dict, accum: int) -> dict:
    conf = dict(CONF)
    conf["accum_grad"] = accum
    conf_path = os.path.join(root, f"conf_a{accum}.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)
    exp_dir = os.path.join(root, f"exp_a{accum}")
    train.main([
        "--config", conf_path,
        "--train_data", data["manifest"],
        "--cv_data", data["manifest"],
        "--dict", data["dict"],
        "--exp_dir", exp_dir,
        "--num_workers", "2",
        "--dp", "2", "--tp", "4",
    ])
    out = {}
    for e in (1, 2):
        with open(os.path.join(exp_dir, f"epoch_{e}.yaml")) as f:
            out[e] = yaml.safe_load(f)
    return out


def test_accum_grad_cli_equivalence(tmp_path):
    root = str(tmp_path)
    # 16 utts + static batch 16 -> one optimizer step per epoch with NO
    # batch-dim padding in either run (16 is divisible by dp*accum for
    # both accum=1 and accum=4), so the two runs see identical data.
    data = build_tiny(root, n_utts=16)
    r1 = _train(root, data, accum=1)
    r4 = _train(root, data, accum=4)
    for e in (1, 2):
        assert r1[e]["step"] == r4[e]["step"] == e
        # epoch-1 train_loss is the pre-update loss: mean of 4 micro
        # losses must equal the big-batch loss
        np.testing.assert_allclose(r1[e]["train_loss"],
                                   r4[e]["train_loss"], rtol=2e-4)
        # cv_loss after the update checks gradient-path equivalence
        np.testing.assert_allclose(r1[e]["cv_loss"], r4[e]["cv_loss"],
                                   rtol=2e-3)
