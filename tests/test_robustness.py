"""Failure-coping + CMVN-flow tests.

The reference copes with bad data by skipping corrupt utterances inside
the collate (reference dataset.py:108-111) — verify our batch path does
the same; and exercise the full global-CMVN loop (stats generator ->
train CLI --cmvn_file -> frozen stats in the checkpoint)."""

import os
import subprocess
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu",
           PALLAS_AXON_POOL_IPS="")


def test_corrupt_utterance_skipped(tmp_path, rng):
    from openeat_tpu.dataset.dataset import AudioCollate, AudioDataset
    from openeat_tpu.dataset.text import load_dict
    from tests.make_tiny_data import build as build_tiny
    d = build_tiny(str(tmp_path), n_utts=4)
    # corrupt one wav: truncate to garbage
    bad = os.path.join(str(tmp_path), "wav", "utt0001.wav")
    with open(bad, "wb") as f:
        f.write(b"RIFFgarbage")
    ds = AudioDataset(d["manifest"], load_dict(d["dict"]),
                      batch_type="static", batch_size=4, max_length=2000)
    keys, batch = AudioCollate()(ds[0])
    assert len(keys) == 3              # corrupt one skipped
    assert "utt0001" not in keys
    assert batch["wav"].shape[0] == 3


def test_cmvn_full_loop(tmp_path, rng):
    from tests.make_tiny_data import build as build_tiny
    d = build_tiny(str(tmp_path / "data"), n_utts=8)
    cmvn_path = str(tmp_path / "cmvn.json")
    r = subprocess.run(
        [sys.executable, "tools/compute_cmvn.py", d["manifest"],
         cmvn_path, "--mel_bins", "40", "--batch_size", "4"],
        cwd=REPO, env=ENV, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    conf = {"model_conf": {"d_model": 32, "attention_heads": 2,
                           "linear_units": 64, "encoder_num_blocks": 1,
                           "decoder_num_blocks": 1,
                           "r_decoder_num_blocks": 0,
                           "reverse_weight": 0.0, "cnn_module_kernel": 5,
                           "compute_dtype": "float32"},
            "collate_conf": {"feature_extraction_conf": {"mel_bins": 40}},
            "dataset_conf": {"batch_type": "static", "batch_size": 4,
                             "max_length": 2000},
            "max_epoch": 1, "log_interval": 1, "optim": "adam",
            "optim_conf": {"lr": 0.001}, "warmup_epoch": 1}
    conf_path = str(tmp_path / "conf.yaml")
    yaml.safe_dump(conf, open(conf_path, "w"))
    exp = str(tmp_path / "exp")
    from openeat_tpu.bin import train
    train.main(["--config", conf_path, "--train_data", d["manifest"],
                "--cv_data", d["manifest"], "--dict", d["dict"],
                "--exp_dir", exp, "--cmvn_file", cmvn_path,
                "--num_workers", "1"])
    # cmvn stats live in the checkpoint and match the computed stats
    from openeat_tpu.utils.checkpoint import load_checkpoint
    from openeat_tpu.utils.cmvn import load_cmvn
    params, _ = load_checkpoint(os.path.join(exp, "epoch_1"))
    mean, istd = load_cmvn(cmvn_path, is_json=True)
    got = params["params"]["encoder"]["global_cmvn"]
    np.testing.assert_allclose(np.asarray(got["mean"]), mean, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["istd"]), istd, rtol=1e-5)
