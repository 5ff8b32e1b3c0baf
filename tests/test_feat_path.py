"""Precomputed-feature (kaldi ark) data path: manifest -> ark reader ->
collate -> feeder -> model, end to end."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from openeat_tpu.dataset import kaldi_io
from openeat_tpu.dataset.dataset import AudioCollate, AudioDataset
from openeat_tpu.dataset.text import load_dict
from openeat_tpu.models.asr_model import ASRModel
from openeat_tpu.ops.frontend import FrontendConfig
from openeat_tpu.pipeline import DeviceFeeder


def test_feat_manifest_end_to_end(tmp_path, rng):
    dim = 16
    ark = str(tmp_path / "feats.ark")
    lines = []
    with open(ark, "wb") as f:
        for i in range(6):
            frames = 20 + 5 * i
            mat = rng.standard_normal((frames, dim)).astype(np.float32)
            off = kaldi_io.write_ark_entry(f, f"utt{i}", mat)
            lines.append(f"utt:utt{i}\tfeat:{ark}:{off}\t"
                         f"feat_shape:{frames},{dim}\ttext:你好我们")
    manifest = str(tmp_path / "format.data")
    open(manifest, "w", encoding="utf-8").write("\n".join(lines) + "\n")
    char_dict = {"<blank>": 0, "<unk>": 1, "你": 2, "好": 3, "我": 4,
                 "们": 5, "<sos/eos>": 6}

    ds = AudioDataset(manifest, char_dict, batch_type="static",
                      batch_size=3, max_length=1000, data_type="feat")
    assert ds.input_size == dim
    collate = AudioCollate(frame_bucket=16)
    keys, batch = collate(ds[0])
    assert batch["features"].shape[2] == dim
    assert batch["features"].shape[1] % 16 == 0

    feeder = DeviceFeeder([(keys, batch)],
                          FrontendConfig(num_mel_bins=dim, spec_aug=True),
                          train=True)
    _, dev_batch = next(iter(feeder))
    model = ASRModel(input_size=dim, vocab_size=len(char_dict),
                     encoder_num_blocks=1, decoder_num_blocks=1,
                     r_decoder_num_blocks=0, reverse_weight=0.0,
                     d_model=16, attention_heads=2, linear_units=32,
                     input_layer="linear", compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dev_batch["features"],
                        dev_batch["features_length"],
                        dev_batch["targets"], dev_batch["targets_length"])
    m = model.apply(params, dev_batch["features"],
                    dev_batch["features_length"], dev_batch["targets"],
                    dev_batch["targets_length"])
    assert np.isfinite(float(m["loss"]))
