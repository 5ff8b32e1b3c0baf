"""Mesh-sharded decode fan-out: `recognize --dp N` must produce
hypotheses identical to single-device decode.

The reference fans decode out by splitting the manifest over N GPUs with
background shell jobs (reference examples/aishell/run.sh:186-219); the
TPU-native equivalent shards each decode batch over the mesh's 'data'
axis in one process. Every decode program is batch-parallel, so the
sharded run must be bit-identical to --dp 1 (float32).
"""

import os

import jax
import jax.numpy as jnp
import pytest
import yaml

from openeat_tpu.bin import recognize
from openeat_tpu.models.asr_model import build_asr_model
from openeat_tpu.utils import checkpoint as ckpt_lib
from tests.make_tiny_data import build as build_tiny

TINY_MODEL = {
    "d_model": 32, "attention_heads": 2, "linear_units": 64,
    "encoder_num_blocks": 2, "decoder_num_blocks": 1,
    "r_decoder_num_blocks": 1, "reverse_weight": 0.3,
    "input_layer": "conv2d", "pos_enc_layer_type": "rel_pos",
    "macaron_style": True, "use_cnn_module": True,
    "cnn_module_kernel": 7, "ctc_weight": 0.3,
    "compute_dtype": "float32", "dropout_rate": 0.0,
}


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dp_decode"))
    data = build_tiny(root, n_utts=12)
    vocab = sum(1 for _ in open(data["dict"], encoding="utf-8"))
    model = build_asr_model(dict(TINY_MODEL), 40, vocab)
    params = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 32, 40)),
                        jnp.array([32]), jnp.zeros((1, 4), jnp.int32),
                        jnp.array([4]))
    exp = os.path.join(root, "exp")
    ckpt_lib.save_checkpoint(exp, "epoch_1", params, {"epoch": 1})
    conf = {"model_conf": dict(TINY_MODEL), "input_size": 40,
            "vocab_size": vocab, "use_global_cmvn": False,
            "collate_conf": {"feature_extraction_conf": {
                "resample_rate": 16000, "mel_bins": 40,
                "wav_dither": 0.0}},
            "dataset_conf": {"max_length": 2000, "min_length": 0}}
    conf_path = os.path.join(exp, "train.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)
    return {"root": root, "conf": conf_path,
            "ckpt": os.path.join(exp, "epoch_1"), **data}


@pytest.mark.parametrize("mode", ["ctc_greedy_search",
                                  "attention_rescoring"])
def test_dp_decode_matches_single_device(ckpt, mode):
    assert len(jax.devices()) >= 8, "conftest provides 8 CPU devices"
    outs = {}
    for dp in (1, 8):
        result = os.path.join(ckpt["root"], f"hyp_{mode}_dp{dp}.txt")
        recognize.main([
            "--config", ckpt["conf"], "--checkpoint", ckpt["ckpt"],
            "--test_data", ckpt["manifest"], "--dict", ckpt["dict"],
            "--result_file", result, "--mode", mode,
            "--batch_size", "8", "--beam_size", "4",
            "--reverse_weight", "0.3", "--max_hyp_len", "16",
            "--dp", str(dp)])
        with open(result, encoding="utf-8") as f:
            outs[dp] = sorted(f.read().splitlines())
    assert len(outs[1]) == 12
    assert outs[1] == outs[8], "sharded decode diverged from single-device"


def test_dp_batch_size_validation(ckpt):
    with pytest.raises(ValueError, match="multiple of"):
        recognize.main([
            "--config", ckpt["conf"], "--checkpoint", ckpt["ckpt"],
            "--test_data", ckpt["manifest"], "--dict", ckpt["dict"],
            "--result_file", os.path.join(ckpt["root"], "x.txt"),
            "--mode", "ctc_greedy_search", "--batch_size", "6",
            "--dp", "4"])
