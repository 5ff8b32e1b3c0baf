"""End-to-end integration: tiny synthetic corpus -> train CLI -> average
-> all four decode modes -> WER scoring. Mirrors the reference's
recipe-driven quality control (SURVEY.md §4) hermetically on CPU."""

import os

import numpy as np
import pytest
import yaml

from openeat_tpu.bin import average_model, recognize, train
from openeat_tpu.utils.wer import corpus_wer
from tests.make_tiny_data import build as build_tiny

TINY_CONF = {
    "model_conf": {
        "d_model": 32, "attention_heads": 2, "linear_units": 64,
        "encoder_num_blocks": 2, "decoder_num_blocks": 1,
        "r_decoder_num_blocks": 1, "reverse_weight": 0.3,
        "input_layer": "conv2d", "pos_enc_layer_type": "rel_pos",
        "macaron_style": True, "use_cnn_module": True,
        "cnn_module_kernel": 7, "ctc_weight": 0.3,
        "compute_dtype": "float32", "dropout_rate": 0.1,
    },
    "collate_conf": {
        "feature_extraction_conf": {"resample_rate": 16000, "mel_bins": 40,
                                    "wav_dither": 0.0},
        "spec_aug": True,
        "spec_aug_conf": {"num_t_mask": 1, "num_f_mask": 1, "max_t": 10,
                          "max_f": 5},
    },
    "dataset_conf": {"max_length": 2000, "min_length": 10,
                     "batch_type": "static", "batch_size": 6, "sort": True},
    "grad_clip": 5, "accum_grad": 1, "max_epoch": 3, "log_interval": 2,
    "optim": "adam", "optim_conf": {"lr": 0.002}, "warmup_epoch": 1,
}


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    data = build_tiny(root, n_utts=12)
    conf_path = os.path.join(root, "train.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(TINY_CONF, f)
    exp_dir = os.path.join(root, "exp")
    train.main([
        "--config", conf_path,
        "--train_data", data["manifest"],
        "--cv_data", data["manifest"],
        "--dict", data["dict"],
        "--exp_dir", exp_dir,
        "--num_workers", "2",
    ])
    return {"root": root, "exp": exp_dir, **data}


def test_training_produces_checkpoints(trained):
    for e in (1, 2, 3):
        assert os.path.isdir(os.path.join(trained["exp"], f"epoch_{e}"))
        assert os.path.exists(os.path.join(trained["exp"],
                                           f"epoch_{e}.yaml"))
    with open(os.path.join(trained["exp"], "epoch_3.yaml")) as f:
        info = yaml.safe_load(f)
    assert np.isfinite(info["cv_loss"])
    assert info["step"] > 0


def test_average_model(trained):
    average_model.main(["--exp_dir", trained["exp"], "--dst", "avg_best2",
                        "--num", "2", "--val_best"])
    assert os.path.isdir(os.path.join(trained["exp"], "avg_best2"))


@pytest.mark.parametrize("mode", ["ctc_greedy_search",
                                  "ctc_prefix_beam_search", "attention",
                                  "attention_rescoring"])
def test_decode_modes(trained, mode):
    result = os.path.join(trained["root"], f"hyp_{mode}.txt")
    recognize.main([
        "--config", os.path.join(trained["exp"], "train.yaml"),
        "--checkpoint", os.path.join(trained["exp"], "epoch_3"),
        "--test_data", trained["manifest"],
        "--dict", trained["dict"],
        "--result_file", result,
        "--mode", mode,
        "--batch_size", "6",
        "--beam_size", "4",
        "--reverse_weight", "0.3",
        "--max_hyp_len", "16",
    ])
    hyps = {}
    with open(result, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(None, 1)
            hyps[parts[0]] = parts[1] if len(parts) > 1 else ""
    assert set(hyps) == set(trained["texts"])
    total = corpus_wer(trained["texts"], hyps)
    assert total.ref_len > 0
    assert np.isfinite(total.wer)  # 3 epochs: no accuracy claim, just sane


def test_wer_scorer_basics():
    refs = {"u1": "你好世界", "u2": "HELLO WORLD"}
    hyps = {"u1": "你好世界", "u2": "HELLO WORLD"}
    assert corpus_wer(refs, hyps).wer == 0.0
    hyps2 = {"u1": "你坏世界", "u2": "HELLO"}
    t = corpus_wer(refs, hyps2)
    assert t.sub == 1 and t.dele == 1
    np.testing.assert_allclose(t.wer, 100.0 * 2 / 6)


def test_ngram_fusion_decode(trained):
    """attention_rescoring + host n-gram fusion (_ngram_rescore): a
    first-party-trained ARPA fuses through the jitted score matrix; at
    a vanishing lm_weight the selection equals plain rescoring
    (equivalence property), and at a real weight every utterance still
    decodes."""
    import subprocess
    import sys
    arpa = os.path.join(trained["root"], "lm.arpa")
    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools",
                      "train_ngram.py"),
         trained["text"], arpa, "--order", "2", "--tokenizer", "char"],
        check=True)

    def decode(out_name, extra):
        out = os.path.join(trained["root"], out_name)
        recognize.main([
            "--config", os.path.join(trained["exp"], "train.yaml"),
            "--checkpoint", os.path.join(trained["exp"], "epoch_3"),
            "--test_data", trained["manifest"],
            "--dict", trained["dict"],
            "--result_file", out,
            "--mode", "attention_rescoring",
            "--batch_size", "6", "--beam_size", "4",
            "--reverse_weight", "0.3", "--max_hyp_len", "16"] + extra)
        with open(out, encoding="utf-8") as f:
            return {ln.split(None, 1)[0]: (ln.split(None, 1) + [""])[1].strip()
                    for ln in f if ln.strip()}

    plain = decode("hyp_plain.txt", [])
    tiny_w = decode("hyp_lm0.txt", ["--ngram_lm", arpa,
                                    "--lm_weight", "1e-9"])
    fused = decode("hyp_lm.txt", ["--ngram_lm", arpa,
                                  "--lm_weight", "0.3"])
    assert set(plain) == set(trained["texts"]) == set(fused)
    assert tiny_w == plain, \
        "lm_weight->0 fusion diverged from plain rescoring"
