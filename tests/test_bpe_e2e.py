"""English+BPE end-to-end: train BPE -> dict -> manifest -> train ->
decode -> WER with ▁ piece rejoin (the LibriSpeech recipe path)."""

import os

import numpy as np
import yaml

from openeat_tpu.bin import recognize, train, train_bpe
from openeat_tpu.dataset.audio import write_wav
from openeat_tpu.utils.wer import corpus_wer

WORDS = ["HELLO", "WORLD", "GOOD", "MORNING", "SPEECH", "MODEL"]


def _build_corpus(root, rng, n=10):
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    lines, texts = [], {}
    for i in range(n):
        n_words = int(rng.integers(1, 4))
        text = " ".join(WORDS[int(rng.integers(len(WORDS)))]
                        for _ in range(n_words))
        dur = 0.5 + 0.3 * n_words
        x = (0.2 * np.sin(2 * np.pi * (300 + 50 * i)
                          * np.arange(int(dur * 16000)) / 16000)
             ).astype(np.float32)
        p = os.path.join(root, "wav", f"u{i}.wav")
        write_wav(p, x, 16000)
        key = f"u{i}"
        texts[key] = text
        lines.append(f"utt:{key}\tfeat:{p}\tfeat_shape:{dur:.2f}\t"
                     f"text:{text}")
    with open(os.path.join(root, "format.data"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(root, "text"), "w") as f:
        for k, v in texts.items():
            f.write(f"{k} {v}\n")
    return texts


def test_bpe_english_pipeline(tmp_path, rng):
    root = str(tmp_path)
    texts = _build_corpus(root, rng)
    # BPE + dict (the librispeech recipe stages)
    train_bpe.main(["--input", os.path.join(root, "text"),
                    "--skip_ncols", "1",
                    "--model_prefix", os.path.join(root, "bpe"),
                    "--vocab_size", "60"])
    bpe_path = os.path.join(root, "bpe.bpe.json")
    import subprocess, sys
    r = subprocess.run(
        [sys.executable, "tools/build_dict.py",
         os.path.join(root, "text"), os.path.join(root, "dict.txt"),
         "--bpe_model", bpe_path],
        capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS=""))
    assert r.returncode == 0, r.stderr

    conf = {"model_conf": {"d_model": 32, "attention_heads": 2,
                           "linear_units": 64, "encoder_num_blocks": 1,
                           "decoder_num_blocks": 1,
                           "r_decoder_num_blocks": 0,
                           "reverse_weight": 0.0, "cnn_module_kernel": 5,
                           "compute_dtype": "float32"},
            "collate_conf": {"feature_extraction_conf": {"mel_bins": 40}},
            "dataset_conf": {"batch_type": "static", "batch_size": 5,
                             "max_length": 2000},
            "max_epoch": 1, "log_interval": 1, "optim": "adam",
            "optim_conf": {"lr": 0.001}, "warmup_epoch": 1}
    conf_path = os.path.join(root, "conf.yaml")
    yaml.safe_dump(conf, open(conf_path, "w"))
    exp = os.path.join(root, "exp")
    train.main(["--config", conf_path,
                "--train_data", os.path.join(root, "format.data"),
                "--cv_data", os.path.join(root, "format.data"),
                "--dict", os.path.join(root, "dict.txt"),
                "--bpe_model", bpe_path, "--exp_dir", exp,
                "--num_workers", "1"])
    result = os.path.join(root, "hyp.txt")
    recognize.main(["--config", os.path.join(exp, "train.yaml"),
                    "--checkpoint", os.path.join(exp, "epoch_1"),
                    "--test_data", os.path.join(root, "format.data"),
                    "--dict", os.path.join(root, "dict.txt"),
                    "--bpe_model", bpe_path,
                    "--result_file", result,
                    "--mode", "ctc_greedy_search", "--batch_size", "5"])
    hyps = {}
    for line in open(result, encoding="utf-8"):
        parts = line.rstrip("\n").split(None, 1)
        hyps[parts[0]] = parts[1] if len(parts) > 1 else ""
    assert set(hyps) == set(texts)
    # hypotheses must be detokenized words (no ▁ pieces leak through)
    assert not any("▁" in h for h in hyps.values())
    total = corpus_wer(texts, hyps, char_mode=False)
    assert np.isfinite(total.wer)
