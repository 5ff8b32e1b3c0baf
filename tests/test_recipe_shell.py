"""Drive the user-facing recipe shell scripts end-to-end.

The staged run.sh recipes are the framework's primary user surface
(reference examples/aishell/run.sh:87-246, examples/librispeech/run.sh)
but every other test exercises the Python layers underneath them, so a
shell-level regression (flag rename, parse_options breakage, a
cwd-relative path) would be invisible to the suite. Each test here
builds a miniature raw corpus in the layout the real corpus ships in,
then executes the actual run.sh stages exactly as a user would — from a
scratch working directory, overriding only sizes via --flags.
"""

import os
import re
import subprocess
import sys

import numpy as np
import yaml

from openeat_tpu.dataset.audio import write_wav
from openeat_tpu.dataset.flac import write_flac

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_MODEL = {
    "d_model": 32, "attention_heads": 2, "linear_units": 64,
    "encoder_num_blocks": 2, "decoder_num_blocks": 1,
    "r_decoder_num_blocks": 1, "reverse_weight": 0.3,
    "input_layer": "conv2d", "pos_enc_layer_type": "rel_pos",
    "macaron_style": True, "use_cnn_module": True,
    "cnn_module_kernel": 7, "ctc_weight": 0.3,
    "compute_dtype": "float32", "dropout_rate": 0.0,
}


def _tiny_conf(path: str, mel_bins: int = 40) -> None:
    conf = {
        "model_conf": dict(TINY_MODEL),
        "collate_conf": {
            "feature_extraction_conf": {"resample_rate": 16000,
                                        "mel_bins": mel_bins,
                                        "wav_dither": 0.0},
            "spec_aug": False,
        },
        "dataset_conf": {"max_length": 2000, "min_length": 5,
                         "batch_type": "static", "batch_size": 8,
                         "sort": True},
        "grad_clip": 5, "max_epoch": 2, "accum_grad": 1,
        "log_interval": 5, "optim": "adam",
        "optim_conf": {"lr": 0.002}, "warmup_epoch": 1,
    }
    with open(path, "w") as f:
        yaml.safe_dump(conf, f)


def _sine(rng, dur: float, rate: int = 16000) -> np.ndarray:
    t = np.arange(int(dur * rate)) / rate
    f0 = float(rng.uniform(200, 1500))
    return (0.3 * np.sin(2 * np.pi * f0 * t)
            + 0.03 * rng.standard_normal(t.size)).astype(np.float32)


def _run_sh(cmd, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    # one CPU device is enough; drop conftest's 8-device flag for speed
    env["XLA_FLAGS"] = ""
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
    r = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                       text=True, timeout=1500)
    assert r.returncode == 0, (
        f"{' '.join(cmd)} failed\n--- stdout ---\n{r.stdout[-4000:]}"
        f"\n--- stderr ---\n{r.stderr[-4000:]}")
    return r


def _overall_error_rate(path: str) -> float:
    m = re.findall(r"Overall.*?(\d+\.\d+)", open(path).read())
    assert m, f"no Overall line in {path}"
    return float(m[-1])


def test_aishell_run_sh(tmp_path, rng):
    """stages 0-4: raw corpus layout -> prep -> dict -> train -> average
    -> all four decode modes -> CER files."""
    corpus = tmp_path / "corpus"
    trans_lines = []
    splits = {"train": 16, "dev": 4, "test": 4}
    chars = list("你好我们他去学校吃饭")
    for split, n in splits.items():
        for i in range(n):
            spk = f"S{(i % 2):04d}"
            utt = f"BAC009{spk}W{split[0].upper()}{i:03d}"
            d = corpus / "wav" / split / spk
            d.mkdir(parents=True, exist_ok=True)
            write_wav(str(d / f"{utt}.wav"),
                      _sine(rng, float(rng.uniform(0.5, 0.9))), 16000)
            text = " ".join(chars[int(rng.integers(len(chars)))]
                            for _ in range(int(rng.integers(2, 5))))
            trans_lines.append(f"{utt} {text}")
    (corpus / "transcript").mkdir()
    (corpus / "transcript" / "aishell_transcript_v0.8.txt").write_text(
        "\n".join(trans_lines) + "\n", encoding="utf-8")

    conf = tmp_path / "tiny.yaml"
    _tiny_conf(str(conf))
    work = tmp_path / "work"
    work.mkdir()
    _run_sh(["bash", os.path.join(REPO, "examples/aishell/run.sh"),
             "--stage", "0", "--stop_stage", "4",
             "--data", str(corpus), "--config", str(conf),
             "--average_num", "2", "--beam_size", "4"], str(work))

    for mode in ("ctc_greedy_search", "ctc_prefix_beam_search",
                 "attention", "attention_rescoring"):
        cer_file = work / "exp" / "conformer" / f"cer_{mode}.txt"
        assert cer_file.exists(), f"missing {cer_file}"
        cer = _overall_error_rate(str(cer_file))
        assert np.isfinite(cer)
        hyp = (work / "exp" / "conformer" /
               f"hyp_{mode}.txt").read_text(encoding="utf-8")
        assert len(hyp.splitlines()) == splits["test"]


def test_librispeech_run_sh(tmp_path, rng):
    """stages 1-4 over a raw-layout FLAC corpus: prepare_data -> BPE ->
    dict -> train -> average -> 2 decode modes -> word WER."""
    words = ["HELLO", "WORLD", "GOOD", "MORNING", "SPEECH", "MODEL",
             "OPEN", "NIGHT"]
    corpus = tmp_path / "LibriSpeech"
    layout = {"train-tiny": ("19", "198", 12),
              "dev-tiny": ("26", "495", 4),
              "test-tiny": ("32", "4137", 4)}
    for subset, (spk, chap, n) in layout.items():
        d = corpus / subset / spk / chap
        d.mkdir(parents=True)
        trans = []
        for i in range(n):
            utt = f"{spk}-{chap}-{i:04d}"
            text = " ".join(words[int(rng.integers(len(words)))]
                            for _ in range(int(rng.integers(1, 4))))
            write_flac(str(d / f"{utt}.flac"),
                       _sine(rng, float(rng.uniform(0.5, 0.9))), 16000)
            trans.append(f"{utt} {text}")
        (d / f"{spk}-{chap}.trans.txt").write_text(
            "\n".join(trans) + "\n")

    work = tmp_path / "work"
    (work / "data").mkdir(parents=True)
    prep = os.path.join(REPO, "examples/librispeech/local/prepare_data.py")
    for subset, out in (("train-tiny", "train_960"), ("dev-tiny", "dev"),
                        ("test-tiny", "test_clean")):
        _run_sh([sys.executable, prep, str(corpus / subset),
                 f"data/{out}"], str(work))

    conf = tmp_path / "tiny_en.yaml"
    _tiny_conf(str(conf))
    _run_sh(["bash", os.path.join(REPO, "examples/librispeech/run.sh"),
             "--stage", "1", "--stop_stage", "4",
             "--config", str(conf), "--bpe_size", "40",
             "--average_num", "2", "--beam_size", "4",
             "--test_sets", "test_clean"], str(work))

    for mode in ("ctc_greedy_search", "attention_rescoring"):
        wer_file = (work / "exp" / "conformer" /
                    f"test_clean_wer_{mode}.txt")
        assert wer_file.exists(), f"missing {wer_file}"
        assert np.isfinite(_overall_error_rate(str(wer_file)))
