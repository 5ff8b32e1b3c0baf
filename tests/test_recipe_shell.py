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
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
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


# ---- WeNet-release shapes shared by the two WeNet-init recipes ----
# (tests/test_wenet_convert.py synthesizer conventions)
WD, WV, WF, WHEADS, WFF, WK = 16, 30, 80, 2, 32, 7

CJK27 = list("你好我们他去学校吃饭天气很冷热走跑看书水火山石田人口手")
assert len(CJK27) == 27


def _wenet_release_dir(tmp_path, rng):
    """Synthesize an unpacked WeNet release: final.pt + train_aed.yaml
    (WeNet encoder_conf/decoder_conf layout) + words.txt."""
    import torch

    from tests.test_wenet_convert import _wenet_state
    d = tmp_path / "wenet_release"
    d.mkdir()
    state = _wenet_state(rng)
    torch.save({k: torch.from_numpy(v) for k, v in state.items()},
               str(d / "final.pt"))
    wenet_yaml = {
        "encoder": "conformer",
        "encoder_conf": {
            "output_size": WD, "attention_heads": WHEADS,
            "linear_units": WFF, "num_blocks": 2, "dropout_rate": 0.0,
            "positional_dropout_rate": 0.0, "attention_dropout_rate": 0.0,
            "input_layer": "conv2d", "pos_enc_layer_type": "rel_pos",
            "use_cnn_module": True, "cnn_module_kernel": WK,
            "macaron_style": True, "causal": False},
        "decoder": "bitransformer",
        "decoder_conf": {"attention_heads": WHEADS, "linear_units": WFF,
                         "num_blocks": 1, "r_num_blocks": 1,
                         "dropout_rate": 0.0},
        "model_conf": {"ctc_weight": 0.3, "lsm_weight": 0.1,
                       "reverse_weight": 0.3},
        "input_dim": WF, "output_dim": WV,
        "dataset_conf": {"fbank_conf": {"num_mel_bins": WF,
                                        "frame_shift": 10,
                                        "frame_length": 25,
                                        "dither": 0.1}},
    }
    with open(d / "train_aed.yaml", "w") as f:
        yaml.safe_dump(wenet_yaml, f)
    vocab = ["<blank>", "<unk>"] + CJK27 + ["<sos/eos>"]
    assert len(vocab) == WV
    (d / "words.txt").write_text(
        "\n".join(f"{t} {i}" for i, t in enumerate(vocab)) + "\n",
        encoding="utf-8")
    return d


def _make_data_dir(root, name, rng, utts, prefix="U"):
    """wav dir + kaldi-style data dir (wav.scp, text) -> format.data."""
    d = root / "data" / name
    wavd = root / "wavs" / name
    d.mkdir(parents=True, exist_ok=True)
    wavd.mkdir(parents=True, exist_ok=True)
    scp, txt = [], []
    for i, text in enumerate(utts):
        utt = f"{prefix}{name}{i:03d}"
        p = wavd / f"{utt}.wav"
        write_wav(str(p), _sine(rng, float(rng.uniform(0.5, 0.9))), 16000)
        scp.append(f"{utt} {p}")
        txt.append(f"{utt} {text}")
    (d / "wav.scp").write_text("\n".join(scp) + "\n", encoding="utf-8")
    (d / "text").write_text("\n".join(txt) + "\n", encoding="utf-8")
    _run_sh([sys.executable, os.path.join(REPO, "tools/format_data.py"),
             str(d)], str(root))
    return d


def test_wenet_pretrained_decoding_run_sh(tmp_path, rng):
    """examples/wenet_pre-trained_decoding/run.sh end-to-end against a
    self-synthesized WeNet release: convert (.pt + train_aed.yaml ->
    framework checkpoint + adapted config) -> rescoring decode -> WER.
    Reference examples/wenet_pre-trained_decoding/run.sh:28-97."""
    release = _wenet_release_dir(tmp_path, rng)
    work = tmp_path / "work"
    work.mkdir()
    utts = [" ".join(CJK27[int(rng.integers(len(CJK27)))]
                     for _ in range(int(rng.integers(2, 5))))
            for _ in range(4)]
    _make_data_dir(work, "test", rng, utts)

    r = _run_sh(["bash", os.path.join(
        REPO, "examples/wenet_pre-trained_decoding/run.sh"),
        "--model_dir", str(release), "--d_model", str(WD),
        "--beam_size", "4"], str(work))
    hyp = work / "exp" / "wenet_decode" / "hyp_attention_rescoring.txt"
    assert hyp.exists(), "decode wrote no hypotheses"
    assert len(hyp.read_text(encoding="utf-8").splitlines()) == len(utts)
    # stage 2 pipes compute_wer | tail -1: the Overall line must be real
    assert re.search(r"(\d+\.\d+)", r.stdout.splitlines()[-1] if
                     r.stdout.splitlines() else ""), r.stdout[-2000:]
    # the adapted config must carry the release architecture, not defaults
    adapted = yaml.safe_load(
        (work / "exp" / "wenet_decode" / "train.yaml").read_text())
    assert adapted["model_conf"]["d_model"] == WD
    assert adapted["model_conf"]["r_decoder_num_blocks"] == 1
    assert adapted["vocab_size"] == WV


def test_asrucs2019_run_sh(tmp_path, rng):
    """examples/asrucs2019/run.sh end-to-end on a tiny synthetic CN+EN+
    code-switch corpus with the WeNet-init + adapter-only fine-tune path
    (--pretrained + --only_adapter). Reference
    examples/asrucs2019/run.sh:31-115."""
    release = _wenet_release_dir(tmp_path, rng)
    work = tmp_path / "work"
    work.mkdir()
    # convert the release for --pretrained (recipe precondition)
    _run_sh([sys.executable, "-m", "openeat_tpu.bin.convert_wenet",
             "--pt", str(release / "final.pt"), "--d_model", str(WD),
             "--out", str(work / "pretrained" / "converted")], str(work))

    en_words = ["HELLO", "WORLD", "GOOD", "MORNING", "NIGHT", "SPEECH"]

    def cn(n):
        return [" ".join(CJK27[int(rng.integers(len(CJK27)))]
                         for _ in range(int(rng.integers(2, 5))))
                for _ in range(n)]

    def en(n):
        return [" ".join(en_words[int(rng.integers(len(en_words)))]
                         for _ in range(int(rng.integers(1, 4))))
                for _ in range(n)]

    def cs(n):
        return [f"{c} {e}" for c, e in zip(cn(n), en(n))]

    _make_data_dir(work, "train_cn", rng, cn(6))
    _make_data_dir(work, "train_en", rng, en(6))
    _make_data_dir(work, "train_cs", rng, cs(6))
    _make_data_dir(work, "dev_cs", rng, cs(4))
    _make_data_dir(work, "test_cs", rng, cs(4))

    # tiny conf matching the WeNet release shapes, with adapters ON so
    # --only_adapter freezes the (partially initialized) backbone
    conf = {
        "model_conf": {
            "d_model": WD, "attention_heads": WHEADS, "linear_units": WFF,
            "encoder_num_blocks": 2, "decoder_num_blocks": 1,
            "r_decoder_num_blocks": 1, "reverse_weight": 0.3,
            "input_layer": "conv2d", "pos_enc_layer_type": "rel_pos",
            "macaron_style": True, "use_cnn_module": True,
            "cnn_module_kernel": WK, "ctc_weight": 0.3,
            "compute_dtype": "float32", "dropout_rate": 0.0,
            "encoder_use_adapter": True, "decoder_use_adapter": True,
            "down_size": 8, "scalar": 0.1},
        "collate_conf": {
            "feature_extraction_conf": {"resample_rate": 16000,
                                        "mel_bins": WF,
                                        "wav_dither": 0.0},
            "spec_aug": False},
        "dataset_conf": {"max_length": 2000, "min_length": 5,
                         "batch_type": "static", "batch_size": 8,
                         "sort": True},
        "grad_clip": 5, "max_epoch": 2, "accum_grad": 1,
        "log_interval": 5, "optim": "adam",
        "optim_conf": {"lr": 0.002}, "warmup_epoch": 1,
    }
    conf_path = tmp_path / "tiny_cs.yaml"
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)

    r = _run_sh(["bash", os.path.join(REPO, "examples/asrucs2019/run.sh"),
                 "--config", str(conf_path),
                 "--pretrained", str(work / "pretrained" / "converted"),
                 "--only_adapter", "true",
                 "--average_num", "2", "--beam_size", "4"], str(work))
    hyp = work / "exp" / "cs_conformer" / "hyp.txt"
    assert hyp.exists(), "decode wrote no hypotheses"
    assert len(hyp.read_text(encoding="utf-8").splitlines()) == 4
    assert re.search(r"(\d+\.\d+)", r.stdout.splitlines()[-1] if
                     r.stdout.splitlines() else ""), r.stdout[-2000:]
    # the exp config must record global CMVN inherited from the WeNet
    # checkpoint (raw-fbank features + stats from the release)
    resolved = yaml.safe_load(
        (work / "exp" / "cs_conformer" / "train.yaml").read_text())
    assert resolved["use_global_cmvn"] is True
