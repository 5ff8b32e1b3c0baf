"""Tests for the data-dir utilities, format_data, build_dict, rover."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu",
           PALLAS_AXON_POOL_IPS="")


def run_tool(*args, **kw):
    return subprocess.run([sys.executable] + list(args), cwd=REPO,
                          env=ENV, capture_output=True, text=True, **kw)


@pytest.fixture
def data_dir(tmp_path, rng):
    from openeat_tpu.dataset.audio import write_wav
    d = tmp_path / "data"
    d.mkdir()
    wavs, texts, u2s = [], [], []
    for i in range(6):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, (rng.standard_normal(8000) * 0.1).astype(np.float32),
                  16000)
        wavs.append(f"utt{i} {p}")
        texts.append(f"utt{i} 你好{i}")
        u2s.append(f"utt{i} spk{i % 2}")
    (d / "wav.scp").write_text("\n".join(wavs) + "\n")
    (d / "text").write_text("\n".join(texts) + "\n", encoding="utf-8")
    (d / "utt2spk").write_text("\n".join(u2s) + "\n")
    return str(d)


def test_validate_and_fix(data_dir):
    r = run_tool("tools/data_dir.py", "validate", data_dir)
    assert r.returncode == 0, r.stderr
    # break it: drop an utt from text
    text = open(os.path.join(data_dir, "text"), encoding="utf-8").read()
    open(os.path.join(data_dir, "text"), "w", encoding="utf-8").write(
        "\n".join(text.strip().split("\n")[:-1]) + "\n")
    r = run_tool("tools/data_dir.py", "validate", data_dir)
    assert r.returncode == 1
    r = run_tool("tools/data_dir.py", "fix", data_dir)
    assert r.returncode == 0
    r = run_tool("tools/data_dir.py", "validate", data_dir)
    assert r.returncode == 0


def test_subset_and_split(data_dir, tmp_path):
    out = str(tmp_path / "subset")
    r = run_tool("tools/data_dir.py", "subset", data_dir, out, "--n", "3")
    assert r.returncode == 0
    assert len(open(os.path.join(out, "text"),
                    encoding="utf-8").readlines()) == 3
    tr, cv = str(tmp_path / "tr"), str(tmp_path / "cv")
    r = run_tool("tools/data_dir.py", "tr_cv_split", data_dir, tr, cv,
                 "--cv_spk_frac", "0.5")
    assert r.returncode == 0
    tr_spk = {l.split()[1] for l in open(os.path.join(tr, "utt2spk"))}
    cv_spk = {l.split()[1] for l in open(os.path.join(cv, "utt2spk"))}
    assert not (tr_spk & cv_spk)  # speaker-disjoint


def test_format_data(data_dir):
    r = run_tool("tools/format_data.py", data_dir)
    assert r.returncode == 0, r.stderr
    lines = open(os.path.join(data_dir, "format.data"),
                 encoding="utf-8").read().strip().split("\n")
    assert len(lines) == 6
    fields = lines[0].split("\t")
    assert fields[0].startswith("utt:") and fields[1].startswith("feat:")
    assert abs(float(fields[2].split(":")[1]) - 0.5) < 1e-3  # 8000/16000


def test_build_dict(data_dir, tmp_path):
    out = str(tmp_path / "dict.txt")
    r = run_tool("tools/build_dict.py", os.path.join(data_dir, "text"),
                 out)
    assert r.returncode == 0, r.stderr
    lines = open(out, encoding="utf-8").read().strip().split("\n")
    assert lines[0] == "<blank> 0" and lines[1] == "<unk> 1"
    assert lines[-1].startswith("<sos/eos>")


def test_rover(tmp_path):
    h1 = tmp_path / "h1.txt"
    h2 = tmp_path / "h2.txt"
    h3 = tmp_path / "h3.txt"
    h1.write_text("u1 你好世界\n", encoding="utf-8")
    h2.write_text("u1 你好世届\n", encoding="utf-8")
    h3.write_text("u1 你好世界\n", encoding="utf-8")
    out = tmp_path / "rover.txt"
    r = run_tool("tools/rover.py", str(out), str(h1), str(h2), str(h3))
    assert r.returncode == 0, r.stderr
    assert open(out, encoding="utf-8").read().strip() == "u1 你好世界"


def test_wer_clusters():
    from openeat_tpu.utils.wer import corpus_wer
    refs = {"u1": "你好 HELLO WORLD"}
    hyps = {"u1": "你坏 HELLO"}
    total, per = corpus_wer(refs, hyps, clusters=True)
    assert per["Mandarin"].sub == 1 and per["Mandarin"].cor == 1
    assert per["English"].cor == 1 and per["English"].dele == 1
    assert total.errors == 2


def test_compute_cmvn(tmp_path, rng):
    # tiny manifest from the shared fixture builder
    from tests.make_tiny_data import build as build_tiny
    d = build_tiny(str(tmp_path / "data"), n_utts=4)
    out = str(tmp_path / "cmvn.json")
    r = run_tool("tools/compute_cmvn.py", d["manifest"], out,
                 "--mel_bins", "40", "--batch_size", "2")
    assert r.returncode == 0, r.stderr
    from openeat_tpu.utils.cmvn import load_cmvn
    mean, istd = load_cmvn(out, is_json=True)
    assert mean.shape == (40,) and istd.shape == (40,)
    assert np.all(np.isfinite(mean)) and np.all(istd > 0)
    # sanity: log-mel means of real audio are O(1..20)
    assert -50 < mean.mean() < 50
