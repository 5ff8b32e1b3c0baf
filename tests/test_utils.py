"""Unit tests for masks and common helpers vs hand values / numpy refs."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from openeat_tpu.utils import common, mask


def test_subsequent_mask():
    m = np.asarray(mask.subsequent_mask(3))
    expect = np.array([[1, 0, 0], [1, 1, 0], [1, 1, 1]], dtype=bool)
    np.testing.assert_array_equal(m, expect)


def test_pad_masks():
    lens = jnp.array([1, 3, 2])
    pm = np.asarray(mask.make_pad_mask(lens, 4))
    expect = np.array([
        [False, True, True, True],
        [False, False, False, True],
        [False, False, True, True],
    ])
    np.testing.assert_array_equal(pm, expect)
    np.testing.assert_array_equal(
        np.asarray(mask.make_non_pad_mask(lens, 4)), ~expect)


def test_attn_mask_causal():
    lens = jnp.array([2, 3])
    m = np.asarray(mask.make_attn_mask(lens, 3, causal=True))
    assert m.shape == (2, 3, 3)
    # batch 0: len 2, causal
    expect0 = np.array([[1, 0, 0], [1, 1, 0], [1, 1, 0]], dtype=bool)
    np.testing.assert_array_equal(m[0], expect0)


def test_add_sos_eos():
    ys = jnp.array([[3, 4, 5], [6, -1, -1]])
    lens = jnp.array([3, 1])
    sos, eos = 10, 11
    ys_in, ys_out = common.add_sos_eos(ys, lens, sos, eos)
    np.testing.assert_array_equal(
        np.asarray(ys_in), [[10, 3, 4, 5], [10, 6, 11, 11]])
    np.testing.assert_array_equal(
        np.asarray(ys_out), [[3, 4, 5, 11], [6, 11, -1, -1]])


def test_reverse_pad_list():
    ys = jnp.array([[1, 2, 3, -1], [4, 5, -1, -1]])
    lens = jnp.array([3, 2])
    r = common.reverse_pad_list(ys, lens)
    np.testing.assert_array_equal(
        np.asarray(r), [[3, 2, 1, -1], [5, 4, -1, -1]])


def test_th_accuracy():
    logits = jnp.array([[[0.1, 0.9], [0.8, 0.2]],
                        [[0.3, 0.7], [0.6, 0.4]]])
    target = jnp.array([[1, 0], [0, -1]])  # 2 correct of 3 valid
    acc = float(common.th_accuracy(logits, target))
    np.testing.assert_allclose(acc, 2.0 / 3.0, rtol=1e-6)


def test_remove_duplicates_and_blank():
    assert common.remove_duplicates_and_blank([0, 1, 1, 0, 2, 2, 3]) == [1, 2, 3]


def test_ctc_collapse_device_matches_python():
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 4, size=(5, 12))
    dev = np.asarray(common.ctc_collapse_device(jnp.asarray(toks)))
    for b in range(5):
        want = common.remove_duplicates_and_blank(toks[b])
        got = [t for t in dev[b] if t != common.IGNORE_ID]
        assert got == want


def test_log_add():
    import math
    vals = [-1.0, -2.0, -3.0]
    want = math.log(sum(math.exp(v) for v in vals))
    np.testing.assert_allclose(common.log_add(vals), want, rtol=1e-9)
    assert common.log_add([-float("inf")] * 2) == -float("inf")


def test_mask_finished_scores_and_preds():
    scores = jnp.zeros((2, 3))
    end = jnp.array([True, False])
    out = np.asarray(mask.mask_finished_scores(scores, end, eos_index=0))
    assert out[0, 0] == 0.0 and out[0, 1] < -1e8
    np.testing.assert_array_equal(out[1], np.zeros(3))
    preds = jnp.array([[1, 2, 3], [4, 5, 6]])
    p = np.asarray(mask.mask_finished_preds(preds, end, eos=9))
    np.testing.assert_array_equal(p, [[9, 9, 9], [4, 5, 6]])


def test_compare_wer_paired_bootstrap(tmp_path):
    """tools/compare_wer.py: a systematic 1-char-per-utt advantage for
    B must produce delta>0 with a CI excluding 0; identical files give
    delta 0 with p_sign 1."""
    import json
    import subprocess
    import sys
    ref = tmp_path / "ref.txt"
    ha = tmp_path / "a.txt"
    hb = tmp_path / "b.txt"
    n = 64
    with open(ref, "w") as fr, open(ha, "w") as fa, open(hb, "w") as fb:
        for i in range(n):
            sent = "甲 乙 丙 丁 戊 己 庚 辛"
            fr.write(f"u{i} {sent}\n")
            fb.write(f"u{i} {sent}\n")
            fa.write(f"u{i} {sent.replace('戊', '壬', 1)}\n")
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "compare_wer.py")
    r = subprocess.run([sys.executable, tool, str(ref), str(ha), str(hb),
                        "--n_boot", "2000"], capture_output=True,
                       text=True, check=True)
    out = json.loads(r.stdout)
    assert out["cer_b"] == 0.0
    assert out["delta"] == pytest.approx(100.0 / 8, abs=0.01)
    lo, hi = out["delta_ci95"]
    assert lo > 0 and out["p_a_worse_bootstrap"] == 1.0
    assert out["discordant"] == {"a_worse": n, "b_worse": 0}
    assert out["p_sign_test"] < 1e-6
    r2 = subprocess.run([sys.executable, tool, str(ref), str(hb),
                         str(hb), "--n_boot", "200"],
                        capture_output=True, text=True, check=True)
    out2 = json.loads(r2.stdout)
    assert out2["delta"] == 0.0 and out2["p_sign_test"] == 1.0
