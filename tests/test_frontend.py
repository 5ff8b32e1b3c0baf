"""Frontend tests: fbank vs numpy oracle, augmentation semantics, CMVN."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openeat_tpu.ops import fbank as fb
from openeat_tpu.ops import specaug
from openeat_tpu.ops.frontend import FrontendConfig, compute_features
from openeat_tpu.utils import cmvn as cmvn_utils


def _wav(rng, n):
    return (rng.standard_normal(n) * 0.1 * 32768).astype(np.float32)


def test_fbank_matches_numpy_oracle(rng):
    wav = _wav(rng, 16000)  # 1 s
    ref = fb.fbank_numpy_reference(wav)
    feats, flens = fb.fbank(jnp.asarray(wav)[None], jnp.array([16000]))
    got = np.asarray(feats[0])[: int(flens[0])]
    assert ref.shape == got.shape == (98, 80)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-3)


def test_fbank_batch_padding_consistency(rng):
    """A short utterance padded inside a longer batch must produce the
    same leading frames as when processed alone."""
    w1, w2 = _wav(rng, 8000), _wav(rng, 16000)
    batch = np.zeros((2, 16000), np.float32)
    batch[0, :8000] = w1
    batch[1] = w2
    feats, flens = fb.fbank(jnp.asarray(batch), jnp.array([8000, 16000]))
    solo, slens = fb.fbank(jnp.asarray(w1)[None], jnp.array([8000]))
    n = int(slens[0])
    assert int(flens[0]) == n
    np.testing.assert_allclose(np.asarray(feats[0][:n]),
                               np.asarray(solo[0][:n]), rtol=1e-5, atol=1e-4)


def test_fbank_sine_peak_bin():
    """A pure 1 kHz tone must put its energy at the right mel bin."""
    t = np.arange(16000) / 16000.0
    wav = (np.sin(2 * np.pi * 1000.0 * t) * 32768).astype(np.float32)
    feats, _ = fb.fbank(jnp.asarray(wav)[None], jnp.array([16000]),
                        remove_dc_offset=True)
    mean_spec = np.asarray(feats[0]).mean(axis=0)
    peak = int(np.argmax(mean_spec))
    # mel(1000 Hz) relative position between mel(20) and mel(8000):
    m = fb.mel_scale(np.array([20.0, 1000.0, 8000.0]))
    expect = int(round((m[1] - m[0]) / (m[2] - m[0]) * 81 - 1))
    assert abs(peak - expect) <= 1


def test_mel_banks_shape_and_coverage():
    mel = fb.mel_banks(80, 512, 16000.0)
    assert mel.shape == (257, 80)
    assert np.all(mel >= 0)
    assert np.all(mel[-1] == 0)  # nyquist row zero
    # every interior fft bin above low_freq contributes somewhere
    freqs = np.arange(257) * (16000.0 / 512)
    inside = (freqs > 40) & (freqs < 7800)
    inside[-1] = False  # nyquist row is zero by convention
    assert np.all(mel[inside, :].sum(axis=1) > 0)


def test_per_utt_normalize(rng):
    x = rng.standard_normal((2, 20, 8)).astype(np.float32) * 3 + 1
    lens = jnp.array([20, 10])
    out = np.asarray(specaug.per_utt_normalize(jnp.asarray(x), lens))
    np.testing.assert_allclose(out[0].mean(0), 0, atol=1e-5)
    np.testing.assert_allclose(out[0].std(0), 1, atol=1e-3)
    np.testing.assert_allclose(out[1][:10].mean(0), 0, atol=1e-5)


def test_spec_augment_masks(rng):
    x = np.ones((2, 100, 80), np.float32)
    lens = jnp.array([100, 50])
    out = np.asarray(specaug.spec_augment(
        jnp.asarray(x), lens, jax.random.PRNGKey(0),
        num_t_mask=3, num_f_mask=2, max_t=50, max_f=10))
    assert (out == 0).any()           # something masked
    assert (out == 1).any()           # not everything masked
    assert set(np.unique(out)) <= {0.0, 1.0}
    # time-mask starts are drawn within each utterance's valid length
    # (can extend past it by at most max_t-1)
    masked_frames_b1 = np.where((out[1] == 0).all(axis=1))[0]
    if len(masked_frames_b1):
        assert masked_frames_b1.min() < 50


def test_spec_substitute_copies_earlier(rng):
    x = np.arange(2 * 50 * 4, dtype=np.float32).reshape(2, 50, 4)
    lens = jnp.array([50, 50])
    out = np.asarray(specaug.spec_substitute(
        jnp.asarray(x), lens, jax.random.PRNGKey(1), max_t=10, num_t_sub=2))
    assert out.shape == x.shape
    # every output frame must be one of the input frames (a copy), and
    # sources only come from earlier-or-equal positions
    for b in range(2):
        for t in range(50):
            srcs = np.where((x[b] == out[b, t]).all(axis=1))[0]
            assert len(srcs) >= 1 and srcs.min() <= t


def test_compute_features_train_vs_eval(rng):
    wav = jnp.asarray(np.stack([_wav(rng, 16000), _wav(rng, 16000)]))
    lens = jnp.array([16000, 12000])
    cfg = FrontendConfig(spec_aug=True, feature_dither=0.1)
    f_tr, l_tr = compute_features(wav, lens, jax.random.PRNGKey(0), cfg, True)
    cfg_cv = cfg.without_augmentation()
    f_cv, l_cv = compute_features(wav, lens, jax.random.PRNGKey(0), cfg_cv, False)
    assert f_tr.shape == f_cv.shape
    np.testing.assert_array_equal(np.asarray(l_tr), np.asarray(l_cv))
    # eval path is deterministic
    f_cv2, _ = compute_features(wav, lens, jax.random.PRNGKey(7), cfg_cv, False)
    np.testing.assert_array_equal(np.asarray(f_cv), np.asarray(f_cv2))
    # padded region stays zero
    assert np.all(np.asarray(f_cv[1][int(l_cv[1]):]) == 0)


def test_cmvn_loaders(tmp_path):
    d = 4
    mean_stat = np.array([4.0, 8.0, 0.0, -4.0])
    var_stat = np.array([20.0, 40.0, 10.0, 20.0])
    count = 4.0
    jf = tmp_path / "cmvn.json"
    jf.write_text(json.dumps({"mean_stat": mean_stat.tolist(),
                              "var_stat": var_stat.tolist(),
                              "frame_num": count}))
    m1, s1 = cmvn_utils.load_cmvn(str(jf), is_json=True)
    kf = tmp_path / "cmvn.txt"
    kf.write_text("[ " + " ".join(str(x) for x in mean_stat) + f" {count}\n"
                  + " ".join(str(x) for x in var_stat) + " 0 ]")
    m2, s2 = cmvn_utils.load_cmvn(str(kf), is_json=False)
    np.testing.assert_allclose(m1, m2, rtol=1e-6)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
    np.testing.assert_allclose(m1, mean_stat / count, rtol=1e-6)
    want_istd = 1 / np.sqrt(var_stat / count - (mean_stat / count) ** 2)
    np.testing.assert_allclose(s1, want_istd, rtol=1e-5)


def test_fbank_too_short_raises():
    with pytest.raises(ValueError):
        fb.fbank(jnp.zeros((1, 100)), jnp.array([100]))
