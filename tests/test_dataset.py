"""Dataset pipeline tests: wav IO, speed perturb, tokenizer, BPE,
manifest, batching, collate, prefetch loader, kaldi ark."""

import numpy as np
import pytest

from openeat_tpu.dataset import audio, batching, bpe, kaldi_io, text
from openeat_tpu.dataset.dataset import (AudioCollate, AudioDataset,
                                         PrefetchLoader, TextCollate,
                                         TextDataset)
from openeat_tpu.dataset.manifest import parse_manifest, parse_wav_entry
from tests.make_tiny_data import build as build_tiny


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiny")
    return build_tiny(str(root), n_utts=12)


def test_wav_roundtrip(tmp_path, rng):
    x = (rng.standard_normal(8000) * 0.2).astype(np.float32)
    p = str(tmp_path / "a.wav")
    audio.write_wav(p, x, 16000)
    y, rate = audio.read_wav(p)
    assert rate == 16000 and len(y) == 8000
    np.testing.assert_allclose(x, y, atol=1.0 / 32000)


def test_wav_segment(tmp_path, rng):
    x = (rng.standard_normal(16000) * 0.2).astype(np.float32)
    p = str(tmp_path / "b.wav")
    audio.write_wav(p, x, 16000)
    y, _ = audio.read_wav(p, 0.25, 0.75)
    assert len(y) == 8000
    full, _ = audio.read_wav(p)
    np.testing.assert_array_equal(y, full[4000:12000])


def test_speed_perturb_duration():
    t = np.arange(16000) / 16000.0
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y = audio.speed_perturb(x, 16000, 1.1)
    assert abs(len(y) - 16000 / 1.1) < 20
    z = audio.speed_perturb(x, 16000, 0.9)
    assert abs(len(z) - 16000 / 0.9) < 20
    # pitch shifts with playback speed: 440 Hz tone -> ~484 Hz
    spec = np.abs(np.fft.rfft(y[:8192]))
    peak = np.argmax(spec) * 16000 / 8192
    assert abs(peak - 484) < 6


def test_resample():
    t = np.arange(8000) / 8000.0
    x = np.sin(2 * np.pi * 300.0 * t).astype(np.float32)
    y = audio.resample(x, 8000, 16000)
    assert len(y) == 16000


def test_tokenizer_cjk_mix():
    toks = text.tokenize("你好 it's ok 的")
    assert toks == ["你", "好", "IT'S OK", "的"]
    assert text.remove_punctuation("你好，世界！Hi, there.") == "你好世界Hi there"


def test_text_to_token_ids_unk():
    d = {"<blank>": 0, "<unk>": 1, "你": 2, "好": 3, "<sos/eos>": 4}
    ids = text.text_to_token_ids("你好啊", d)
    assert ids == [2, 3, 1]


def test_bpe_train_encode_decode(tmp_path):
    lines = ["hello world", "hello there", "world war", "hello hello world"]
    model = bpe.train_bpe(lines, vocab_size=40)
    pieces = model.encode_as_pieces("HELLO WORLD")
    assert model.decode_pieces(pieces) == "HELLO WORLD"
    assert len(pieces) < len("HELLOWORLD") + 2  # some merges learned
    p = str(tmp_path / "bpe.json")
    model.save(p)
    again = bpe.BPEModel.load(p)
    assert again.encode_as_pieces("HELLO WORLD") == pieces


def test_manifest_and_batching(tiny):
    d = text.load_dict(tiny["dict"])
    utts = parse_manifest(tiny["manifest"], d, max_length=100000)
    assert len(utts) == 12
    assert all(u.num_frames > 0 and len(u.token_ids) > 0 for u in utts)
    # sorted ascending
    frames = [u.num_frames for u in utts]
    assert frames == sorted(frames)
    batches = batching.make_batches(utts, "dynamic",
                                    max_frames_in_batch=300)
    assert sum(len(b) for b in batches) == 12
    for b in batches[:-1]:
        assert sum(u.num_frames for u in b) <= 300 + max(
            u.num_frames for u in b)
    static = batching.make_batches(utts, "static", batch_size=5)
    assert [len(b) for b in static] == [5, 5, 2]


def test_speed_perturb_expansion(tiny):
    d = text.load_dict(tiny["dict"])
    utts = parse_manifest(tiny["manifest"], d, max_length=100000,
                          speed_perturb=True, speeds=(0.9, 1.1, 0.1))
    assert len(utts) == 36  # 3 speeds per utt, no compounding
    speeds = sorted({u.speed for u in utts})
    assert speeds == [0.9, 1.0, 1.1]


def test_audio_collate_shapes(tiny):
    d = text.load_dict(tiny["dict"])
    ds = AudioDataset(tiny["manifest"], d, batch_type="static",
                      batch_size=4, max_length=100000)
    collate = AudioCollate(wav_bucket_ms=500)
    keys, batch = collate(ds[0])
    assert len(keys) == 4
    assert batch["wav"].shape[0] == 4
    assert batch["wav"].shape[1] % 8000 == 0  # bucketed
    assert batch["targets"].shape[1] % 8 == 0
    # sorted desc by length
    assert list(batch["wav_lens"]) == sorted(batch["wav_lens"],
                                             reverse=True)
    # x32768 scaling
    assert np.abs(batch["wav"]).max() > 100


def test_audio_collate_int16_transfer(tiny):
    """int16 (the default transfer dtype, docs/AXON_NOTES.md) is exact
    for PCM sources: the x32768 scaling restores raw sample values."""
    d = text.load_dict(tiny["dict"])
    ds = AudioDataset(tiny["manifest"], d, batch_type="static",
                      batch_size=4, max_length=100000)
    _, b16 = AudioCollate(seed=1)(ds[0])
    _, b32 = AudioCollate(seed=1, wav_dtype="float32")(ds[0])
    assert b16["wav"].dtype == np.int16
    assert b32["wav"].dtype == np.float32
    np.testing.assert_array_equal(b16["wav"].astype(np.float32),
                                  b32["wav"])
    # device frontend accepts either dtype and produces identical feats
    import jax
    from openeat_tpu.ops.frontend import FrontendConfig, compute_features
    cfg = FrontendConfig.from_collate_conf(
        {"feature_extraction_conf": {"mel_bins": 23}})
    k = jax.random.PRNGKey(0)
    f16, l16 = compute_features(jax.numpy.asarray(b16["wav"]),
                                jax.numpy.asarray(b16["wav_lens"]), k,
                                cfg, False)
    f32, l32 = compute_features(jax.numpy.asarray(b32["wav"]),
                                jax.numpy.asarray(b32["wav_lens"]), k,
                                cfg, False)
    np.testing.assert_array_equal(np.asarray(l16), np.asarray(l32))
    np.testing.assert_allclose(np.asarray(f16), np.asarray(f32),
                               atol=1e-5)


def test_prefetch_loader(tiny):
    d = text.load_dict(tiny["dict"])
    ds = AudioDataset(tiny["manifest"], d, batch_type="static",
                      batch_size=4, max_length=100000)
    loader = PrefetchLoader(ds, AudioCollate(), num_workers=2)
    seen = list(loader)
    assert len(seen) == len(ds)


def test_text_dataset_and_masking(tiny):
    d = text.load_dict(tiny["dict"])
    ds = TextDataset(tiny["text"], d, batch_size=6)
    assert len(ds) >= 1
    ar = TextCollate(len(d), autoregressive=True)(ds[0])
    assert ar["tokens"].shape[0] == len(ds[0])
    mlm = TextCollate(len(d), autoregressive=False, seed=3)(ds[0])
    masked = mlm["masked_targets"] != -1
    assert masked.any()
    # masked targets hold the original token
    orig = TextCollate(len(d), autoregressive=True)(ds[0])["tokens"]
    np.testing.assert_array_equal(mlm["masked_targets"][masked],
                                  orig[masked])


def test_kaldi_ark_roundtrip(tmp_path, rng):
    mats = {f"utt{i}": rng.standard_normal((10 + i, 8)).astype(np.float32)
            for i in range(3)}
    ark = str(tmp_path / "feats.ark")
    offsets = {}
    with open(ark, "wb") as f:
        for k, m in mats.items():
            offsets[k] = kaldi_io.write_ark_entry(f, k, m)
    for k, m in mats.items():
        got = kaldi_io.read_mat(f"{ark}:{offsets[k]}")
        np.testing.assert_allclose(got, m, rtol=1e-6)


def test_prefetch_loader_sharding(tiny):
    """Every shard yields EXACTLY the same number of batches (wrap-around
    padding like torch DistributedSampler) — an uneven split would leave
    one process alone in the collective train step and hang the pod
    (ADVICE r1)."""
    from openeat_tpu.dataset.text import load_dict as _ld
    d = _ld(tiny["dict"])
    ds = AudioDataset(tiny["manifest"], d, batch_type="static",
                      batch_size=2, max_length=100000)
    for num_shards in (3, 4, 5):
        per_shard = -(-len(ds) // num_shards)
        all_keys = set()
        for shard in range(num_shards):
            loader = PrefetchLoader(ds, AudioCollate(), num_workers=1,
                                    shard_id=shard, num_shards=num_shards)
            got = list(loader)
            assert len(got) == per_shard == len(loader), (
                num_shards, shard, len(got))
            for keys, _ in got:
                all_keys.update(keys)
        # wrap-around duplicates a few batches but misses none
        assert len(all_keys) == sum(len(b) for b in ds.batches)


def test_kaldi_compressed_roundtrip(tmp_path, rng):
    mat = (rng.standard_normal((40, 12)) * 5).astype(np.float32)
    ark = str(tmp_path / "comp.ark")
    with open(ark, "wb") as f:
        off = kaldi_io.write_compressed_ark_entry(f, "u0", mat)
    got = kaldi_io.read_mat(f"{ark}:{off}")
    assert got.shape == mat.shape
    # 8-bit percentile quantization: fractions of the column range
    err = np.abs(got - mat).max()
    span = mat.max() - mat.min()
    assert err < span * 0.05, (err, span)


def test_kaldi_cm_golden_handassembled(tmp_path):
    """Hand-assembled 'CM' (CompressedMatrix format 1) entry, decoded
    values computed with scalar python from the kaldi source formulas
    (src/matrix/compressed-matrix.cc Uint16ToFloat/CharToFloat) — pins
    the reader's wire-format reading independently of the same-author
    writer (VERDICT r1 item 9; no kaldi binary exists offline to
    generate a fixture)."""
    import struct as _struct
    min_value, rng_ = -3.25, 10.5
    rows, cols = 9, 2
    # per-column percentile headers as raw uint16
    heads = [[0, 16384, 49152, 65535], [100, 20000, 40000, 60000]]
    codes = [[0, 1, 30, 64, 65, 100, 192, 193, 255],
             [255, 220, 193, 192, 100, 65, 64, 30, 0]]
    payload = _struct.pack("<ffii", min_value, rng_, rows, cols)
    for h in heads:
        payload += _struct.pack("<4H", *h)
    for c in codes:
        payload += bytes(c)
    ark = str(tmp_path / "golden.ark")
    with open(ark, "wb") as f:
        f.write(b"utt1 ")
        off = f.tell()
        f.write(b"\x00BCM " + payload)

    def u16_to_float(u):
        return min_value + rng_ * (1.0 / 65535.0) * u

    def char_to_float(p0, p25, p75, p100, v):
        if v <= 64:
            return p0 + (p25 - p0) * v * (1 / 64.0)
        if v <= 192:
            return p25 + (p75 - p25) * (v - 64) * (1 / 128.0)
        return p75 + (p100 - p75) * (v - 192) * (1 / 63.0)

    want = np.zeros((rows, cols), np.float64)
    for c in range(cols):
        p = [u16_to_float(u) for u in heads[c]]
        for r in range(rows):
            want[r, c] = char_to_float(*p, codes[c][r])
    got = kaldi_io.read_mat(f"{ark}:{off}")
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_kaldi_cm2_golden_handassembled(tmp_path):
    import struct as _struct
    min_value, rng_ = 1.5, 2.0
    rows, cols = 2, 3
    vals = [0, 1, 32768, 65535, 12345, 54321]
    payload = _struct.pack("<ffii", min_value, rng_, rows, cols)
    payload += _struct.pack("<6H", *vals)
    ark = str(tmp_path / "golden2.ark")
    with open(ark, "wb") as f:
        f.write(b"u ")
        off = f.tell()
        f.write(b"\x00BCM2 " + payload)
    got = kaldi_io.read_mat(f"{ark}:{off}")
    want = np.asarray([min_value + rng_ * v / 65535.0 for v in vals],
                      np.float64).reshape(rows, cols)
    np.testing.assert_allclose(got, want, rtol=1e-6)
