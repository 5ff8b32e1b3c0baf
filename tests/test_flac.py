"""FLAC codec tests: roundtrips, hand-assembled golden bitstream, LPC
path vs hand-computed prediction, CRC/MD5 corruption detection, native
C++ decoder vs the python oracle, and the collate e2e (FLAC corpus
bit-matches the same audio as WAV — the LibriSpeech ingestion path,
reference openeat/dataset/dataset.py:62-72)."""

import os

import numpy as np
import pytest

from openeat_tpu.dataset import audio, flac
from openeat_tpu.dataset.flac import (_BitWriter, crc8, crc16, decode_flac,
                                      encode_flac, read_flac, write_flac)


def _crc8_ref(data: bytes) -> int:
    """Independent bitwise CRC-8 (poly x^8+x^2+x+1), no table."""
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1)
    return crc & 0xFF


def _crc16_ref(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def test_crc_tables_match_bitwise_reference(rng):
    blob = rng.integers(0, 256, 257).astype(np.uint8).tobytes()
    assert crc8(blob) == _crc8_ref(blob)
    assert crc16(blob) == _crc16_ref(blob)


@pytest.mark.parametrize("content", ["tone", "noise", "ramp", "const"])
@pytest.mark.parametrize("nch", [1, 2])
def test_roundtrip_bit_exact(content, nch, rng):
    n = 5000
    t = np.arange(n)
    if content == "tone":
        x = (9000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int64)
    elif content == "noise":
        x = rng.integers(-32768, 32768, n)
    elif content == "ramp":
        x = (t * 3 - 6000) % 20000 - 10000
    else:
        x = np.full(n, -42)
    s = np.stack([x] * nch, axis=1) if nch > 1 else x[:, None]
    if nch == 2:
        s = s.copy()
        s[:, 1] = np.roll(x, 7)
    data = encode_flac(s, 16000, bps=16, block_size=1024)
    dec, rate, bps = decode_flac(data)
    assert (rate, bps) == (16000, 16)
    np.testing.assert_array_equal(dec, s)


def test_roundtrip_left_side_and_odd_rate(rng):
    n = 3000
    s = np.stack([rng.integers(-1000, 1000, n),
                  rng.integers(-1000, 1000, n)], axis=1)
    data = encode_flac(s, 12345, bps=16, block_size=512, left_side=True)
    dec, rate, _ = decode_flac(data)
    assert rate == 12345  # 16-bit explicit sample-rate code
    np.testing.assert_array_equal(dec, s)


def test_roundtrip_24bit(rng):
    s = rng.integers(-(1 << 23), 1 << 23, 2000)[:, None]
    data = encode_flac(s, 48000, bps=24)
    dec, rate, bps = decode_flac(data)
    assert (rate, bps) == (48000, 24)
    np.testing.assert_array_equal(dec, s)


def test_golden_handassembled_constant_frame():
    """A minimal FLAC file assembled field-by-field (RFC 9639), CRCs from
    the independent bitwise implementation above — catches convention
    errors a same-author encode/decode roundtrip cannot."""
    rate, n = 16000, 4
    # STREAMINFO: min/max blocksize 4, framesizes 0, rate 16000, 1 ch,
    # 16 bps, 4 total samples, md5 zeroed (decoder skips verification)
    si = bytearray(34)
    si[0:2] = (4).to_bytes(2, "big")
    si[2:4] = (4).to_bytes(2, "big")
    si[10] = rate >> 12            # 16000 = 0x3E80
    si[11] = (rate >> 4) & 0xFF
    si[12] = ((rate & 0xF) << 4) | (0 << 1) | 0   # 1 ch, bps-1=15 -> msb 0
    si[13] = 0xF << 4              # bps-1 low nibble = 15
    si[14:18] = n.to_bytes(4, "big")
    stream = b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(si)
    # Frame header: sync 11111111111110, reserved 0, fixed blocking 0
    #   -> bytes FF F8
    # blocksize code 0110 (8-bit follows), rate code 0101 (16 kHz) -> 65
    # channel 0000, sample size 100 (16 bit), reserved 0 -> 08
    # frame number 0 (utf8) -> 00 ; blocksize-1 = 3 -> 03
    hdr = bytes([0xFF, 0xF8, 0x65, 0x08, 0x00, 0x03])
    hdr += bytes([_crc8_ref(hdr)])
    # Subframe: pad 0, type 000000 (CONSTANT), wasted 0 -> byte 00;
    # value = -5 as 16-bit -> FFFB  (frame is byte-aligned already)
    frame = hdr + bytes([0x00, 0xFF, 0xFB])
    frame += _crc16_ref(frame).to_bytes(2, "big")
    dec, got_rate, bps = decode_flac(stream + frame)
    assert (got_rate, bps) == (rate, 16)
    np.testing.assert_array_equal(dec, np.full((4, 1), -5))


def test_golden_lpc_subframe_hand_computed():
    """LPC decode against hand-computed prediction: x[i] = res[i] +
    ((c0*x[i-1] + c1*x[i-2]) >> shift). The encoder never emits LPC, so
    this bitstream is built directly."""
    blocksize, bps = 8, 16
    warm = [100, 110]
    coefs = [3, -1]          # precision 4 bits
    shift = 1
    res = [5, -3, 2, 0, -1, 4]
    # expected reconstruction
    x = list(warm)
    for r in res:
        pred = (coefs[0] * x[-1] + coefs[1] * x[-2]) >> shift
        x.append(r + pred)

    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)            # reserved + fixed blocking
    w.write(6, 4)            # blocksize: 8-bit follows
    w.write(5, 4)            # 16 kHz
    w.write(0, 4)            # 1 channel
    w.write(4, 3)            # 16 bps
    w.write(0, 1)
    w.write(0, 8)            # frame number 0
    w.write(blocksize - 1, 8)
    hdr = bytes(w.buf)
    w.write(_crc8_ref(hdr), 8)
    # subframe: pad 0, type 100001 (LPC order 2), wasted 0
    w.write(0, 1)
    w.write(0b100001, 6)
    w.write(0, 1)
    for v in warm:
        w.write(v, bps)
    w.write(4 - 1, 4)        # qlp precision 4
    w.write(shift, 5)
    for c in coefs:
        w.write(c, 4)
    # residual: rice method 0, partition order 0, param 3
    w.write(0, 2)
    w.write(0, 4)
    w.write(3, 4)
    for r in res:
        u = (abs(r) << 1) - (1 if r < 0 else 0)
        w.write_unary(u >> 3)
        w.write(u, 3)
    w.align()
    frame = w.getvalue()
    frame += _crc16_ref(frame).to_bytes(2, "big")

    si = bytearray(34)
    si[0:2] = si[2:4] = blocksize.to_bytes(2, "big")
    si[10], si[11] = 16000 >> 12, (16000 >> 4) & 0xFF
    si[12] = (16000 & 0xF) << 4
    si[13] = 0xF0
    si[14:18] = blocksize.to_bytes(4, "big")
    stream = b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(si) + frame
    dec, _, _ = decode_flac(stream)
    np.testing.assert_array_equal(dec[:, 0], np.asarray(x))


def test_corruption_detected(rng):
    s = rng.integers(-5000, 5000, 1000)[:, None]
    data = bytearray(encode_flac(s, 16000))
    data[-10] ^= 0x40  # flip a bit inside the last frame
    with pytest.raises(ValueError):
        decode_flac(bytes(data))


def test_md5_detects_wrong_samples(rng):
    s = rng.integers(-5000, 5000, 600)[:, None]
    data = bytearray(encode_flac(s, 16000))
    data[26] ^= 0xFF  # corrupt a byte of the STREAMINFO md5
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(data))
    got, _, _ = decode_flac(bytes(data), verify_md5=False)
    np.testing.assert_array_equal(got, s)


def test_read_audio_dispatch_and_segments(tmp_path, rng):
    x = (0.4 * np.sin(2 * np.pi * 523 * np.arange(9000) / 16000)
         ).astype(np.float32)
    fp = str(tmp_path / "a.flac")
    wp = str(tmp_path / "a.wav")
    write_flac(fp, x, 16000)
    audio.write_wav(wp, x, 16000)
    ff, rf = audio.read_audio(fp)
    fw, rw = audio.read_audio(wp)
    assert rf == rw == 16000
    # identical 16-bit quantization on both paths
    np.testing.assert_array_equal(np.round(ff * 32768),
                                  np.round(fw * 32768))
    seg, _ = audio.read_audio(fp, 0.1, 0.3)
    np.testing.assert_array_equal(seg, ff[1600:4800])


def test_native_decoder_matches_python_oracle(tmp_path, rng):
    from openeat_tpu.runtime import native_io
    if not native_io.available():
        pytest.skip("native io library not built")
    paths, oracle = [], []
    for i, (nch, ls) in enumerate([(1, False), (2, False), (2, True)]):
        s = rng.integers(-20000, 20000, (4000 + 512 * i, nch))
        data = encode_flac(s, 16000, bps=16, block_size=1024, left_side=ls)
        p = str(tmp_path / f"n{i}.flac")
        with open(p, "wb") as f:
            f.write(data)
        paths.append(p)
        oracle.append(read_flac(p)[0])
    wav, lens, rates = native_io.read_wav_batch(
        paths, [-1.0] * 3, [-1.0] * 3, max_samples=8000, n_threads=2)
    for i in range(3):
        assert rates[i] == 16000
        assert lens[i] == len(oracle[i])
        np.testing.assert_allclose(wav[i, : lens[i]], oracle[i],
                                   atol=1e-6)
    # segment slicing through the native path
    wav2, lens2, _ = native_io.read_wav_batch(
        [paths[0]], [0.05], [0.15], max_samples=8000, n_threads=1)
    np.testing.assert_allclose(wav2[0, : lens2[0]], oracle[0][800:2400],
                               atol=1e-6)


def test_collate_flac_corpus_matches_wav(tmp_path, rng):
    """e2e done-criterion: a FLAC manifest produces the same batches as a
    WAV manifest of the same audio (both native and python IO paths)."""
    from openeat_tpu.dataset.dataset import AudioCollate, AudioDataset
    from openeat_tpu.dataset.text import load_dict
    from tests.make_tiny_data import build as build_tiny
    root = str(tmp_path)
    d = build_tiny(root, n_utts=6)
    # convert the corpus to FLAC and rewrite the manifest
    flac_manifest = os.path.join(root, "format_flac.data")
    with open(d["manifest"]) as f, open(flac_manifest, "w") as out:
        for line in f:
            fields = dict(kv.split(":", 1)
                          for kv in line.rstrip("\n").split("\t"))
            x, rate = audio.read_wav(fields["feat"])
            fp = fields["feat"][:-4] + ".flac"
            write_flac(fp, x, rate)
            fields["feat"] = fp
            out.write("\t".join(f"{k}:{v}" for k, v in fields.items())
                      + "\n")
    cd = load_dict(d["dict"])
    for use_native in (False, True):
        ds_wav = AudioDataset(d["manifest"], cd, batch_type="static",
                              batch_size=6, max_length=100000)
        ds_flac = AudioDataset(flac_manifest, cd, batch_type="static",
                               batch_size=6, max_length=100000)
        c = AudioCollate(use_native_io=use_native)
        if use_native and c.native_io is None:
            continue
        kw, bw = c(ds_wav[0])
        kf, bf = c(ds_flac[0])
        assert kw == kf
        np.testing.assert_array_equal(bw["wav_lens"], bf["wav_lens"])
        # same 16-bit PCM on both paths -> identical x32768 waveforms
        np.testing.assert_allclose(bw["wav"], bf["wav"], atol=2e-3)


def test_librispeech_prepare_and_format(tmp_path, rng):
    """Raw LibriSpeech-layout FLAC corpus -> prepare_data -> format_data:
    durations come from FLAC STREAMINFO (header-only) and the manifest
    feeds the collate unchanged."""
    import subprocess
    import sys
    corpus = tmp_path / "LibriSpeech" / "dev-mini" / "84" / "121123"
    corpus.mkdir(parents=True)
    rate = 16000
    durs = {}
    with open(corpus / "84-121123.trans.txt", "w") as tf:
        for i in range(3):
            utt = f"84-121123-{i:04d}"
            n = rate // 2 + 400 * i
            x = rng.integers(-8000, 8000, n)[:, None]
            with open(corpus / f"{utt}.flac", "wb") as f:
                f.write(encode_flac(x, rate))
            durs[utt] = n / rate
            tf.write(f"{utt} HELLO WORLD NUMBER {i}\n")
    data_dir = tmp_path / "data" / "dev_mini"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable,
         os.path.join(repo, "examples/librispeech/local/prepare_data.py"),
         str(tmp_path / "LibriSpeech" / "dev-mini"), str(data_dir)],
        check=True)
    subprocess.run(
        [sys.executable, os.path.join(repo, "tools/format_data.py"),
         str(data_dir)], check=True)
    manifest = data_dir / "format.data"
    lines = manifest.read_text().strip().split("\n")
    assert len(lines) == 3
    for line in lines:
        fields = dict(kv.split(":", 1) for kv in line.split("\t"))
        assert fields["feat"].endswith(".flac")
        utt = fields["utt"]
        np.testing.assert_allclose(float(fields["feat_shape"]), durs[utt],
                                   atol=2e-3)
